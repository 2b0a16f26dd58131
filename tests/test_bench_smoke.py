"""Smoke coverage for bench.py — the driver's benchmark surface.

The driver runs `python bench.py` at the end of every round and records its
single JSON line; a broken bench silently costs the round its recorded
number. These tests run the quick (stub-model) variants in-process on the
CPU platform the suite already forces, and check the output contract:
one parseable JSON line with metric/value/unit/vs_baseline.

Quick mode never writes BENCH_extra.json (sidecar writes are gated on full
size), so these tests do not touch recorded artifacts.
"""
import json
import sys

import bench


def _run(argv, capsys):
    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        bench.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    json_lines = [l for l in out.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, f"expected exactly one JSON line, got: {out!r}"
    d = json.loads(json_lines[0])
    for k in ("metric", "value", "unit", "vs_baseline", "extra"):
        assert k in d, f"missing key {k} in {d}"
    assert d["value"] > 0
    return d


def test_quick_headline_contract(capsys):
    d = _run(["--quick", "--skip-baseline"], capsys)
    assert d["metric"] == "ddim5_samples_per_sec_per_chip"
    assert d["unit"] == "samples/s"
    assert d["vs_baseline"] is None  # --skip-baseline
    assert d["extra"]["conditioning_dtype"] == "bfloat16"  # the default


def test_quick_train_contract(capsys):
    d = _run(["--train", "--quick"], capsys)
    assert d["metric"] == "train_step_imgs_per_sec_per_chip"
    assert d["unit"] == "imgs/s"
    assert d["extra"]["precision"] == "bf16_mixed"  # bench default
    assert d["extra"]["collision_loss"] is True
