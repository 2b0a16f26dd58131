"""Turnkey real-weights rehearsal, CI-exercised end-to-end.

Real-weights day (reference README.md:68-70,158-159: released 53618.pt /
91453.pt + SMPL pkls + EgoBody) must be a file path, not an integration
project: this test fabricates checkpoints in the EXACT reference torch
layout (interop.torch_export), then drives `tools/real_weights_eval.py`'s
main() with the same flags a user would type — stage-1 .pt -> convert ->
eval -> results.pkl -> stage-2 .pt -> convert -> two-stage eval -> one
combined report (round-4 verdict Next #6)."""
import json
import os
import sys

import numpy as np
import pytest

from .test_egobody_dataset import egobody_root  # noqa: F401 (pytest fixture)

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)


@pytest.fixture(autouse=True)
def _synthetic_smpl(monkeypatch):
    """The image has no SMPL .pkl bodies; swap the CLIs' smpl.create for
    the synthetic 6890-vertex model (same seam as tests/test_two_stage.py)."""
    from egohmr_tpu import smpl as smpl_pkg
    from egohmr_tpu.smpl import make_synthetic_model

    model = make_synthetic_model(num_vertices=6890)
    monkeypatch.setattr(smpl_pkg, "create", lambda *a, **k: model)


def test_real_weights_rehearsal_command(egobody_root, tmp_path):  # noqa: F811
    import jax

    import real_weights_eval as tool
    from egohmr_tpu.data.stats import save_stats
    from egohmr_tpu.interop.torch_export import (
        export_egohmr,
        export_prohmr,
        save_state_dict,
    )
    from egohmr_tpu.models import EgoHMRConfig, init_egohmr
    from egohmr_tpu.models.prohmr import ProHMRConfig, init_prohmr

    # fabricate RELEASE-LAYOUT torch checkpoints (the exact key/shape
    # layout of the published 53618.pt / 91453.pt)
    pt1 = str(tmp_path / "53618.pt")
    save_state_dict(export_prohmr(jax.device_get(
        init_prohmr(jax.random.PRNGKey(0), ProHMRConfig()))), pt1)
    pt2 = str(tmp_path / "91453.pt")
    save_state_dict(export_egohmr(jax.device_get(
        init_egohmr(jax.random.PRNGKey(1), EgoHMRConfig()))), pt2)
    stats_path = str(tmp_path / "preprocess_stats.npz")
    save_stats(stats_path, np.zeros(144, np.float32),
               np.ones(144, np.float32))

    ann = os.path.join(egobody_root, "annotations.npz")
    save_root = str(tmp_path / "report_out")
    report = tool.main([
        "--stage1_checkpoint", pt1,
        "--stage2_checkpoint", pt2,
        "--dataset_root", egobody_root,
        "--dataset_file", ann,
        "--body_rep_stats", stats_path,
        "--save_root", save_root,
        "--batch_size", "3",
        "--num_samples", "1",
        "--timestep_respacing_eval", "ddim5",
        "--with_coap_grad", "false",
        "--data_parallel", "false",
        "--scene_crop_by_stage1_transl", "false",  # fixture ships gt cubes
    ])

    # stage-1 metrics present and finite (mm scale)
    for k in ("g_mpjpe", "mpjpe", "pa_mpjpe", "v2v"):
        assert np.isfinite(report["stage1_metrics_mm"][k]), (k, report)
    # stage-2 metrics present and finite
    for k in ("g_mpjpe", "mpjpe_all", "pa_mpjpe_all", "v2v_all"):
        assert np.isfinite(report["stage2_metrics"][k]), (k, report)

    # the handoff actually happened: stage-1 wrote the pkl stage 2 consumed
    assert os.path.exists(os.path.join(save_root, "stage1", "results.pkl"))
    # and the report is on disk as documented
    with open(os.path.join(save_root, "report.json")) as f:
        on_disk = json.load(f)
    assert on_disk["stage2_metrics"]["g_mpjpe"] == pytest.approx(
        report["stage2_metrics"]["g_mpjpe"])
