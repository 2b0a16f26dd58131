"""End-to-end smokes for the two training CLIs (reference train_egohmr.py /
train_prohmr_scene.py): arg wiring, synthetic data path, JSONL metrics,
checkpoint save, and RESUME (start_step restored, no step re-run). The
functional train steps themselves are covered in test_train_infra.py /
test_prohmr_model.py — this guards the user-facing entry points."""
import json
import os

import numpy as np


def _read_steps(save_dir):
    steps = []
    with open(os.path.join(save_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            steps.append(int(rec.get("step", -1)))
    return steps


def test_train_egohmr_cli_smoke_and_resume(tmp_path):
    from egohmr_tpu.train import train_egohmr as cli

    save_dir = str(tmp_path / "run")
    common = ["--synthetic", "--batch_size", "2", "--log_step", "1",
              "--val_step", "1000", "--save_step", "1000",
              "--data_parallel", "false", "--save_dir", save_dir]
    cli.main(common + ["--num_steps", "2"])

    assert os.path.exists(os.path.join(save_dir, "params.json"))
    ckpt = os.path.join(save_dir, "checkpoints", "step_1")
    assert os.path.exists(ckpt)
    steps = _read_steps(save_dir)
    assert steps == [0, 1]

    # resume: same save_dir, larger budget -> continues at step 2, does NOT
    # replay 0/1 (reference has no resume at all; utils/checkpoint.py adds it)
    cli.main(common + ["--num_steps", "4"])
    assert os.path.exists(os.path.join(save_dir, "checkpoints", "step_3"))
    assert _read_steps(save_dir) == [0, 1, 2, 3]

    # restored checkpoint round-trips with finite params
    from egohmr_tpu.utils.checkpoint import restore_checkpoint

    state = restore_checkpoint(os.path.join(save_dir, "checkpoints", "step_3"))
    assert int(state["step"]) == 3
    import jax

    leaves = jax.tree_util.tree_leaves(state["params"])
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_train_prohmr_cli_smoke(tmp_path):
    from egohmr_tpu.train import train_prohmr as cli

    save_dir = str(tmp_path / "run")
    cli.main(["--synthetic", "--batch_size", "2", "--num_steps", "2",
              "--log_step", "1", "--save_step", "1000",
              "--data_parallel", "false", "--save_dir", save_dir])
    steps = _read_steps(save_dir)
    assert steps and steps[-1] == 1
    # generator + discriminator losses logged and finite
    with open(os.path.join(save_dir, "metrics.jsonl")) as f:
        rec = json.loads(f.readlines()[-1])
    finite_keys = [k for k, v in rec.items()
                   if isinstance(v, float) and np.isfinite(v)]
    assert len(finite_keys) >= 2, rec
