"""End-to-end two-stage pipeline test on the on-disk EgoBody fixture:
stage-1 CLI -> results.pkl -> stage-2 CLI (--two_stage), covering the pkl
handoff seam (reference test_prohmr_scene.py:417-427 ->
test_egohmr.py:94-98,243-245)."""
import os
import pickle

import numpy as np
import pytest

from .test_egobody_dataset import egobody_root  # noqa: F401 (pytest fixture)


@pytest.fixture(autouse=True)
def _synthetic_smpl(monkeypatch):
    """The image has no SMPL .pkl bodies; the CLIs' non-synthetic path loads
    them via smpl.create — swap in the synthetic 6890-vertex model."""
    from egohmr_tpu import smpl as smpl_pkg
    from egohmr_tpu.smpl import make_synthetic_model

    model = make_synthetic_model(num_vertices=6890)
    monkeypatch.setattr(smpl_pkg, "create", lambda *a, **k: model)


def test_two_stage_handoff(egobody_root, tmp_path):  # noqa: F811
    import jax

    from egohmr_tpu.eval import test_egohmr, test_prohmr
    from egohmr_tpu.models import EgoHMRConfig, init_egohmr
    from egohmr_tpu.models.prohmr import ProHMRConfig, init_prohmr
    from egohmr_tpu.utils.checkpoint import save_checkpoint

    ann = os.path.join(egobody_root, "annotations.npz")

    # ---- stage 1: eval CLI on the fixture, dumping pred_cam_full_list
    p1 = init_prohmr(jax.random.PRNGKey(0), ProHMRConfig())
    save_checkpoint(str(tmp_path / "ckpt1"), {"params": jax.device_get(p1)})
    s1_root = str(tmp_path / "s1_out")
    s1 = test_prohmr.main([
        "--dataset_file", ann, "--dataset_root", egobody_root,
        "--checkpoint", str(tmp_path / "ckpt1"),
        "--scene_type", "whole_scene", "--batch_size", "3",
        "--num_samples", "2", "--save_root", s1_root,
    ])
    assert all(np.isfinite(v) for v in s1.values()), s1
    pkl_path = os.path.join(s1_root, "results.pkl")
    with open(pkl_path, "rb") as f:
        handoff = pickle.load(f)
    assert handoff["pred_cam_full_list"].shape == (6, 3)

    # ---- the seam: the dataset must surface exactly those translations
    from egohmr_tpu.data.egobody import EgoBodyDataset

    ds = EgoBodyDataset(
        dataset_file=ann, data_root=egobody_root, split="test", train=False,
        scene_type="cube", load_stage1_transl=True,
        stage1_result_path=pkl_path,
    )
    for i in (0, 3, 5):
        np.testing.assert_allclose(
            ds[i]["stage1_transl_full"], handoff["pred_cam_full_list"][i],
            atol=1e-6)

    # ---- stage 2: eval CLI consuming the stage-1 pkl
    p2 = init_egohmr(jax.random.PRNGKey(1), EgoHMRConfig())
    save_checkpoint(str(tmp_path / "ckpt2"), {"params": jax.device_get(p2)})
    from egohmr_tpu.data.stats import save_stats

    stats_path = str(tmp_path / "preprocess_stats.npz")
    save_stats(stats_path, np.zeros(144, np.float32), np.ones(144, np.float32))
    s2 = test_egohmr.main([
        "--dataset_file", ann, "--dataset_root", egobody_root,
        "--checkpoint", str(tmp_path / "ckpt2"),
        "--body_rep_stats", stats_path,
        "--two_stage", "true", "--stage1_result_path", pkl_path,
        "--scene_crop_by_stage1_transl", "false",  # fixture ships gt cubes
        "--batch_size", "3", "--num_samples", "1",
        "--timestep_respacing_eval", "ddim5", "--with_coap_grad", "false",
        "--save_results", "true", "--save_root", str(tmp_path / "s2_out"),
    ])
    for k in ("g_mpjpe", "mpjpe_all", "pa_mpjpe_all", "v2v_all"):
        assert np.isfinite(s2[k]), (k, s2)

    # results.pkl carries the stage-1 cams through (reference schema;
    # model_id = checkpoint's parent dir name, like the reference :684)
    model_id = os.path.basename(os.path.dirname(str(tmp_path / "ckpt2")))
    out_pkl = os.path.join(str(tmp_path / "s2_out"),
                           f"output_egohmr_{model_id}", "results_seed_0.pkl")
    with open(out_pkl, "rb") as f:
        res = pickle.load(f)
    assert res["pred_cam_full_list"].shape == (6, 3)
    np.testing.assert_allclose(res["pred_cam_full_list"],
                               handoff["pred_cam_full_list"], atol=1e-6)
    assert res["pred_body_pose_list"].shape == (6, 1, 23, 3, 3)
