"""tools/visualize_results.py: the headless analogue of the reference's
open3d in-scene viewers (test_egohmr.py:322-371) — results.pkl in, composed
body+scene+frame renders out."""
import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import visualize_results as vr  # noqa: E402


def _fabricate_results(path, n=2, s=2):
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (n, s, 1, 3, 3))
    res = {
        "pred_betas_list": np.zeros((n, s, 10), np.float32),
        "pred_global_orient_list": np.ascontiguousarray(eye),
        "pred_body_pose_list": np.ascontiguousarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (n, s, 23, 3, 3))),
        "gt_cam_full_list": np.tile(np.array([[0.0, 0.0, 2.5]], np.float32),
                                    (n, 1)),
        "pred_cam_full_list": np.tile(np.array([[0.1, 0.0, 2.5]], np.float32),
                                      (n, 1)),
    }
    with open(path, "wb") as f:
        pickle.dump(res, f, protocol=2)
    return res


def test_visualize_results_end_to_end(tmp_path):
    pkl = str(tmp_path / "results_seed_0.pkl")
    _fabricate_results(pkl)
    rng = np.random.RandomState(0)
    scene = rng.randn(500, 3).astype(np.float32) * 0.5 + [0, 0.8, 2.5]
    scene_path = str(tmp_path / "scene.npy")
    np.save(scene_path, scene)

    out_dir = str(tmp_path / "vis")
    written = vr.main([
        "--results", pkl, "--scene", scene_path, "--synthetic_smpl",
        "--indices", "0", "1", "--img_size", "320", "180",
        "--focal", "200", "--out_dir", out_dir])
    # 2 indices x 3 default views
    assert len(written) == 6 and all(os.path.exists(p) for p in written)
    for p in written:
        img = np.asarray(Image.open(p))
        assert img.shape == (180, 320, 3)
        covered = (np.abs(img.astype(int) - 24).max(-1) > 8).mean()
        assert covered > 0.01, (p, covered)  # something actually rendered
    # body color (cyan-ish, g ~= b >> r) present in the camera view
    cam = np.asarray(Image.open(written[0])).astype(int)
    cyan = (cam[..., 1] - cam[..., 0] > 80) & (cam[..., 2] - cam[..., 0] > 80)
    assert cyan.mean() > 0.005


def test_visualizer_consumes_eval_cli_results_pkl(tmp_path):
    """Contract chain: the pkl the eval CLI writes (--save_results,
    reference schema test_egohmr.py:674-693) is directly consumable by the
    viewer tool — schema drift on either side breaks this test."""
    from egohmr_tpu.eval import test_egohmr as cli

    save_root = str(tmp_path / "results")
    cli.main(["--synthetic", "--batch_size", "2", "--num_batches", "1",
              "--num_samples", "1", "--timestep_respacing_eval", "ddim5",
              "--with_coap_grad", "false", "--eval_coll_loss", "false",
              "--eval_contact_score", "false", "--data_parallel", "false",
              "--save_results", "true", "--save_root", save_root])
    pkl = os.path.join(save_root, "output_egohmr_synthetic",
                       "results_seed_0.pkl")
    assert os.path.exists(pkl)
    written = vr.main(["--results", pkl, "--synthetic_smpl",
                       "--indices", "0", "--views", "camera", "orbit45",
                       "--img_size", "320", "180",
                       "--out_dir", str(tmp_path / "vis")])
    assert len(written) == 2 and all(os.path.exists(p) for p in written)


def test_visualize_results_index_bounds(tmp_path):
    pkl = str(tmp_path / "r.pkl")
    _fabricate_results(pkl, n=1)
    with pytest.raises(AssertionError):
        vr.main(["--results", pkl, "--synthetic_smpl", "--indices", "3",
                 "--out_dir", str(tmp_path / "v")])
