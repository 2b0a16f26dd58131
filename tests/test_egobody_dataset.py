"""End-to-end EgoBodyDataset test against a synthetic on-disk fixture that
mirrors the real EgoBody release layout (egobody_dataset.py's expectations)."""
import json
import os
import pickle

import numpy as np
import pytest


N_ITEMS = 6
RECORDING = "recording_20210907_S02_S01_01"
HOLO_TIME = "2021-09-07-155421"
SCENE = "seminar_d78"


@pytest.fixture(scope="module")
def egobody_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("egobody")
    rng = np.random.RandomState(0)

    # images + imgname paths (5-component relative path expected by
    # parse_img_full_path: session/seq/recording/PV/file)
    imgnames = []
    rel_dir = f"egocentric_color/{RECORDING}/{HOLO_TIME}/PV"
    os.makedirs(root / rel_dir, exist_ok=True)
    timestamps = []
    for i in range(N_ITEMS):
        ts = 132754997786014666 + i
        timestamps.append(str(ts))
        name = f"{ts}_frame_{i:05d}.jpg"
        img = (rng.rand(270, 480, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / rel_dir / name)
        imgnames.append(f"{rel_dir}/{name}")

    # annotation npz
    np.savez(
        root / "annotations.npz",
        imgname=np.array(imgnames),
        center=rng.rand(N_ITEMS, 2).astype(np.float32) * 200 + 140,
        scale=np.full(N_ITEMS, 1.0, np.float32),
        pose=rng.randn(N_ITEMS, 69).astype(np.float32) * 0.2,
        shape=rng.randn(N_ITEMS, 10).astype(np.float32) * 0.5,
        global_orient_pv=rng.randn(N_ITEMS, 3).astype(np.float32) * 0.3,
        transl_pv=np.array([[0.1, 0.2, 2.5]] * N_ITEMS, np.float32),
        cx=np.full(N_ITEMS, 240.0), cy=np.full(N_ITEMS, 135.0),
        fx=np.full(N_ITEMS, 750.0), fy=np.full(N_ITEMS, 750.0),
        valid_keypoints=np.concatenate(
            [rng.rand(N_ITEMS, 25, 2) * 400, np.ones((N_ITEMS, 25, 1))],
            axis=-1).astype(np.float32),
        **{"3d_joints_pv": rng.randn(N_ITEMS, 25, 3).astype(np.float32) * 0.3
           + [0.1, 0.2, 2.5]},
        gender=np.array(["m", "f"] * (N_ITEMS // 2)),
    )

    # transformation matrices pkl
    h2p = {ts: np.eye(4, dtype=np.float32) for ts in timestamps}
    transf = {RECORDING: {
        "trans_kinect2holo": np.eye(4, dtype=np.float32),
        "trans_world2pv": h2p,
    }}
    with open(root / "transf_matrices_all_seqs.pkl", "wb") as f:
        pickle.dump(transf, f)

    # scene-name csv + calibration json
    with open(root / "data_info_release.csv", "w") as f:
        f.write("recording_name,scene_name\n")
        f.write(f"{RECORDING},{SCENE}\n")
    calib_dir = root / "calibrations" / RECORDING / "cal_trans" / "kinect12_to_world"
    os.makedirs(calib_dir, exist_ok=True)
    with open(calib_dir / f"{SCENE}.json", "w") as f:
        json.dump({"trans": np.eye(4).tolist()}, f)

    # cube pcds (from-gt variant)
    cube_root = root / "Egohmr_scene_preprocess_cube_s2_from_gt_release" / "test"
    pcd_dir = cube_root / RECORDING / HOLO_TIME
    os.makedirs(pcd_dir, exist_ok=True)
    for i, ts in enumerate(timestamps):
        pts = rng.randn(500, 3).astype(np.float32) + [0, 0, 2.5]
        np.save(pcd_dir / f"{ts}_frame_{i:05d}.npy", pts)

    # whole-scene variant
    s1 = root / "Egohmr_scene_preprocess_s1_release"
    os.makedirs(s1, exist_ok=True)
    key = imgnames[0]
    with open(s1 / "pcd_verts_dict_test.pkl", "wb") as f:
        pickle.dump({key: rng.randn(800, 3) + [0, 0, 2.5]}, f)
    with open(s1 / "map_dict_test.pkl", "wb") as f:
        pickle.dump({name: key for name in imgnames}, f)

    # stage-1 results pkl
    with open(root / "stage1.pkl", "wb") as f:
        pickle.dump({"pred_cam_full_list":
                     rng.randn(N_ITEMS, 3).astype(np.float32) * 0.1
                     + [0, 0, 2.4]}, f)
    return str(root)


def test_cube_dataset_loads(egobody_root):
    from egohmr_tpu.data.egobody import EgoBodyDataset

    ds = EgoBodyDataset(
        dataset_file=os.path.join(egobody_root, "annotations.npz"),
        data_root=egobody_root, split="test", train=False,
        scene_type="cube", load_stage1_transl=True,
        stage1_result_path=os.path.join(egobody_root, "stage1.pkl"),
    )
    assert len(ds) == N_ITEMS
    item = ds[0]
    assert item["img"].shape == (224, 224, 3)
    assert item["keypoints_2d"].shape == (25, 3)
    assert item["keypoints_3d"].shape == (24, 3)
    assert item["scene_pcd_verts_full"].shape == (500, 3)
    assert item["stage1_transl_full"].shape == (3,)
    assert np.isfinite(item["img"]).all()
    # deterministic path: full 3d joints equal the raw annotation
    with np.load(os.path.join(egobody_root, "annotations.npz")) as z:
        np.testing.assert_allclose(
            item["keypoints_3d_full"], z["3d_joints_pv"][0][:24], atol=1e-4)
    assert item["gender"] == 0


def test_whole_scene_dataset_loads(egobody_root):
    from egohmr_tpu.data.egobody import EgoBodyDataset

    ds = EgoBodyDataset(
        dataset_file=os.path.join(egobody_root, "annotations.npz"),
        data_root=egobody_root, split="test", train=False,
        scene_type="whole_scene",
    )
    item = ds[1]
    assert item["scene_pcd_verts_full"].shape == (800, 3)


def test_batching_and_spacing(egobody_root):
    from egohmr_tpu.data.egobody import EgoBodyDataset

    ds = EgoBodyDataset(
        dataset_file=os.path.join(egobody_root, "annotations.npz"),
        data_root=egobody_root, split="test", train=False,
        scene_type="cube", spacing=2,
    )
    assert len(ds) == N_ITEMS // 2
    batches = list(ds.iter_batches(2, shuffle=False))
    assert len(batches) == (N_ITEMS // 2) // 2
    b = batches[0]
    assert b["img"].shape == (2, 224, 224, 3)
    assert b["smpl_params"]["betas"].shape == (2, 10)
    assert b["box_center"].shape == (2, 2)


def test_augmented_items_flagged(egobody_root):
    from egohmr_tpu.data.egobody import EgoBodyDataset

    ds = EgoBodyDataset(
        dataset_file=os.path.join(egobody_root, "annotations.npz"),
        data_root=egobody_root, split="test", train=True, do_augment=True,
        scene_type="cube", seed=3,
    )
    flags = [ds[i]["transl_needs_recompute"] for i in range(len(ds))]
    assert any(flags)


def test_finalize_batch_recomputes_transl(egobody_root):
    import jax.numpy as jnp

    from egohmr_tpu.data.egobody import EgoBodyDataset, collate, finalize_batch
    from egohmr_tpu.smpl import lbs, make_synthetic_model

    ds = EgoBodyDataset(
        dataset_file=os.path.join(egobody_root, "annotations.npz"),
        data_root=egobody_root, split="test", train=True, do_augment=True,
        scene_type="cube", seed=7,
    )
    items = [ds[i] for i in range(4)]
    batch = collate(items)
    assert batch["transl_needs_recompute"].any()
    smpl = make_synthetic_model(num_vertices=256)
    out = finalize_batch(batch, smpl, smpl)

    # invariant the reference establishes (augmentation.py:446-460):
    # posed pelvis + transl == augmented full-frame pelvis keypoint
    sp = out["smpl_params"]
    posed = lbs(smpl, jnp.asarray(sp["betas"]),
                jnp.asarray(sp["global_orient"]),
                jnp.asarray(sp["body_pose"]), pose2rot=True)
    pelvis = np.asarray(posed.joints_smpl[:, 0]) + sp["transl"]
    flagged = np.asarray(batch["transl_needs_recompute"])
    np.testing.assert_allclose(
        pelvis[flagged], out["keypoints_3d_full"][flagged][:, 0], atol=1e-4)
    # un-augmented items keep their original transl
    if (~flagged).any():
        np.testing.assert_allclose(sp["transl"][~flagged],
                                   batch["smpl_params"]["transl"][~flagged])


def test_to_device_batch_drops_host_keys(egobody_root):
    from egohmr_tpu.data.egobody import EgoBodyDataset, collate, to_device_batch

    ds = EgoBodyDataset(
        dataset_file=os.path.join(egobody_root, "annotations.npz"),
        data_root=egobody_root, split="test", train=False, scene_type="cube",
    )
    batch = to_device_batch(collate([ds[0], ds[1]]))
    for k in ("imgname", "transl_needs_recompute", "transf_kinect2holo",
              "transf_holo2pv", "keypoints_2d_vis_mask"):
        assert k not in batch
    assert batch["img"].shape == (2, 224, 224, 3)


def test_native_batch_loader_matches_python_path(egobody_root):
    """iter_batches' threaded C++ decode+warp path must produce the same
    batches as the per-item Python path (PIL decode + same warp kernel) —
    including under augmentation (flip/rot/scale/jitter). Only the JPEG
    decoder differs (system libjpeg vs PIL's), so images get a 2-pixel-level
    tolerance; every other key must match exactly."""
    from egohmr_tpu import native
    from egohmr_tpu.data.egobody import EgoBodyDataset

    if not native.available():
        import pytest

        pytest.skip("native lib not built")

    def make(use_native):
        return EgoBodyDataset(
            dataset_file=os.path.join(egobody_root, "annotations.npz"),
            data_root=egobody_root, split="test", train=True,
            do_augment=True, scene_type="cube", seed=11,
            use_native_loader=use_native,
        )

    b_nat = next(make(True).iter_batches(4, shuffle=False))
    b_py = next(make(False).iter_batches(4, shuffle=False))
    assert b_nat["img"].shape == b_py["img"].shape == (4, 224, 224, 3)
    # std is ~57/255-scaled, so 2 decoder-rounding pixel levels ~= 0.035
    np.testing.assert_allclose(b_nat["img"], b_py["img"], atol=0.04)
    for k in b_py:
        if k in ("img", "imgname"):
            continue
        if isinstance(b_py[k], dict):
            for kk in b_py[k]:
                np.testing.assert_array_equal(
                    b_nat[k][kk], b_py[k][kk], err_msg=f"{k}.{kk}")
        else:
            np.testing.assert_array_equal(b_nat[k], b_py[k], err_msg=k)
