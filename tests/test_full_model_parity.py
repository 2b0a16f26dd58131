"""Full stage-2 forward parity: reference semantics in torch vs converted JAX.

Builds every submodule in torch (the reference's own importable modules plus
inline replicas of the egohmr.py-local heads, which cannot be imported since
models/egohmr/egohmr.py pulls in coap/smplx at module scope), assembles a
state_dict with the reference checkpoint key layout, converts it with
interop.convert_egohmr, and compares one full denoise forward — conditioning
assembly, per-joint visibility masking, CFG 'diffuse_fuse' splice and the
beta head — against a literal torch transcription of
reference models/egohmr/egohmr.py:173-265.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from .conftest import requires_reference

pytestmark = requires_reference

FX_NORM = 1500.0


@pytest.fixture(scope="module")
def torch_modules():
    import torch
    import torch.nn as nn
    from models.resnet import resnet50
    from models.respointnet import ResnetPointnet
    from models.egohmr.modulated_gcn.modulated_gcn import ModulatedGCN

    from egohmr_tpu.nn.embedders import sinusoidal_table
    from egohmr_tpu.smpl.constants import joint_adjacency

    torch.manual_seed(0)
    mods = {}
    mods["backbone"] = resnet50(pretrained=False).eval()
    with torch.no_grad():
        for m in mods["backbone"].modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    mods["scene_enc"] = ResnetPointnet(out_dim=512, hidden_dim=256).eval()
    mods["transl_enc"] = nn.Sequential(
        nn.Linear(3, 64), nn.ReLU(), nn.Linear(64, 128)).eval()
    mods["time_embed"] = nn.Sequential(
        nn.Linear(512, 512), nn.SiLU(), nn.Linear(512, 512)).eval()
    mods["input_process"] = nn.Linear(6, 512).eval()
    adj = torch.from_numpy(joint_adjacency())
    mods["gcn"] = ModulatedGCN(adj=adj, in_dim=2694 + 512 + 512, hid_dim=64,
                               out_dim=6, num_layers=2, p_dropout=0.0).eval()
    with torch.no_grad():
        for m in mods["gcn"].modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    mods["beta_layer"] = nn.Sequential(
        nn.Linear(2694, 1024), nn.ReLU(), nn.Linear(1024, 10)).eval()
    mods["init_betas"] = torch.randn(1, 10) * 0.3
    mods["pe"] = torch.from_numpy(sinusoidal_table(512))
    return mods


def _state_dict(mods):
    sd = {}

    def add(prefix, module):
        for k, v in module.state_dict().items():
            sd[prefix + k] = v.detach().numpy().copy()

    add("backbone.", mods["backbone"])
    add("scene_enc.", mods["scene_enc"])
    add("transl_enc.layers.", mods["transl_enc"])
    add("embed_timestep.time_embed.", mods["time_embed"])
    add("input_process.poseEmbedding.", mods["input_process"])
    add("diffusion_model.", mods["gcn"])
    add("beta_layer.layers.", mods["beta_layer"])
    sd["beta_layer.init_betas"] = mods["init_betas"].numpy().copy()
    return sd


def _torch_reference_forward(mods, batch, x_t, timesteps, eval_with_uncond):
    """Literal transcription of reference egohmr.py:173-265 (through
    pred_betas; SMPL fwd / projection are covered by other tests)."""
    import torch

    from egohmr_tpu.smpl.constants import OPENPOSE_TO_SMPL

    B = batch["img"].shape[0]
    with torch.no_grad():
        t_emb = mods["time_embed"](mods["pe"][timesteps])  # [B, 512]
        t_emb = t_emb[:, None, :].repeat(1, 24, 1)

        img_feats = mods["backbone"](batch["img"])  # [B, 2048]
        vis_op = batch["orig_keypoints_2d"][:, :, -1] > 0
        vis_op[:, 8] = True
        vis_smpl = vis_op[:, torch.from_numpy(OPENPOSE_TO_SMPL).long()]
        img24 = img_feats[:, None, :].repeat(1, 24, 1)
        img24 = img24 * vis_smpl[..., None].float()

        orig_fx = batch["fx"] * FX_NORM
        cam_feats = [
            torch.stack([batch["cam_cx"] / orig_fx,
                         batch["cam_cy"] / orig_fx], dim=-1),
            torch.stack([batch["box_center"][:, 0] / orig_fx,
                         batch["box_center"][:, 1] / orig_fx,
                         batch["box_size"] / orig_fx], dim=-1),
            batch["fx"][:, None],
        ]
        transl = batch["transl"]
        scene = batch["scene"] - transl[:, None, :]  # scene_cano
        scene_feats = mods["scene_enc"](scene)
        transl_feat = mods["transl_enc"](transl)

        shared = torch.cat([scene_feats, transl_feat] + cam_feats, dim=1)
        shared24 = shared[:, None, :].repeat(1, 24, 1)
        cond = torch.cat([img24, shared24], dim=-1)

        x_feat = mods["input_process"](x_t.reshape(B, 24, 6))
        feat = torch.cat([cond, x_feat, t_emb], dim=-1)
        out = mods["gcn"](feat)

        if eval_with_uncond:
            cond_unc = torch.cat([torch.zeros_like(img24), shared24], dim=-1)
            feat_unc = torch.cat([cond_unc, x_feat, t_emb], dim=-1)
            out_unc = mods["gcn"](feat_unc)
            out_cond = out.clone()
            out = out_unc + 0.0 * (out - out_unc)
            vis6 = vis_smpl[..., None].repeat(1, 1, 6).reshape(B, -1)
            out = out.reshape(B, -1)
            out_cond = out_cond.reshape(B, -1)
            out[vis6] = out_cond[vis6]

        beta_in = torch.cat([img_feats, scene_feats, transl_feat] + cam_feats,
                            dim=1)
        pred_betas = mods["beta_layer"](beta_in) + mods["init_betas"]
        return out.reshape(B, 144), pred_betas


def test_full_forward_parity(torch_modules, rng):
    import torch

    from egohmr_tpu.interop.torch_convert import convert_egohmr
    from egohmr_tpu.models import EgoHMRConfig, compute_condition
    from egohmr_tpu.models.egohmr import denoise_x0

    mods = torch_modules
    cfg = EgoHMRConfig(gcn_hid_dim=64, gcn_layers=2)
    params = convert_egohmr(_state_dict(mods), num_layers=2)

    B = 2
    img = rng.randn(B, 3, 224, 224).astype(np.float32) * 0.5
    kp2d = np.concatenate(
        [rng.rand(B, 25, 2).astype(np.float32),
         (rng.rand(B, 25, 1) > 0.4).astype(np.float32)], axis=-1)
    transl = np.array([[0.1, 0.0, 2.4], [-0.2, 0.1, 3.0]], np.float32)
    scene = (rng.randn(B, 600, 3).astype(np.float32) + transl[:, None])
    fx = np.full(B, 1.0, np.float32)
    cam_cx = np.full(B, 960.0, np.float32)
    cam_cy = np.full(B, 540.0, np.float32)
    box_center = rng.rand(B, 2).astype(np.float32) * 800 + 300
    box_size = rng.rand(B).astype(np.float32) * 100 + 180
    x_t = rng.randn(B, 144).astype(np.float32)
    ts = np.array([7, 31])

    tb = {
        "img": torch.from_numpy(img),
        "orig_keypoints_2d": torch.from_numpy(kp2d),
        "transl": torch.from_numpy(transl),
        "scene": torch.from_numpy(scene),
        "fx": torch.from_numpy(fx),
        "cam_cx": torch.from_numpy(cam_cx),
        "cam_cy": torch.from_numpy(cam_cy),
        "box_center": torch.from_numpy(box_center),
        "box_size": torch.from_numpy(box_size),
    }

    jb = {
        "img": jnp.asarray(img.transpose(0, 2, 3, 1)),
        "orig_keypoints_2d": jnp.asarray(kp2d),
        "smpl_params": {"transl": jnp.asarray(transl)},
        "scene_pcd_verts_full": jnp.asarray(scene),
        "fx": jnp.asarray(fx),
        "cam_cx": jnp.asarray(cam_cx),
        "cam_cy": jnp.asarray(cam_cy),
        "box_center": jnp.asarray(box_center),
        "box_size": jnp.asarray(box_size),
    }

    for fuse in (False, True):
        want_x0, want_betas = _torch_reference_forward(
            mods, tb, torch.from_numpy(x_t.copy()),
            torch.from_numpy(ts), eval_with_uncond=fuse)
        cond, _ = compute_condition(params, cfg, jb, scene_cano=True)
        got_x0, _ = denoise_x0(params, cfg, cond, jnp.asarray(x_t),
                               jnp.asarray(ts), fuse=fuse)
        np.testing.assert_allclose(
            np.asarray(got_x0), want_x0.numpy(), rtol=5e-3, atol=5e-4,
            err_msg=f"fuse={fuse}")
        np.testing.assert_allclose(
            np.asarray(cond.pred_betas), want_betas.numpy(),
            rtol=2e-3, atol=2e-4)
