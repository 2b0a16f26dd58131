"""Reverse interop (JAX -> torch state_dict layout): exact round trips."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from egohmr_tpu.interop.torch_convert import (
    convert_discriminator, convert_egohmr, convert_prohmr,
)
from egohmr_tpu.interop.torch_export import (
    export_discriminator, export_egohmr, export_prohmr, save_state_dict,
)
from egohmr_tpu.models import EgoHMRConfig, init_egohmr
from egohmr_tpu.models.discriminator import init_discriminator
from egohmr_tpu.models.prohmr import ProHMRConfig, init_prohmr


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a) ^ set(b)}"
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=path)


def test_egohmr_roundtrip():
    cfg = EgoHMRConfig(
        resnet_layers=18, img_feat_dim=512, scene_feat_dim=64,
        pointnet_hidden_dim=32, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=64, gcn_layers=2,
        gcn_nonlocal_layer=True,  # cover the non-local export too
    )
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    sd = export_egohmr(params)
    back = convert_egohmr(sd, num_layers=cfg.gcn_layers,
                       resnet_layers=18)
    _assert_tree_equal(params, back)


def test_prohmr_roundtrip():
    cfg = ProHMRConfig(
        resnet_layers=18, img_feat_dim=512, scene_feat_dim=64,
        pointnet_hidden_dim=32, flow_hidden=64, flow_layers=2, flow_depth=2,
        fc_head_hidden=64,
    )
    params = init_prohmr(jax.random.PRNGKey(1), cfg)
    sd = export_prohmr(params)
    back = convert_prohmr(sd, num_layers=cfg.flow_layers,
                          num_blocks_per_layer=cfg.flow_depth,
                          resnet_layers=18)
    _assert_tree_equal(params, back)


def test_discriminator_roundtrip():
    params = init_discriminator(jax.random.PRNGKey(2))
    sd = export_discriminator(params)
    back = convert_discriminator(sd)
    _assert_tree_equal(params, back)


def test_save_pt_loads_back(tmp_path):
    """A saved .pt round-trips through the normal checkpoint loader (the
    path the reference eval scripts and our CLIs use)."""
    from egohmr_tpu.interop.torch_convert import load_torch_checkpoint

    cfg = EgoHMRConfig(
        resnet_layers=18, img_feat_dim=512, scene_feat_dim=64,
        pointnet_hidden_dim=32, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=64, gcn_layers=2,
    )
    params = init_egohmr(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "export.pt")
    save_state_dict(export_egohmr(params), path, extra={"total_steps": 7})
    sd = load_torch_checkpoint(path)
    back = convert_egohmr(sd, num_layers=cfg.gcn_layers,
                       resnet_layers=18)
    _assert_tree_equal(params, back)


def test_save_npz_keeps_extra_metadata(tmp_path):
    """The npz fallback must persist the `extra` dict (round-2 advisor
    finding: it was silently dropped, so the same call wrote different
    checkpoint contents depending on environment)."""
    import json

    import numpy as np

    from egohmr_tpu.interop.torch_convert import load_torch_checkpoint

    cfg = EgoHMRConfig(
        resnet_layers=18, img_feat_dim=512, scene_feat_dim=64,
        pointnet_hidden_dim=32, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=64, gcn_layers=2,
    )
    params = init_egohmr(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "export.npz")
    written = save_state_dict(export_egohmr(params), path,
                              extra={"total_steps": 7, "note": "x"})
    with np.load(written) as z:
        assert json.loads(str(z["__extra_json__"])) == {
            "total_steps": 7, "note": "x"}
    # the reserved key must NOT leak into the state dict the converter sees
    sd = load_torch_checkpoint(written)
    assert "__extra_json__" not in sd
    back = convert_egohmr(sd, num_layers=cfg.gcn_layers, resnet_layers=18)
    _assert_tree_equal(params, back)
