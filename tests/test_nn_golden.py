"""Golden tests: reference torch modules with random weights -> converted to
JAX via interop.torch_convert -> outputs must match.

This validates both the architectures and the checkpoint converter — the same
path the released 91453/53618 checkpoints will take.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from .conftest import requires_reference

pytestmark = requires_reference


def _sd(module):
    # .copy() matters: torch .numpy() shares memory with the live module, and
    # jnp.asarray on CPU is zero-copy — a later torch forward would mutate the
    # converted params through the alias (BN running stats do exactly that).
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}


class TestResNet:
    @pytest.fixture(scope="class")
    def torch_resnet(self):
        import torch
        from models.resnet import resnet50

        torch.manual_seed(0)
        m = resnet50(pretrained=False)
        # randomize BN running stats so eval-mode comparison is meaningful
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.8, 1.2)
        m.eval()
        return m

    def test_eval_forward_matches(self, torch_resnet, rng):
        import torch

        from egohmr_tpu.interop.torch_convert import convert_resnet
        from egohmr_tpu.nn import resnet_forward

        x = rng.randn(2, 3, 224, 224).astype(np.float32) * 0.5
        with torch.no_grad():
            want = torch_resnet(torch.from_numpy(x)).numpy()

        params = convert_resnet(_sd(torch_resnet), prefix="")
        got, _ = resnet_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)

    def test_imagenet_zoo_layout_warm_start_matches(self, rng, tmp_path):
        """ImageNet warm start (VERDICT r1 #4): a torchvision model-zoo-layout
        state_dict (incl. fc.* and num_batches_tracked keys, which the
        reference's merge loop drops — models/resnet.py:166-255) converted
        with prefix='' must reproduce the reference resnet(cfg)+zoo forward,
        through the same .pt load path the train CLIs use."""
        import torch
        from models.resnet import resnet50

        from egohmr_tpu.interop.torch_convert import (
            convert_resnet,
            load_torch_checkpoint,
        )
        from egohmr_tpu.nn import resnet_forward

        # synthesize a model-zoo-layout checkpoint: headless-model keys plus
        # the zoo-only keys a real torchvision file carries
        torch.manual_seed(2)
        donor = resnet50(pretrained=False)
        with torch.no_grad():
            for mod in donor.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.8, 1.2)
        zoo_sd = {k: v.detach().clone() for k, v in donor.state_dict().items()}
        zoo_sd["fc.weight"] = torch.randn(1000, 2048)
        zoo_sd["fc.bias"] = torch.randn(1000)
        for k in list(zoo_sd):
            if k.endswith("running_var"):
                zoo_sd[k.replace("running_var", "num_batches_tracked")] = (
                    torch.tensor(100))
        pt = str(tmp_path / "imagenet_resnet50.pt")
        torch.save(zoo_sd, pt)

        # reference load semantics: merge zoo keys that exist in the model
        ref = resnet50(pretrained=False)
        state = ref.state_dict()
        for k, v in zoo_sd.items():
            if k in state:
                state[k] = v
        ref.load_state_dict(state)
        ref.eval()

        x = rng.randn(2, 3, 224, 224).astype(np.float32) * 0.5
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()

        sd = load_torch_checkpoint(pt)  # the CLI path (--load_imagenet_ckpt)
        params = convert_resnet(sd, prefix="")
        got, _ = resnet_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)

        # converted tree must be assignment-compatible with an initialized
        # model's backbone subtree (what the CLIs do)
        import jax

        from egohmr_tpu.models import EgoHMRConfig, init_egohmr

        init = init_egohmr(jax.random.PRNGKey(0), EgoHMRConfig())
        t1 = jax.tree_util.tree_structure(init["backbone"])
        t2 = jax.tree_util.tree_structure(params)
        assert t1 == t2

    def test_resnet18_basic_block_matches(self, rng):
        import torch
        from models.resnet import resnet18

        from egohmr_tpu.interop.torch_convert import convert_resnet
        from egohmr_tpu.nn import resnet_forward

        torch.manual_seed(1)
        m = resnet18(pretrained=False).eval()
        x = rng.randn(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        params = convert_resnet(_sd(m), prefix="", num_layers=18)
        got, _ = resnet_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


class TestPointNet:
    def test_eval_forward_matches(self, rng):
        import torch
        from models.respointnet import ResnetPointnet

        from egohmr_tpu.interop.torch_convert import convert_pointnet
        from egohmr_tpu.nn import pointnet_forward

        torch.manual_seed(0)
        m = ResnetPointnet(out_dim=512, hidden_dim=256).eval()
        pts = rng.randn(2, 1000, 3).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(pts)).numpy()
        params = convert_pointnet(_sd(m), prefix="")
        got = pointnet_forward(params, jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_mask_equals_truncation(self, rng):
        """Masked padded points must reproduce the unpadded result."""
        import torch
        from models.respointnet import ResnetPointnet

        from egohmr_tpu.interop.torch_convert import convert_pointnet
        from egohmr_tpu.nn import pointnet_forward

        torch.manual_seed(0)
        m = ResnetPointnet(out_dim=64, hidden_dim=32).eval()
        params = convert_pointnet(_sd(m), prefix="")
        pts = rng.randn(1, 100, 3).astype(np.float32)
        full = pointnet_forward(params, jnp.asarray(pts))
        padded = np.concatenate([pts, np.full((1, 28, 3), 1e3, np.float32)], axis=1)
        mask = np.zeros((1, 128), bool)
        mask[:, :100] = True
        masked = pointnet_forward(params, jnp.asarray(padded), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(masked), np.asarray(full), atol=1e-5)


class TestModulatedGCN:
    def _build(self, rng, train=False):
        import torch
        from models.egohmr.modulated_gcn.modulated_gcn import ModulatedGCN

        from egohmr_tpu.smpl.constants import joint_adjacency

        torch.manual_seed(0)
        adj = torch.from_numpy(joint_adjacency())
        m = ModulatedGCN(adj=adj, in_dim=38, hid_dim=32, out_dim=6, num_layers=2,
                         p_dropout=0.0)
        if train:
            m.train()
        else:
            m.eval()
            with torch.no_grad():
                for mod in m.modules():
                    if isinstance(mod, torch.nn.BatchNorm1d):
                        mod.running_mean.normal_(0, 0.05)
                        mod.running_var.uniform_(0.8, 1.2)
        return m, adj.numpy()

    def test_eval_forward_matches(self, rng):
        import torch

        from egohmr_tpu.interop.torch_convert import convert_modulated_gcn
        from egohmr_tpu.nn import modulated_gcn_forward

        m, adj = self._build(rng, train=False)
        x = rng.randn(3, 24, 38).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        params = convert_modulated_gcn(_sd(m), prefix="", num_layers=2)
        got, _ = modulated_gcn_forward(params, jnp.asarray(adj), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_train_forward_and_bn_stats_match(self, rng):
        import torch

        from egohmr_tpu.interop.torch_convert import convert_modulated_gcn
        from egohmr_tpu.nn import modulated_gcn_forward

        m, adj = self._build(rng, train=True)
        x = rng.randn(8, 24, 38).astype(np.float32)
        params = convert_modulated_gcn(_sd(m), prefix="", num_layers=2)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        got, new_params = modulated_gcn_forward(
            params, jnp.asarray(adj), jnp.asarray(x), train=True
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
        # running stats updated identically (torch momentum 0.1 default)
        want_mean = m.gconv_input[0].bn.running_mean.numpy()
        got_mean = np.asarray(new_params["gconv_input"]["bn"]["mean"])
        np.testing.assert_allclose(got_mean, want_mean, rtol=1e-4, atol=1e-5)
        want_var = m.gconv_input[0].bn.running_var.numpy()
        got_var = np.asarray(new_params["gconv_input"]["bn"]["var"])
        np.testing.assert_allclose(got_var, want_var, rtol=1e-3, atol=1e-5)


    def test_nonlocal_layer_forward_matches(self, rng):
        """gcn_nonlocal_layer=True option (reference modulated_gcn.py:96-110 +
        nets/non_local_embedded_gaussian.py): a checkpoint trained with the
        non-local block must convert and match. BN params are randomized
        because the reference zero-inits the output BN (identity at init)."""
        import torch
        from models.egohmr.modulated_gcn.modulated_gcn import ModulatedGCN

        from egohmr_tpu.interop.torch_convert import convert_modulated_gcn
        from egohmr_tpu.nn import modulated_gcn_forward
        from egohmr_tpu.smpl.constants import joint_adjacency

        torch.manual_seed(3)
        adj = torch.from_numpy(joint_adjacency())
        m = ModulatedGCN(adj=adj, in_dim=38, hid_dim=32, out_dim=6,
                         num_layers=2, p_dropout=0.0, nonlocal_layer=True)
        m.eval()
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.8, 1.2)
                    mod.weight.uniform_(0.5, 1.5)
                    mod.bias.normal_(0, 0.05)
        x = rng.randn(3, 24, 38).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        params = convert_modulated_gcn(_sd(m), prefix="", num_layers=2)
        assert "non_local" in params
        got, _ = modulated_gcn_forward(params, jnp.asarray(adj), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_nonlocal_train_bn_stats_match(self, rng):
        import torch
        from models.egohmr.modulated_gcn.modulated_gcn import ModulatedGCN

        from egohmr_tpu.interop.torch_convert import convert_modulated_gcn
        from egohmr_tpu.nn import modulated_gcn_forward
        from egohmr_tpu.smpl.constants import joint_adjacency

        torch.manual_seed(4)
        adj = torch.from_numpy(joint_adjacency())
        m = ModulatedGCN(adj=adj, in_dim=38, hid_dim=32, out_dim=6,
                         num_layers=2, p_dropout=0.0, nonlocal_layer=True)
        m.train()
        x = rng.randn(8, 24, 38).astype(np.float32)
        params = convert_modulated_gcn(_sd(m), prefix="", num_layers=2)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        got, new_params = modulated_gcn_forward(
            params, jnp.asarray(adj), jnp.asarray(x), train=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
        want_mean = m.non_local.W[1].running_mean.numpy()
        got_mean = np.asarray(new_params["non_local"]["bn"]["mean"])
        np.testing.assert_allclose(got_mean, want_mean, rtol=1e-4, atol=1e-5)

    def test_nonlocal_init_is_identity(self):
        """Fresh init must behave like the reference's zero-initialized
        block: output identical to the nonlocal-free model."""
        import jax

        from egohmr_tpu.nn.gcn import init_modulated_gcn, modulated_gcn_forward
        from egohmr_tpu.smpl.constants import joint_adjacency

        adj = jnp.asarray(joint_adjacency())
        key = jax.random.PRNGKey(0)
        p0 = init_modulated_gcn(key, 38, 32, 6, 2)
        p1 = init_modulated_gcn(key, 38, 32, 6, 2, nonlocal_layer=True)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 38)
                        .astype(np.float32))
        y0, _ = modulated_gcn_forward(p0, adj, x)
        y1, _ = modulated_gcn_forward(p1, adj, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


class TestEmbedders:
    def test_timestep_embedder_matches(self, rng):
        import torch
        import torch.nn as nn

        from egohmr_tpu.interop.torch_convert import convert_timestep_embedder
        from egohmr_tpu.nn import timestep_embed, sinusoidal_table

        torch.manual_seed(0)
        d = 512
        time_embed = nn.Sequential(nn.Linear(d, d), nn.SiLU(), nn.Linear(d, d)).eval()
        pe = torch.from_numpy(sinusoidal_table(d))  # [5000, d]
        ts = np.array([0, 3, 17, 49], np.int64)
        with torch.no_grad():
            want = time_embed(pe[torch.from_numpy(ts)]).numpy()
        sd = {"time_embed." + k: v.detach().numpy()
              for k, v in time_embed.state_dict().items()}
        params = convert_timestep_embedder(sd, prefix="")
        got = timestep_embed(params, jnp.asarray(ts))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_transl_and_beta_heads_match(self, rng):
        import torch
        import torch.nn as nn

        from egohmr_tpu.interop.torch_convert import (
            convert_fc_head_beta,
            convert_transl_enc,
        )
        from egohmr_tpu.nn import fc_head_beta, transl_enc

        torch.manual_seed(1)
        te = nn.Sequential(nn.Linear(3, 64), nn.ReLU(), nn.Linear(64, 128)).eval()
        x = rng.randn(4, 3).astype(np.float32)
        with torch.no_grad():
            want = te(torch.from_numpy(x)).numpy()
        sd = {"layers." + k: v.detach().numpy() for k, v in te.state_dict().items()}
        got = transl_enc(convert_transl_enc(sd, prefix=""), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

        bl = nn.Sequential(nn.Linear(100, 1024), nn.ReLU(), nn.Linear(1024, 10)).eval()
        init_betas = rng.randn(1, 10).astype(np.float32)
        f = rng.randn(4, 100).astype(np.float32)
        with torch.no_grad():
            want = bl(torch.from_numpy(f)).numpy() + init_betas
        sd = {"layers." + k: v.detach().numpy() for k, v in bl.state_dict().items()}
        sd["init_betas"] = init_betas
        got = fc_head_beta(convert_fc_head_beta(sd, prefix=""), jnp.asarray(f))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestDiscriminator:
    def test_forward_matches(self, rng):
        import torch
        from models.prohmr.discriminator import Discriminator

        from egohmr_tpu.interop.torch_convert import convert_discriminator
        from egohmr_tpu.models.discriminator import discriminator_forward

        torch.manual_seed(0)
        m = Discriminator().eval()
        poses = rng.randn(4, 23, 3, 3).astype(np.float32)
        betas = rng.randn(4, 10).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(poses), torch.from_numpy(betas)).numpy()
        params = convert_discriminator(_sd(m), prefix="")
        got = discriminator_forward(params, jnp.asarray(poses), jnp.asarray(betas))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestAdjacency:
    def test_matches_reference_scipy_construction(self):
        import numpy as np
        import scipy.sparse as sp

        from egohmr_tpu.smpl.constants import SMPL_EDGES, joint_adjacency

        # replicate reference egohmr.py:86-93 exactly
        edges = np.array(SMPL_EDGES, dtype=np.int32)
        data, i, j = np.ones(edges.shape[0]), edges[:, 0], edges[:, 1]
        adj_mx = sp.coo_matrix((data, (i, j)), shape=(24, 24), dtype=np.float32)
        adj_mx = adj_mx + adj_mx.T.multiply(adj_mx.T > adj_mx) - adj_mx.multiply(
            adj_mx.T > adj_mx
        )
        rowsum = np.array(adj_mx.sum(1))
        r_inv = np.power(rowsum, -1).flatten()
        r_inv[np.isinf(r_inv)] = 0.0
        adj_mx = sp.diags(r_inv).dot(adj_mx)
        adj = np.asarray(adj_mx.todense(), np.float32)
        adj = adj * (1 - np.eye(24, dtype=np.float32)) + np.eye(24, dtype=np.float32)

        np.testing.assert_allclose(joint_adjacency(), adj, atol=1e-6)


class TestPointShardedPointNet:
    def test_matches_unsharded(self, rng):
        """Point-axis-sharded PointNet over 8 devices == single-device."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from egohmr_tpu.nn import (
            init_pointnet,
            pointnet_forward,
            pointnet_forward_point_sharded,
        )
        from egohmr_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        params = init_pointnet(jax.random.PRNGKey(0), out_dim=32,
                               hidden_dim=16)
        pts = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32))
        want = pointnet_forward(params, pts)

        mesh = make_mesh(8, axis="pts")
        f = lambda p, x: pointnet_forward_point_sharded(p, x, axis_name="pts")
        got = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P(), P(None, "pts")), out_specs=P(),
            check_vma=False,
        ))(params, pts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
