"""Shape / topology / gradient tests for the U-Net stack."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ramp_tpu.nn.layers import (
    Conv1dBlock, Downsample1d, ResidualTemporalBlock, TimeEncoder, Upsample1d,
    group_norm_n_groups, mish,
)
from ramp_tpu.nn.attention import SpatialTransformer
from ramp_tpu.nn.encoders import ObstacleEncoderSet2D, ObstacleEncoder3D
from ramp_tpu.nn.unet import TemporalUnet, UNET_DIM_MULTS
from ramp_tpu.sampler.energy import make_eps_fn, make_eps_and_energy_fn


def test_group_norm_n_groups():
    assert group_norm_n_groups(32) == 8
    assert group_norm_n_groups(4) == 1
    assert group_norm_n_groups(96) == 8
    assert group_norm_n_groups(9) == 9


def test_mish_matches_torch():
    import torch
    x = np.linspace(-4, 4, 21).astype(np.float32)
    expected = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
    got = np.asarray(mish(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_down_up_sample_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 32))
    down = Downsample1d(32)
    params = down.init(key, x)
    y = down.apply(params, x)
    assert y.shape == (2, 32, 32)
    up = Upsample1d(32)
    params = up.init(key, y)
    z = up.apply(params, y)
    assert z.shape == (2, 64, 32)
    # odd-length horizons used by the dynamic model (H=48 -> 24 -> 12 -> 6)
    x48 = jnp.zeros((2, 48, 32))
    assert down.apply(down.init(key, x48), x48).shape == (2, 24, 32)


def test_conv_transpose_matches_torch_convtranspose1d():
    """Upsample1d must implement torch ConvTranspose1d(k=4, s=2, p=1)."""
    import torch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 3)).astype(np.float32)  # B,H,C
    up = Upsample1d(3)
    params = up.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # pull the flax kernel (shape [k, in, out]) and bias
    kdict = params["params"]
    sub = kdict if "kernel" in kdict else kdict[list(kdict.keys())[0]]
    w = np.asarray(sub["kernel"])  # [4, 3, 3]
    b = np.asarray(sub["bias"])
    conv = torch.nn.ConvTranspose1d(3, 3, kernel_size=4, stride=2, padding=1)
    with torch.no_grad():
        # torch weight: [in, out, k]; flax ConvTranspose(transpose_kernel=True)
        # kernel: [k, out, in]
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0).copy()))
        conv.bias.copy_(torch.from_numpy(b))
        expected = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    got = np.asarray(up.apply(params, jnp.asarray(x)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_residual_block_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 4))
    t_emb = jnp.zeros((2, 32))
    block = ResidualTemporalBlock(32)
    params = block.init(key, x, t_emb)
    y = block.apply(params, x, t_emb)
    assert y.shape == (2, 64, 32)


def test_spatial_transformer_zero_init_is_identity():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 32))
    ctx = jax.random.normal(key, (2, 1, 320))
    st = SpatialTransformer(32, 4, 64, depth=2, context_dim=320)
    params = st.init(key, x, ctx)
    y = st.apply(params, x, ctx)
    # proj_out zero-init -> block starts as identity (ref zero_module)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_encoder_2d_output_shape_and_permutation_invariance():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 6, 64, 2), minval=-1, maxval=1)
    enc = ObstacleEncoderSet2D()
    params = enc.init(key, pts)
    lat = enc.apply(params, pts)
    assert lat.shape == (2, 1, 320)
    # permuting points within an obstacle must not change the latent
    perm = jax.random.permutation(jax.random.PRNGKey(1), 64)
    lat_perm = enc.apply(params, pts[:, :, perm, :])
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_perm), atol=1e-4)


def test_encoder_3d_output_shape_and_obstacle_permutation_invariance():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 5, 32, 3), minval=-1, maxval=1)
    enc = ObstacleEncoder3D()
    params = enc.init(key, pts)
    lat = enc.apply(params, pts)
    assert lat.shape == (2, 1, 256)
    perm = jax.random.permutation(jax.random.PRNGKey(1), 5)
    lat_perm = enc.apply(params, pts[:, perm, :, :])
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_perm), atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("horizon,mults_opt", [(64, 1), (48, 1), (64, 0)])
def test_unet_shapes(horizon, mults_opt):
    key = jax.random.PRNGKey(0)
    unet = TemporalUnet(state_dim=4, dim_mults=UNET_DIM_MULTS[mults_opt])
    x = jnp.zeros((2, horizon, 4))
    t = jnp.zeros((2,), jnp.int32)
    lat = jnp.zeros((2, 1, 320))
    params = unet.init(key, x, t, lat)
    y = unet.apply(params, x, t, lat)
    assert y.shape == (2, horizon, 4)


@pytest.mark.slow
def test_energy_eps_grad():
    key = jax.random.PRNGKey(0)
    unet = TemporalUnet(state_dim=4)
    x = jax.random.normal(key, (2, 16, 4))
    t = jnp.asarray([3, 7])
    lat = jax.random.normal(key, (2, 1, 320))
    params = unet.init(key, x, t, lat)
    eps_fn = make_eps_fn(unet.apply, energy_mode=True)
    eps = eps_fn(params, x, t, lat)
    assert eps.shape == x.shape
    assert np.all(np.isfinite(np.asarray(eps)))
    # finite-difference check of the energy gradient on one coordinate
    def energy(xv):
        out = unet.apply(params, xv, t, lat)
        return 0.5 * jnp.sum(out ** 2)
    h = 1e-3
    dx = jnp.zeros_like(x).at[0, 5, 2].set(h)
    fd = (energy(x + dx) - energy(x - dx)) / (2 * h)
    np.testing.assert_allclose(float(eps[0, 5, 2]), float(fd), rtol=5e-2, atol=1e-4)


def test_energy_and_value():
    key = jax.random.PRNGKey(0)
    unet = TemporalUnet(state_dim=4)
    x = jax.random.normal(key, (2, 16, 4))
    t = jnp.asarray([3, 7])
    lat = jax.random.normal(key, (2, 1, 320))
    params = unet.init(key, x, t, lat)
    eps, energy = make_eps_and_energy_fn(unet.apply)(params, x, t, lat)
    assert eps.shape == x.shape
    assert float(energy) > 0


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["bnhd", "fused"])
def test_attn_impl_matches_default(impl):
    """The bnhd (no-head-transpose) and fused (single-QKV-matmul) lowerings
    are the same math as default, on the identical param tree — so
    checkpoints are interchangeable across impls."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 16, 4))
    t = jnp.asarray([3, 7])
    lat = jax.random.normal(key, (2, 1, 320))
    unet_a = TemporalUnet(state_dim=4)
    unet_b = TemporalUnet(state_dim=4, attn_impl=impl)
    params = unet_a.init(key, x, t, lat)
    # param trees must match exactly (fused declares kernels via _ProjKernel)
    pb = unet_b.init(key, x, t, lat)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(pb)
    out_a = unet_a.apply(params, x, t, lat)
    out_b = unet_b.apply(params, x, t, lat)  # identical param tree
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)
    # and through the energy gradient (the replan hot path)
    eps_a = make_eps_fn(unet_a.apply)(params, x, t, lat)
    eps_b = make_eps_fn(unet_b.apply)(params, x, t, lat)
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b),
                               rtol=1e-4, atol=1e-5)


def test_attn_impl_unknown_raises():
    st = SpatialTransformer(in_channels=8, n_heads=2, d_head=4,
                            context_dim=320, attn_impl="nope")
    x = jnp.zeros((1, 8, 8))
    lat = jnp.zeros((1, 1, 320))
    with pytest.raises(ValueError, match="attn_impl"):
        st.init(jax.random.PRNGKey(0), x, context=lat)
