"""Tests for the z-packed compute mode (ops.packed + packed model path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.ops.packed import (
    build_packed_weights,
    choose_z_block,
    pack_z,
    packed_conv3d,
    packed_group_norm,
    unpack_z,
)


def test_pack_unpack_roundtrip():
    x = jnp.asarray(np.arange(2 * 4 * 4 * 8 * 3).reshape(2, 4, 4, 8, 3))
    assert np.array_equal(np.asarray(unpack_z(pack_z(x, 4), 4)), np.asarray(x))
    with pytest.raises(ValueError):
        pack_z(x, 3)  # 8 % 3 != 0


def test_choose_z_block():
    assert choose_z_block(32, 96) == 4
    assert choose_z_block(64, 48) == 2
    assert choose_z_block(128, 24) == 1
    assert choose_z_block(32, 6) == 2  # limited by z divisibility


def test_packed_conv_matches_plain():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    out = unpack_z(packed_conv3d(pack_z(x, 4), w, 4), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_packed_conv_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 3)).astype(np.float32))
    b = jnp.asarray([1.0, 2.0, 3.0])
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    ) + b
    out = unpack_z(packed_conv3d(pack_z(x, 2), w, 2, bias=b), 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("zb_in", [1, 2, 4])
def test_packed_conv_transpose_matches_flax(zb_in):
    """Packed stride-2 transposed conv == unpack -> flax ConvTranspose
    (torch-phase padding (1,2)) -> pack."""
    from flax import linen as nn

    from tpu_mednet.ops.packed import packed_conv_transpose3d

    rng = np.random.default_rng(4)
    ci, co = 3, 5
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ct = nn.ConvTranspose(features=co, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                          padding=((1, 2), (1, 2), (1, 2)))
    ref = ct.apply({"params": {"kernel": w, "bias": b}}, x)
    out = packed_conv_transpose3d(pack_z(x, zb_in), w, zb_in, bias=b)
    np.testing.assert_array_equal(
        np.asarray(unpack_z(out, 2 * zb_in)), np.asarray(ref)
    )


def test_conv_transpose_matches_torch_geometry():
    """The decoder upsample phase equals torch ConvTranspose3d(k=3, s=2,
    p=1, op=1) — the reference geometry (components.py:259-266) — up to
    the kernel-flip reparameterization (flax correlates, torch scatters).
    flax 'SAME' is shifted +1 voxel per dim and would misalign the
    skip-sum."""
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    rng = np.random.default_rng(7)
    w = rng.normal(size=(3, 3, 3)).astype(np.float32)
    x = rng.normal(size=(1, 1, 5, 4, 6)).astype(np.float32)

    tconv = torch.nn.ConvTranspose3d(1, 1, 3, stride=2, padding=1,
                                     output_padding=1, bias=False)
    with torch.no_grad():
        tconv.weight[:] = torch.from_numpy(w[None, None])
    ref = tconv(torch.from_numpy(x)).detach().numpy()[0, 0]

    m = nn.ConvTranspose(features=1, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                         padding=((1, 2), (1, 2), (1, 2)), use_bias=False)
    flipped = jnp.asarray(np.ascontiguousarray(
        w[::-1, ::-1, ::-1])[..., None, None])
    out = m.apply({"params": {"kernel": flipped}},
                  jnp.asarray(np.moveaxis(x, 1, -1)))[0, ..., 0]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_packed_conv_transpose_module_param_parity():
    """PackedConvTranspose param tree == nn.ConvTranspose param tree."""
    from flax import linen as nn

    from tpu_mednet.models.packed_layers import PackedConvTranspose

    x = jnp.zeros((1, 4, 4, 4, 8))  # packed at zb_in=2 -> logical Ci=4
    mp = PackedConvTranspose(features=6, z_block_in=2)
    vp = mp.init(jax.random.PRNGKey(0), x)
    m = nn.ConvTranspose(features=6, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                         padding="SAME")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8, 4)))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vp)):
        assert a.shape == b.shape


def test_packed_group_norm_matches_plain():
    from flax import linen as nn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 8)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    out = unpack_z(packed_group_norm(pack_z(x, 4), 4, 4, scale, bias), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def make_cfgs(block="residual", order="cge"):
    cfg = UNetConfig(
        in_channels=1, out_channels=2, f_maps=8, num_levels=3,
        block=block, layer_order=order, num_groups=4, dtype=jnp.float32,
    )
    return cfg, dataclasses.replace(cfg, packed=True)


@pytest.mark.parametrize("block,order", [("residual", "cge"), ("double", "crg")])
def test_packed_unet_forward_matches_unpacked(block, order):
    """Same params through packed and unpacked paths -> same output."""
    cfg, cfg_p = make_cfgs(block, order)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    )
    m, mp = UNet3DBase(config=cfg), UNet3DBase(config=cfg_p)
    v = m.init(jax.random.PRNGKey(0), x)
    # param trees identical -> checkpoints interchangeable
    vp = mp.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    y = np.asarray(m.apply(v, x))
    yp = np.asarray(mp.apply(v, x))
    np.testing.assert_allclose(y, yp, atol=1e-4)


@pytest.mark.slow  # heavy jit/fit (measured r5)
def test_packed_unet_gradients_match():
    cfg, cfg_p = make_cfgs()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    )
    m, mp = UNet3DBase(config=cfg), UNet3DBase(config=cfg_p)
    v = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(v["params"])
    gp = jax.grad(lambda p: jnp.sum(mp.apply({"params": p}, x) ** 2))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gp)):
        # different contraction order -> fp32 rounding; relative match
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2)


def test_packed_with_remat():
    cfg, cfg_p = make_cfgs()
    cfg_pr = dataclasses.replace(cfg_p, remat=2)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    )
    m = UNet3DBase(config=cfg)
    mpr = UNet3DBase(config=cfg_pr)
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m.apply(v, x)), np.asarray(mpr.apply(v, x)), atol=1e-4
    )


@pytest.mark.parametrize("pool_type", ["max", "avg"])
def test_packed_pool2_matches_plain(pool_type):
    from tpu_mednet.models.blocks import pool3d
    from tpu_mednet.ops.packed import packed_pool2

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16, 4)).astype(np.float32))
    ref = pool3d(x, (2, 2, 2), pool_type)
    out = unpack_z(packed_pool2(pack_z(x, 4), 4, pool_type), 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_packed_pool2_rejects_odd_block():
    from tpu_mednet.ops.packed import packed_pool2

    with pytest.raises(ValueError):
        packed_pool2(jnp.zeros((1, 4, 4, 4, 12)), 3)
