"""Halo-exchange spatial partitioning tests (8-device virtual CPU mesh).

Contract under test: ``spatially_sharded_apply(fn, mesh, halo)(x)`` equals
``crop(fn(zero_pad(x, halo)), halo)`` computed unsharded — the same
semantics sliding-window stitching provides (the volume is padded before
tiling, reference dataset.py:376-379).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.parallel.halo import spatially_sharded_apply
from tpu_mednet.parallel.mesh import make_mesh, spatial_sharding


def padded_reference(fn, x, halo):
    xp = np.pad(x, [(0, 0), (halo, halo), (0, 0), (0, 0), (0, 0)])
    out = np.asarray(fn(jnp.asarray(xp)))
    return out[:, halo:-halo] if halo else out


def make_conv(w):
    def conv(v):
        return jax.lax.conv_general_dilated(
            v, jnp.asarray(w), window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    return conv


def test_halo_exchange_identity():
    mesh = make_mesh(n_data=1, n_space=8)
    x = np.random.default_rng(0).normal(size=(1, 64, 8, 8, 1)).astype(np.float32)
    f = spatially_sharded_apply(lambda v: v, mesh, halo=2)
    xs = jax.device_put(x, spatial_sharding(mesh, axis=1))
    np.testing.assert_allclose(np.asarray(jax.jit(f)(xs)), x, atol=1e-6)


def test_single_conv_exact():
    mesh = make_mesh(n_data=1, n_space=8)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 8, 8, 2)).astype(np.float32)
    conv = make_conv(rng.normal(size=(3, 3, 3, 2, 4)).astype(np.float32) * 0.1)
    y_ref = padded_reference(conv, x, 1)
    xs = jax.device_put(x, spatial_sharding(mesh, axis=1))
    y = np.asarray(jax.jit(spatially_sharded_apply(conv, mesh, halo=1))(xs))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_stacked_convs_exact_with_sufficient_halo():
    mesh = make_mesh(n_data=1, n_space=8)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 64, 8, 8, 1)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 1, 1)).astype(np.float32)
    conv = make_conv(w)

    def conv2(v):
        return conv(conv(v))

    y_ref = padded_reference(conv2, x, 2)
    xs = jax.device_put(x, spatial_sharding(mesh, axis=1))
    y = np.asarray(jax.jit(spatially_sharded_apply(conv2, mesh, halo=2))(xs))
    np.testing.assert_allclose(y, y_ref, atol=1e-4)

    # with halo below the receptive-field reach the interior seams break —
    # proving the halo actually carries boundary data between shards
    y_ref1 = padded_reference(conv2, x, 1)
    y_bad = np.asarray(jax.jit(spatially_sharded_apply(conv2, mesh, halo=1))(xs))
    assert not np.allclose(y_bad, y_ref1, atol=1e-4)
