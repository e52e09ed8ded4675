"""Tests for the Pallas GroupNorm-statistics kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.ops.pallas.groupnorm import (
    _lane_moments_xla,
    lane_moments,
    lane_moments_pallas,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 8, 6, 4, 128), (1, 12, 4, 3, 256)])
def test_lane_moments_pallas_matches_xla(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape)).astype(dtype)
    s_ref, q_ref = _lane_moments_xla(x)
    s, q = lane_moments_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=1e-5)


def test_lane_moments_pallas_odd_tile_split():
    """X extent with no large divisor still covers every element."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 7, 4, 4, 128)).astype(np.float32))
    s_ref, q_ref = _lane_moments_xla(x)
    s, q = lane_moments_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=1e-5)


def test_lane_moments_grad_closed_form():
    """custom_vjp backward == autodiff of the plain reduction."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 2, 128)).astype(np.float32))

    def loss_custom(x):
        s, q = lane_moments(x)
        return jnp.sum(jnp.sin(s)) + jnp.sum(q * 0.25)

    def loss_plain(x):
        s, q = _lane_moments_xla(x)
        return jnp.sum(jnp.sin(s)) + jnp.sum(q * 0.25)

    g_custom = jax.grad(loss_custom)(x)
    g_plain = jax.grad(loss_plain)(x)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_plain), rtol=1e-5, atol=1e-6
    )


def test_packed_group_norm_stats_via_moments():
    """Group stats from lane moments == direct reshape-reduce."""
    from tpu_mednet.ops.packed import pack_z, packed_group_norm_stats

    rng = np.random.default_rng(3)
    zb, groups = 4, 8
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 8, 32)).astype(np.float32))
    xp = pack_z(x, zb)
    mean, var = packed_group_norm_stats(xp, zb, groups)
    xr = np.asarray(x, np.float32).reshape(2, -1, groups, 32 // groups)
    mean_ref = xr.mean(axis=(1, 3))
    var_ref = (xr**2).mean(axis=(1, 3)) - mean_ref**2
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-4, atol=1e-5)
