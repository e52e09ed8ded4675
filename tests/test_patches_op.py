"""Tests for device-side patch extraction (XLA path; Pallas is TPU-only)."""

import jax.numpy as jnp
import numpy as np

from tpu_mednet.ops.pallas.patches import extract_patches, extract_patches_xla


def test_extract_patches_matches_numpy():
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(32, 28, 24, 2)).astype(np.float32)
    corners = np.stack([
        rng.integers(0, 32 - 8, size=16),
        rng.integers(0, 28 - 8, size=16),
        rng.integers(0, 24 - 8, size=16),
    ], axis=1).astype(np.int32)
    out = np.asarray(extract_patches_xla(jnp.asarray(vol), jnp.asarray(corners), (8, 8, 8)))
    assert out.shape == (16, 8, 8, 8, 2)
    for i, (x, y, z) in enumerate(corners):
        np.testing.assert_array_equal(out[i], vol[x:x+8, y:y+8, z:z+8])


def test_extract_patches_dispatch_cpu():
    vol = jnp.zeros((16, 16, 16, 1))
    corners = jnp.zeros((4, 3), jnp.int32)
    out = extract_patches(vol, corners, (8, 8, 8))
    assert out.shape == (4, 8, 8, 8, 1)
