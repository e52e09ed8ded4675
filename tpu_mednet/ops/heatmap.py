"""On-device Gaussian landmark-heatmap synthesis.

The reference stores precomputed heatmap volumes in HDF5 (``heatmap_group``,
`/root/reference/midasmednet/dataset.py:261-262`) generated offline with a
per-landmark ``sigma`` (the prediction config carries ``base.sigma``,
`examples/predict.py:29`).  TPU-native equivalent: synthesize the Gaussians
*on device* from landmark coordinates — removes the heatmap volumes from
storage and HBM traffic entirely (north-star item in BASELINE.json).

Heatmaps use the reference's 0..255 uint8-style amplitude convention
(predict.py:92 clips predictions to [0, 255]).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def gaussian_heatmap(
    coords: Array,
    shape: Sequence[int],
    sigma: Union[float, Array],
    amplitude: float = 255.0,
    dtype=jnp.float32,
) -> Array:
    """Render Gaussian heatmaps for landmark coordinates.

    Args:
        coords: (L, 3) landmark voxel coordinates (may be fractional,
            may lie OUTSIDE the volume — the Gaussian tail still renders,
            matching the crop-a-stored-heatmap semantics of the reference).
            A coordinate with any component < -1000 is treated as a
            missing-landmark sentinel and renders as all-zeros.
        shape: spatial (X, Y, Z) of the output.
        sigma: scalar or per-landmark (L,) standard deviation in voxels.
        amplitude: peak value (reference convention: 255).

    Returns:
        (X, Y, Z, L) heatmap volume (channels-last).
    """
    coords = jnp.asarray(coords, dtype=jnp.float32)
    if coords.ndim != 2 or coords.shape[-1] != 3:
        raise ValueError(f"coords must be (L, 3), got {coords.shape}")
    sx, sy, sz = shape
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (coords.shape[0],))

    # separable 1D squared distances: (X,L), (Y,L), (Z,L)
    gx = jax.lax.broadcasted_iota(jnp.float32, (sx, 1), 0)
    gy = jax.lax.broadcasted_iota(jnp.float32, (sy, 1), 0)
    gz = jax.lax.broadcasted_iota(jnp.float32, (sz, 1), 0)
    dx2 = (gx - coords[None, :, 0]) ** 2
    dy2 = (gy - coords[None, :, 1]) ** 2
    dz2 = (gz - coords[None, :, 2]) ** 2
    inv2s2 = 1.0 / (2.0 * sigma**2)
    # exp(-(dx2+dy2+dz2)/2s^2) = ex*ey*ez — three small exps + outer product,
    # no (X,Y,Z,L) distance tensor materialized before the product
    ex = jnp.exp(-dx2 * inv2s2)  # (X, L)
    ey = jnp.exp(-dy2 * inv2s2)  # (Y, L)
    ez = jnp.exp(-dz2 * inv2s2)  # (Z, L)
    hm = (
        ex[:, None, None, :] * ey[None, :, None, :] * ez[None, None, :, :]
    ) * amplitude
    valid = jnp.all(coords > -1000.0, axis=-1)
    hm = jnp.where(valid[None, None, None, :], hm, 0.0)
    return hm.astype(dtype)


def batched_gaussian_heatmaps(
    coords: Array,
    shape: Sequence[int],
    sigma: Union[float, Array],
    amplitude: float = 255.0,
    dtype=jnp.float32,
) -> Array:
    """vmap'd variant: coords (N, L, 3) -> (N, X, Y, Z, L)."""
    return jax.vmap(
        lambda c: gaussian_heatmap(c, shape, sigma, amplitude, dtype)
    )(coords)


def heatmap_argmax_coords(heatmaps: Array) -> Array:
    """Extract per-channel peak coordinates from (..., X, Y, Z, L) heatmaps.

    Returns (..., L, 3) integer voxel coordinates — the standard landmark
    readout for evaluating against ground truth.
    """
    *lead, sx, sy, sz, nl = heatmaps.shape
    flat = heatmaps.reshape(*lead, sx * sy * sz, nl)
    idx = jnp.argmax(flat, axis=-2)  # (..., L)
    x = idx // (sy * sz)
    y = (idx // sz) % sy
    z = idx % sz
    return jnp.stack([x, y, z], axis=-1)
