"""Spatial partitioning with explicit halo exchange (shard_map + ppermute).

The volumetric analogue of context/sequence parallelism (SURVEY.md §5.7):
a large volume's leading spatial axis is sharded over the mesh 'space'
axis; each 3x3x3 conv needs one voxel of neighbor data per side per conv,
so shards exchange ``halo`` boundary slabs over ICI with
``jax.lax.ppermute`` before running the local computation, then crop.

Two entry points:

- ``halo_exchange``: the communication primitive (pad-with-neighbor-slabs),
  usable inside any ``shard_map``-ped function;
- ``spatially_sharded_apply``: runs an arbitrary patchwise model over a
  volume sharded on the X axis, exchanging ``halo`` voxels so results match
  the unsharded computation wherever the model's receptive field fits in
  the halo.

Note XLA's GSPMD partitioner already inserts halos automatically for convs
under ``jit`` with sharded inputs (tested in tests/test_sharding.py); this
explicit path exists for cases where manual control beats the partitioner —
notably fused sliding-window inference where the halo is reused across
overlapping tiles.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_mednet.parallel.mesh import SPACE_AXIS


def halo_exchange(x: jax.Array, halo: int, axis_name: str = SPACE_AXIS,
                  spatial_axis: int = 1) -> jax.Array:
    """Pad a local shard with ``halo`` slabs from both ring neighbors.

    Runs inside shard_map.  Edge shards receive a zero slab on their outer
    side (matching zero-padded convolution semantics at volume borders).
    Communication is two ``ppermute`` rounds over the ICI ring.
    """
    if halo == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    lo = jax.lax.slice_in_dim(x, 0, halo, axis=spatial_axis)
    hi_start = x.shape[spatial_axis] - halo
    hi = jax.lax.slice_in_dim(x, hi_start, x.shape[spatial_axis], axis=spatial_axis)

    # send my high slab to the right neighbor (it becomes their left halo),
    # my low slab to the left neighbor (their right halo)
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(hi, axis_name, right_perm)
    from_right = jax.lax.ppermute(lo, axis_name, left_perm)

    # zero the wrapped-around halos at the global volume edges
    zero = jnp.zeros_like(lo)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n - 1, zero, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=spatial_axis)


def crop_halo(x: jax.Array, halo: int, spatial_axis: int = 1) -> jax.Array:
    if halo == 0:
        return x
    return jax.lax.slice_in_dim(
        x, halo, x.shape[spatial_axis] - halo, axis=spatial_axis
    )


def spatially_sharded_apply(
    fn: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    halo: int,
    spatial_axis: int = 1,
) -> Callable[[jax.Array], jax.Array]:
    """Wrap ``fn`` (volume -> volume, shape-preserving on the spatial axis)
    to run over an X-sharded volume with explicit halo exchange.

    Contract (matches sliding-window stitching semantics, which pads the
    volume before tiling — reference dataset.py:376-379): the result equals
    ``crop(fn(zero_pad(volume, halo)), halo)`` computed unsharded, exactly,
    provided ``halo`` covers fn's receptive-field reach (for a U-Net with L
    pooling levels of 3^3 convs per block, reach grows with 2^L — pick
    halo >= the patch overlap you would use for sliding-window inference).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = [None] * 5
    spec[spatial_axis] = SPACE_AXIS
    pspec = P(*spec)

    def local(x):
        padded = halo_exchange(x, halo, spatial_axis=spatial_axis)
        out = fn(padded)
        return crop_halo(out, halo, spatial_axis=spatial_axis)

    return shard_map(local, mesh=mesh, in_specs=(pspec,), out_specs=pspec)
