"""Device-side random-patch extraction.

The reference's hot input loop crops patches on the CPU inside DataLoader
workers (`/root/reference/midasmednet/dataset.py:311-330`).  TPU-native
alternative: keep whole subject volumes resident in HBM and gather training
patches *on device* from sampled corner indices — per-step host work drops
to sampling a few integers.

Two implementations with identical semantics:

- ``extract_patches_xla``: vmap'd ``lax.dynamic_slice`` (works everywhere,
  XLA fuses the gather);
- ``extract_patches_pallas``: a Pallas kernel using scalar-prefetched corner
  indices to DMA each patch HBM->VMEM directly (PrefetchScalarGridSpec —
  the index-driven DMA pattern from the Pallas guide), double-buffered by
  the Pallas pipeline over the grid.

``extract_patches`` currently always dispatches the XLA path (see its
docstring for the Mosaic lane-alignment constraint that keeps the Pallas
variant off by default).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def extract_patches_xla(volume: Array, corners: Array,
                        patch_size: Sequence[int]) -> Array:
    """Gather N patches from one volume.

    volume: (X, Y, Z, C); corners: (N, 3) int32; returns (N, px, py, pz, C).
    Corners must be in-bounds (callers sample them that way,
    ``get_random_patch_indices`` semantics).
    """
    px, py, pz = patch_size
    c = volume.shape[-1]

    def one(corner):
        return jax.lax.dynamic_slice(
            volume,
            (corner[0], corner[1], corner[2], 0),
            (px, py, pz, c),
        )

    return jax.vmap(one)(corners.astype(jnp.int32))


def extract_patches_pallas(volume: Array, corners: Array,
                           patch_size: Sequence[int],
                           interpret: bool = False) -> Array:
    """Pallas variant of ``extract_patches_xla`` (TPU).

    The volume stays in compiler-chosen (HBM) memory; each grid step DMAs
    one patch into its VMEM output block, with corner indices scalar-
    prefetched so the DMA addresses are known ahead of the block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    corners = corners.astype(jnp.int32)
    n = corners.shape[0]
    px, py, pz = patch_size
    c = volume.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, px, py, pz, c),
            lambda i, corners_ref: (i, 0, 0, 0, 0),
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )

    def kernel(corners_ref, vol_ref, out_ref, sem):
        i = pl.program_id(0)
        x0 = corners_ref[i, 0]
        y0 = corners_ref[i, 1]
        z0 = corners_ref[i, 2]
        dma = pltpu.make_async_copy(
            vol_ref.at[pl.ds(x0, px), pl.ds(y0, py), pl.ds(z0, pz), :],
            out_ref.at[0],
            sem,
        )
        dma.start()
        dma.wait()

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, px, py, pz, c), volume.dtype),
        interpret=interpret,
    )(corners, volume)


def extract_patches(volume: Array, corners: Array,
                    patch_size: Sequence[int]) -> Array:
    """Device-side patch gather.

    Currently always the XLA path: Mosaic requires DMA slice shapes on the
    lane (last) dim to be 128-aligned, which a (X, Y, Z, C<128) medical
    volume violates — the Pallas variant is kept for aligned layouts and as
    the starting point for a fused gather+normalize+augment kernel.
    """
    return extract_patches_xla(volume, corners, patch_size)
