"""Whole-volume inference via spatial partitioning across the mesh.

For volumes whose activations exceed one chip's HBM, the alternative to
patch tiling is sharding the volume's leading spatial axis over the mesh
'space' axis and running the U-Net ONCE over the whole volume — XLA/ICI
halo exchange replaces the tile-overlap recompute (the conv-net sibling of
context parallelism, SURVEY.md §5.7).

Two modes:
- ``auto`` (default): rely on XLA's GSPMD partitioner — input sharded with
  ``spatial_sharding``, convs get their halos automatically;
- ``explicit``: shard_map + ppermute halo exchange
  (tpu_mednet.parallel.halo) with the padded-volume contract — for manual
  control and as the building block for fused pipelines.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from tpu_mednet.parallel.halo import spatially_sharded_apply
from tpu_mednet.parallel.mesh import SPACE_AXIS, spatial_sharding


def receptive_halo(num_levels: int, convs_per_block: int = 3,
                   kernel_radius: int = 1) -> int:
    """Upper bound on the one-sided receptive-field reach of the U-Net.

    Each level runs ~``convs_per_block`` 3^3 convs at stride 2^level (both
    encoder and decoder sides), so reach ≈ sum_l 2 * convs * radius * 2^l.
    """
    reach = 0
    for level in range(num_levels):
        reach += 2 * convs_per_block * kernel_radius * (2**level)
    return reach


def predict_volume_spatial(
    task,
    variables,
    volume: np.ndarray,
    mesh,
    mode: str = "auto",
    halo: Optional[int] = None,
    tta_flips=(),
) -> np.ndarray:
    """Run the task's forward+postprocess over one whole volume.

    ``volume`` is (C, X, Y, Z) host-side (reference storage layout); the X
    axis is sharded over the mesh 'space' axis.  X is padded up to a
    multiple of the axis size.  Returns the postprocessed (out_C, X, Y, Z)
    uint8 volume.

    ``tta_flips`` (spatial axes 0..2) runs mirror test-time augmentation
    over the whole volume.  Under ``mode='auto'`` GSPMD handles a flip of
    the sharded X axis (collective permute); ``mode='explicit'`` applies
    the forward per shard, so mirroring the sharded axis (0) is refused —
    use axes 1/2 there, or 'auto'.
    """
    model = task.model
    tta_flips = tuple(tta_flips)
    if mode == "explicit" and 0 in tta_flips:
        raise ValueError(
            "explicit halo mode cannot mirror the spatially-sharded X axis "
            "(axis 0); use tta axes 1/2 there, or mode='auto'"
        )
    n_space = mesh.shape[SPACE_AXIS]
    x = np.moveaxis(np.asarray(volume, dtype=np.float32), 0, -1)[None]  # NXYZC

    # pad X to a multiple of the space axis (and of the pooling factor)
    pool = 2 ** (model.config.num_levels - 1)
    quantum = int(np.lcm(n_space, pool))
    size_x = x.shape[1]
    pad_x = (-size_x) % quantum
    if pad_x:
        x = np.pad(x, [(0, 0), (0, pad_x), (0, 0), (0, 0), (0, 0)])

    def fwd(v):
        if tta_flips:
            from tpu_mednet.inference.common import (
                postprocess_activations,
                tta_split_activations,
            )
            act = tta_split_activations(task, variables, v, tta_flips)
            return postprocess_activations(task, act)
        logits = model.apply(variables, v.astype(model.config.dtype), train=False)
        return task.predict_postprocess(logits)

    if mode == "auto":
        xs = jax.device_put(x, spatial_sharding(mesh, axis=1))
        out = jax.jit(fwd)(xs)
    elif mode == "explicit":
        h = halo if halo is not None else receptive_halo(model.config.num_levels)
        # halo slabs must survive the pooling pyramid: round up to pool
        h = int(-(-h // pool) * pool)
        sharded = spatially_sharded_apply(fwd, mesh, halo=h, spatial_axis=1)
        xs = jax.device_put(x, spatial_sharding(mesh, axis=1))
        out = jax.jit(sharded)(xs)
    else:
        raise ValueError(f"mode must be 'auto' or 'explicit', got {mode!r}")

    out = np.asarray(jax.device_get(out))[0]
    if pad_x:
        out = out[:size_x]
    return np.moveaxis(out, -1, 0)
