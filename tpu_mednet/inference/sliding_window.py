"""Sliding-window inference: tile -> batched jit forward -> stitch.

TPU-native rebuild of the reference predict pipeline
(`/root/reference/examples/predict.py:52-115`): overlap-tiled grid patches
are batched to a FIXED batch size (padding the tail batch so every forward
hits one cached XLA compilation — the jit answer to "dynamic shapes vs
inference", SURVEY.md §7.3), run through the task's jit'd
forward+postprocess step, cropped and stitched back into full volumes.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mednet.data.grid import GridPatchSampler
from tpu_mednet.data.readers import open_reader
from tpu_mednet.data.stores import VolumeGroup
from tpu_mednet.train.step import make_predict_step

logger = logging.getLogger(__name__)


def pad_batch(data: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad the leading axis up to ``batch_size`` by repeating the last patch."""
    n = data.shape[0]
    if n == batch_size:
        return data
    pad = np.repeat(data[-1:], batch_size - n, axis=0)
    return np.concatenate([data, pad], axis=0)


def predict_volumes(
    task,
    variables,
    data_path,
    subject_keys: Sequence[str],
    patch_size: Sequence[int],
    patch_overlap: Sequence[int],
    batch_size: int = 8,
    out_channels: Optional[int] = None,
    channel_selection: Optional[Sequence[int]] = None,
    image_group: str = "images",
    reader_cls=None,
    reader=None,
    pad_mode: str = "constant",
    out_dtype=np.uint8,
    mesh=None,
    tta_flips=(),
) -> VolumeGroup:
    """Run sliding-window inference over subjects; returns the assembled
    ``VolumeGroup`` (key -> (out_channels, X, Y, Z) volume with affine).

    With ``mesh``, patch batches are sharded over the 'data' axis — data-
    parallel inference across chips (``batch_size`` must divide evenly).
    With ``tta_flips`` (spatial axes 0..2), mirror test-time augmentation
    averages 2^k flipped forwards per patch before the argmax.
    """
    if out_channels is None:
        out_channels = getattr(task, "num_heatmaps", 0) + 1
    sharding = None
    if mesh is not None:
        from tpu_mednet.parallel.mesh import batch_sharding, replicated

        n_data = mesh.shape.get("data", 1)
        if batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis {n_data}"
            )
        sharding = batch_sharding(mesh)
        variables = jax.device_put(variables, replicated(mesh))

    sampler = GridPatchSampler(
        data_path,
        subject_keys,
        patch_size,
        patch_overlap,
        out_channels=out_channels,
        out_dtype=out_dtype,
        channel_selection=channel_selection,
        image_group=image_group,
        reader_cls=reader_cls,
        reader=reader,
        pad_args={"mode": pad_mode},
    )
    predict_step = make_predict_step(task, tta_flips=tta_flips)

    n_patches = 0
    for batch in sampler.batches(batch_size, channels_last=True):
        n = batch["data"].shape[0]
        data = pad_batch(batch["data"], batch_size)
        data = (
            jax.device_put(data, sharding) if sharding is not None
            else jnp.asarray(data)
        )
        out = predict_step(variables, data)
        out = np.asarray(jax.device_get(out))[:n]
        sampler.add_processed_batch({**batch, "data": out}, channels_last=True)
        n_patches += n
    logger.info("processed %d patches over %d subjects", n_patches,
                len(list(subject_keys)))
    return sampler.get_assembled_data()
