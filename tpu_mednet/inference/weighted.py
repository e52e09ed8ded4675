"""Gaussian-weighted sliding-window stitching.

The reference stitches by cropping each patch's overlap border and writing
disjoint cores (last-write-wins at edges, dataset.py:444-474).  This module
implements the higher-quality alternative named in the north-star
(BASELINE.json): every voxel of every overlapping patch contributes,
weighted by a separable Gaussian centered on the patch — predictions near
patch borders (where the receptive field is clipped) are down-weighted, and
overlaps average smoothly instead of seaming.

The weighting of each patch happens ON DEVICE inside the jit'd predict step
(one fused multiply); the float accumulation runs on host into the
assembled volumes.
"""

from __future__ import annotations

import logging
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mednet.data.grid import GridPatchSampler
from tpu_mednet.data.readers import HDF5Reader
from tpu_mednet.data.stores import VolumeGroup
from tpu_mednet.inference.sliding_window import pad_batch

logger = logging.getLogger(__name__)


def gaussian_window(patch_size: Sequence[int], sigma_scale: float = 0.125,
                    floor: float = 1e-3) -> np.ndarray:
    """Separable Gaussian importance window over a patch, peak 1 at center."""
    axes = []
    for n in patch_size:
        x = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
        sigma = max(n * sigma_scale, 1e-6)
        axes.append(np.exp(-(x**2) / (2 * sigma**2)))
    w = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    return np.maximum(w, floor).astype(np.float32)


def predict_volumes_weighted(
    task,
    variables,
    data_path,
    subject_keys: Sequence[str],
    patch_size: Sequence[int],
    patch_overlap: Sequence[int],
    batch_size: int = 8,
    image_group: str = "images",
    reader_cls=HDF5Reader,
    reader=None,
    pad_mode: str = "constant",
    sigma_scale: float = 0.125,
    out_dtype=np.uint8,
) -> VolumeGroup:
    """Sliding-window inference with Gaussian-weighted overlap averaging.

    Uses the same tiling geometry as the reference pipeline but accumulates
    ``w * activations`` over FULL patches instead of cropping; the final
    class map is the argmax of the weighted average (heatmap channels are
    averaged then clipped to the 0..255 uint8 convention).
    """
    model = task.model
    num_heatmaps = getattr(task, "num_heatmaps", 0)
    out_channels = num_heatmaps + 1

    sampler = GridPatchSampler(
        data_path, subject_keys, patch_size, patch_overlap,
        out_channels=out_channels, out_dtype=out_dtype,
        image_group=image_group, reader_cls=reader_cls, reader=reader,
        pad_args={"mode": pad_mode},
    )
    window = gaussian_window(patch_size, sigma_scale)
    window_dev = jnp.asarray(window)[None, ..., None]

    @jax.jit
    def weighted_step(variables, data):
        logits = model.apply(variables, data.astype(model.config.dtype),
                             train=False)
        if num_heatmaps:
            hm = logits[..., :num_heatmaps]
            probs = jax.nn.softmax(logits[..., num_heatmaps:], axis=-1)
            act = jnp.concatenate([hm, probs], axis=-1)
        else:
            act = jax.nn.softmax(logits, axis=-1)
        return act * window_dev

    # accumulators: weighted activation sums + weight sums, padded domain
    acc: Dict[str, np.ndarray] = {}
    wacc: Dict[str, np.ndarray] = {}
    n_act = None

    ps = np.asarray(patch_size, dtype=np.int64)
    for batch in sampler.batches(batch_size, channels_last=True):
        n = batch["data"].shape[0]
        data = pad_batch(batch["data"], batch_size)
        out = np.asarray(jax.device_get(
            weighted_step(variables, jnp.asarray(data))
        ))[:n]
        n_act = out.shape[-1]
        for i, key in enumerate(batch["subject_key"]):
            if key not in acc:
                img_size = np.asarray(sampler.data_shape[key][1:], dtype=np.int64)
                stride = ps - 2 * np.asarray(patch_overlap, dtype=np.int64)
                padded = (
                    img_size + 2 * np.asarray(patch_overlap, dtype=np.int64)
                    + (-img_size) % stride
                )
                acc[key] = np.zeros((*padded, n_act), dtype=np.float32)
                wacc[key] = np.zeros(tuple(padded), dtype=np.float32)
            pos = np.asarray(batch["pos"][i], dtype=np.int64)
            sl = tuple(slice(p, p + s) for p, s in zip(pos, ps))
            acc[key][sl] += out[i]
            wacc[key][sl] += window

    for key in acc:
        ov = np.asarray(patch_overlap, dtype=np.int64)
        img_size = np.asarray(sampler.data_shape[key][1:], dtype=np.int64)
        core = tuple(slice(o, o + s) for o, s in zip(ov, img_size))
        avg = acc[key][core] / np.maximum(wacc[key][core][..., None], 1e-8)
        if num_heatmaps:
            hm = np.clip(avg[..., :num_heatmaps], 0.0, 255.0)
            cls = np.argmax(avg[..., num_heatmaps:], axis=-1)
            vol = np.concatenate([hm, cls[..., None]], axis=-1)
        else:
            vol = np.argmax(avg, axis=-1)[..., None]
        vol_cf = np.moveaxis(vol, -1, 0).astype(out_dtype)
        ds = sampler.results.require_dataset(key, vol_cf.shape, out_dtype)
        ds[:] = vol_cf
        ds.attrs["affine"] = np.asarray(sampler.data_affine[key]).tolist()
    return sampler.results
