"""Fully on-device sliding-window inference: tile -> forward -> stitch in ONE jit.

The host-driven pipeline (`sliding_window.py`) moves every patch across the
host<->device boundary twice and stitches on (this host's single) CPU —
measured at ~1 patch/s end-to-end while the chip can run ~20+.  This module
is the north-star alternative (BASELINE.json: "overlap-tiled ... TPU kernel
with on-device stitching"): the volume is device-put once, a jit'd scan
gathers patch batches with ``dynamic_slice``, runs the model, crops each
patch's core and writes it back with ``dynamic_update_slice`` — the cores
tile the padded volume disjointly (reference grid geometry,
dataset.py:369-380), so the scatter is race-free.  One host round-trip per
volume.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mednet.data.readers import DataReader, open_reader
from tpu_mednet.data.stores import VolumeGroup
from tpu_mednet.inference.common import (
    per_task_cache,
    round_robin_placement,
    run_pipelined,
)


def _grid_corners(img_size, patch_size, overlap):
    """Static tile corners in the padded volume (reference stride geometry)."""
    img_size = np.asarray(img_size, dtype=np.int64)
    patch_size = np.asarray(patch_size, dtype=np.int64)
    overlap = np.asarray(overlap, dtype=np.int64)
    stride = patch_size - 2 * overlap
    if np.any(stride <= 0):
        raise ValueError("patch_overlap too large for patch_size")
    n = np.ceil(img_size / stride).astype(np.int64)
    corners = np.stack(np.meshgrid(
        *[np.arange(nk) * sk for nk, sk in zip(n, stride)], indexing="ij"
    ), axis=-1).reshape(-1, 3)
    overhead = (-img_size) % stride
    padded = img_size + 2 * overlap + overhead
    return corners.astype(np.int32), padded


def make_device_predictor(task, patch_size: Sequence[int],
                          patch_overlap: Sequence[int], batch_size: int,
                          pad_mode: str = "constant", tta_flips=()):
    """Build the jit'd (variables, volume, corners) -> stitched result fn.

    ``volume`` is the UNPADDED (X, Y, Z, C) channels-last volume — padding
    happens on device so only the raw voxels cross the (slow) host link;
    ``corners`` is (n_batches, batch_size, 3) int32 tile corners in the
    padded domain (pad the tail batch by repeating a corner — later writes
    of identical content are harmless).  Returns the stitched
    (X, Y, Z, outC) uint8 volume already cropped to the input extent.
    """
    model = task.model
    px, py, pz = (int(v) for v in patch_size)
    ov = tuple(int(v) for v in patch_overlap)
    tta_flips = tuple(tta_flips)

    @partial(jax.jit, static_argnames=("pads",))
    def run(variables, volume, corners, pads):
        img_shape = volume.shape[:3]
        volume = jnp.pad(volume, tuple(pads) + ((0, 0),), mode=pad_mode)
        c_in = volume.shape[-1]
        out_c = getattr(task, "num_heatmaps", 0) + 1

        def gather(corner):
            return jax.lax.dynamic_slice(
                volume, (corner[0], corner[1], corner[2], 0), (px, py, pz, c_in)
            )

        def step(out_vol, corner_batch):
            patches = jax.vmap(gather)(corner_batch)
            if tta_flips:
                from tpu_mednet.inference.common import (
                    postprocess_activations,
                    tta_split_activations,
                )
                act = tta_split_activations(task, variables, patches, tta_flips)
                processed = postprocess_activations(task, act)
            else:
                logits = model.apply(
                    variables, patches.astype(model.config.dtype), train=False
                )
                processed = task.predict_postprocess(logits)  # (B,...,outC) uint8
            core = processed[
                :, ov[0]:px - ov[0], ov[1]:py - ov[1], ov[2]:pz - ov[2], :
            ]

            def write(i, acc):
                corner = corner_batch[i]
                return jax.lax.dynamic_update_slice(
                    acc, core[i],
                    (corner[0] + ov[0], corner[1] + ov[1], corner[2] + ov[2], 0),
                )

            out_vol = jax.lax.fori_loop(0, core.shape[0], write, out_vol)
            return out_vol, None

        out0 = jnp.zeros((*volume.shape[:3], out_c), jnp.uint8)
        out, _ = jax.lax.scan(step, out0, corners)
        # crop back to the original extent on device (smaller download)
        return out[
            ov[0]:ov[0] + img_shape[0],
            ov[1]:ov[1] + img_shape[1],
            ov[2]:ov[2] + img_shape[2],
        ]

    return run


_PREDICTOR_CACHE: Dict[int, Dict] = {}


def _cached_predictor(task, patch_size, patch_overlap, batch_size, pad_mode,
                      tta_flips=()):
    return per_task_cache(
        _PREDICTOR_CACHE, task,
        (patch_size, patch_overlap, batch_size, pad_mode, tuple(tta_flips)),
        lambda: make_device_predictor(
            task, patch_size, patch_overlap, batch_size, pad_mode=pad_mode,
            tta_flips=tta_flips,
        ),
    )


def predict_volumes_on_device(
    task,
    variables,
    data_path,
    subject_keys: Sequence[str],
    patch_size: Sequence[int],
    patch_overlap: Sequence[int],
    batch_size: int = 8,
    image_group: str = "images",
    reader_cls=None,
    reader: Optional[DataReader] = None,
    pad_mode: str = "constant",
    out_dtype=np.uint8,
    devices=None,
    tta_flips=(),
    hbm_guard: str = "error",
    hbm_budget: Optional[int] = None,
) -> VolumeGroup:
    """Drop-in alternative to ``predict_volumes`` with on-device stitching.

    Volumes with the same shape share one compiled executable (corner
    arrays are data, not shape, as long as the tile count matches).

    With ``devices`` (a list of ``jax.Device``), volumes are dealt
    round-robin across the devices — data-parallel inference, one volume in
    flight per chip (the TPU answer to the reference's ``gpus=N`` inference
    placement, `/root/reference/examples/predict.py:75-82`).  Outputs are
    bit-identical to the single-device path (each volume runs whole on one
    chip; only the placement changes).
    """
    owns = reader is None
    r = reader if reader is not None else open_reader(data_path, reader_cls)
    shapes = r.get_data_shape(subject_keys, image_group)
    affines = r.get_data_attribute(subject_keys, image_group, "affine")
    out_c = getattr(task, "num_heatmaps", 0) + 1

    # HBM guard: an oversized volume on this path used to surface as an
    # opaque remote-compile OOM; estimate the footprint up front and fail
    # with the numbers ('error') or spill the volume to host stitching
    # ('warn') — see utils/memory.py
    from tpu_mednet.models.unet import create_feature_maps
    from tpu_mednet.utils.memory import check_stitch_budget, tree_bytes

    cfg = task.model.config
    fmaps = (tuple(cfg.f_maps) if isinstance(cfg.f_maps, (list, tuple))
             else create_feature_maps(cfg.f_maps, cfg.num_levels))
    params_b = tree_bytes(variables)
    n_tta = 2 ** len(tta_flips) if tta_flips else 1
    fit_keys, spill_keys = [], []
    try:
        for key in subject_keys:
            ok = check_stitch_budget(
                key, shapes[key][1:], patch_size, patch_overlap, batch_size,
                cfg.in_channels, out_c, fmaps, stitch="device",
                params_bytes=params_b, n_tta=n_tta, budget_bytes=hbm_budget,
                guard=hbm_guard,
            )
            (fit_keys if ok else spill_keys).append(key)

        # f16 preload matches the reference/host pipeline (dataset.py:441)
        volumes = list(r.read(fit_keys, image_group, dtype=np.float16))
    except BaseException:
        if owns:
            r.close()
        raise
    if owns and not spill_keys:
        r.close()

    predictor = _cached_predictor(task, tuple(patch_size), tuple(patch_overlap),
                                  batch_size, pad_mode, tta_flips=tta_flips)
    ov = np.asarray(patch_overlap, dtype=np.int64)
    results = VolumeGroup()
    devs, vars_per_dev, depth = round_robin_placement(variables, devices)

    def dispatch(idx, key, vol):
        img_size = np.asarray(vol.shape[1:], dtype=np.int64)
        corners, padded = _grid_corners(img_size, patch_size, patch_overlap)
        n_p = corners.shape[0]
        n_batches = -(-n_p // batch_size)
        pad_n = n_batches * batch_size - n_p
        if pad_n:
            corners = np.concatenate([corners, np.repeat(corners[-1:], pad_n, 0)])
        corners = corners.reshape(n_batches, batch_size, 3)
        pads = tuple(
            (int(o), int(p - s - o)) for o, p, s in zip(ov, padded, img_size)
        )

        # half-width upload: only the raw voxels cross the host link, in
        # the reader's own f16 — the compute-dtype cast happens per patch
        # ON DEVICE (inside the jit), so the host never converts
        vol_cl = np.ascontiguousarray(np.moveaxis(np.asarray(vol), 0, -1))
        if devs is not None:
            d = devs[idx % len(devs)]
            return key, img_size, predictor(
                vars_per_dev[idx % len(devs)],
                jax.device_put(vol_cl, d), jax.device_put(corners, d), pads,
            )
        return key, img_size, predictor(
            variables, jnp.asarray(vol_cl), jnp.asarray(corners), pads
        )

    def finalize(key, img_size, out):
        core = np.asarray(jax.device_get(out))
        vol_cf = np.moveaxis(core, -1, 0).astype(out_dtype)
        ds = results.require_dataset(key, (out_c, *img_size), out_dtype)
        ds[:] = vol_cf
        ds.attrs["affine"] = np.asarray(affines[key]).tolist()

    run_pipelined(
        zip(range(len(volumes)), fit_keys, volumes), dispatch, finalize,
        depth=depth,
    )
    if spill_keys:
        from tpu_mednet.inference.sliding_window import predict_volumes

        host = predict_volumes(
            task, variables, data_path, spill_keys,
            patch_size=patch_size, patch_overlap=patch_overlap,
            batch_size=batch_size, out_channels=out_c,
            image_group=image_group, reader=r,
            pad_mode=pad_mode, out_dtype=out_dtype, tta_flips=tta_flips,
        )
        if owns:
            r.close()
        for key, ds in host.items():
            dst = results.require_dataset(key, ds.array.shape, out_dtype)
            dst[:] = ds.array
            dst.attrs.update(ds.attrs)
    return results
