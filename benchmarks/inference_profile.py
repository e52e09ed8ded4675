"""Phase-level profile of the on-device sliding-window inference path.

Round-3 follow-up to the VERDICT finding that inference sustains ~8.5
TFLOP/s while the train step sustains ~44.7 against the same 152 TF/s
envelope.  Separates, per 128³ volume (BASELINE config-3 geometry):

- ``upload``   host -> device volume transfer (f16/bf16, 4.2 MB over the
               axon tunnel)
- ``compute``  the one-jit tile -> forward -> stitch executable
- ``download`` device -> host of the stitched uint8 volume

and measures the pure batched forward in isolation to locate the gap.
Timings force host transfers (``float(jnp.sum(...))``) because
``block_until_ready`` does not sync over the axon tunnel.

Run: python benchmarks/inference_profile.py [--batches 2 4 8] [--mode device]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def measure_phases(task, variables, model, size, patch, overlap, batch,
                   mode="device", volumes=2, seed=0):
    """Per-volume upload / compute / download split of one stitch mode.

    Shared by this profiler and ``inference_bench.py`` (which embeds the
    split in its JSON record so cross-round swings are attributable to a
    specific phase — VERDICT r4 item 6).  Returns a dict of mean ms per
    phase plus the sequential volumes/min implied by the split.
    """
    import jax
    import jax.numpy as jnp

    from tpu_mednet.inference.device_sliding import (
        _cached_predictor,
        _grid_corners,
    )
    from tpu_mednet.inference.weighted import make_weighted_device_predictor

    rng = np.random.default_rng(seed)
    size3 = (size,) * 3
    img_size = np.asarray(size3, dtype=np.int64)
    ov = (overlap,) * 3
    corners_np, padded = _grid_corners(img_size, (patch,) * 3, ov)
    n_p = corners_np.shape[0]
    pads = tuple(
        (int(o), int(p - s - o)) for o, p, s in zip(ov, padded, img_size)
    )
    n_batches = -(-n_p // batch)
    pad_n = n_batches * batch - n_p
    corners = corners_np
    mask = np.ones((n_p,), np.float32)
    if pad_n:
        corners = np.concatenate([corners, np.repeat(corners[-1:], pad_n, 0)])
        mask = np.concatenate([mask, np.zeros((pad_n,), np.float32)])
    corners_b = jnp.asarray(corners.reshape(n_batches, batch, 3))
    mask_b = jnp.asarray(mask.reshape(n_batches, batch))

    if mode == "device":
        predictor = _cached_predictor(task, (patch,) * 3, ov, batch,
                                      "constant")
        call = lambda vd: predictor(variables, vd, corners_b, pads)
    else:
        wp = make_weighted_device_predictor(task, (patch,) * 3)
        call = lambda vd: wp(variables, vd, corners_b, mask_b, pads)

    vols = [
        np.moveaxis(rng.normal(0, 1, (1, *size3)).astype(np.float16), 0, -1)
        for _ in range(volumes)
    ]
    vd = jnp.asarray(vols[0], dtype=model.config.dtype)
    sync(call(vd))  # compile warmup

    ups, comps, downs = [], [], []
    for vol in vols:
        t0 = time.perf_counter()
        vd = jnp.asarray(vol, dtype=model.config.dtype)
        sync(vd)
        t1 = time.perf_counter()
        out = call(vd)
        sync(out)
        t2 = time.perf_counter()
        _ = np.asarray(jax.device_get(out))
        t3 = time.perf_counter()
        ups.append(t1 - t0)
        comps.append(t2 - t1)
        downs.append(t3 - t2)
    tot = float(np.sum(ups) + np.sum(comps) + np.sum(downs))
    return {
        "upload_ms": round(float(np.mean(ups)) * 1e3, 1),
        "compute_ms": round(float(np.mean(comps)) * 1e3, 1),
        "download_ms": round(float(np.mean(downs)) * 1e3, 1),
        "volumes_per_min_sequential": round(volumes / tot * 60.0, 1),
        "patches_per_volume": int(n_p),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--mode", choices=["device", "gaussian", "both"],
                    default="both")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_mednet.inference.device_sliding import _grid_corners
    from tpu_mednet.models import ResidualUNet3D
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.utils.flops import unet_forward_flops

    rng = np.random.default_rng(0)
    model = ResidualUNet3D(in_channels=1, out_channels=3, f_maps=32,
                           packed=True)
    task = SegmentationTask(model=model, loss="DICE")
    x0 = np.zeros((1, args.patch, args.patch, args.patch, 1), np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x0, train=False
    )

    fwd_flop = unet_forward_flops(
        1, 3, model.config.feature_maps, (args.patch,) * 3, block="residual"
    )

    corners_np, _ = _grid_corners(
        np.asarray((args.size,) * 3, dtype=np.int64), (args.patch,) * 3,
        (args.overlap,) * 3)
    n_p = corners_np.shape[0]
    report = {
        "patches_per_volume": int(n_p),
        "fwd_tflop_per_volume": round(n_p * fwd_flop / 1e12, 3),
        "modes": {},
    }

    # RTT of a no-op sync over the tunnel (scalar pull)
    tiny = jnp.zeros((), jnp.float32)
    sync(tiny)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(tiny)
    report["sync_rtt_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 1)

    # --- pure forward in isolation (device-resident batch) ----------------
    fwd = jax.jit(
        lambda v, x: model.apply(v, x, train=False),
        static_argnames=(),
    )
    report["forward_only"] = {}
    for b in args.batches:
        xb = jnp.asarray(
            rng.normal(0, 1, (b, args.patch, args.patch, args.patch, 1)),
            dtype=model.config.dtype,
        )
        sync(fwd(variables, xb))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            sync(fwd(variables, xb))
        dt = (time.perf_counter() - t0) / reps
        report["forward_only"][str(b)] = {
            "ms": round(dt * 1e3, 1),
            "tflops": round(b * fwd_flop / dt / 1e12, 1),
        }

    # --- full pipelines, phase-split --------------------------------------
    modes = ["device", "gaussian"] if args.mode == "both" else [args.mode]
    for mode in modes:
        report["modes"][mode] = {}
        for b in args.batches:
            phases = measure_phases(
                task, variables, model, args.size, args.patch, args.overlap,
                b, mode=mode, volumes=args.volumes,
            )
            comp = phases["compute_ms"] / 1e3
            phases["compute_tflops"] = round(n_p * fwd_flop / comp / 1e12, 1)
            report["modes"][mode][str(b)] = phases

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
