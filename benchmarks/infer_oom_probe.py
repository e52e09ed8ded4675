"""Locate the real HBM OOM boundary of the on-device stitch paths.

VERDICT r4 item 5: the train half of ``utils/memory.py`` is calibrated
against two measured OOM points, but the inference half
(``INFER_WORK_UNITS``, the stitch terms) was constructed, not measured.
This probe AOT-compiles the actual stitch executables at growing volume
sizes — ``jit(...).lower(shapes).compile()`` with ``ShapeDtypeStruct``
inputs, so NO volume data crosses the (slow) tunnel — and reports, per
size, whether the compile fit or OOM'd and what the compiler said the
peak allocation was.  HBM OOMs surface at AOT compile in ~90s with a full
allocation dump (CLAUDE.md), which makes this bisection cheap and safe.

Run: python benchmarks/infer_oom_probe.py --mode gaussian --sizes 640 768 832 896
Compare each row's estimate (device_stitch_bytes) against the outcome and
fit the constants; pin results in tests/test_memory.py.
"""

from __future__ import annotations

import argparse
import json
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["device", "gaussian"], default="gaussian")
    ap.add_argument("--sizes", type=int, nargs="+", default=[640, 768, 832])
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out_channels", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_mednet.inference.device_sliding import (
        _grid_corners,
        make_device_predictor,
    )
    from tpu_mednet.inference.weighted import make_weighted_device_predictor
    from tpu_mednet.models import ResidualUNet3D, create_feature_maps
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.utils.memory import GiB, device_stitch_bytes, tree_bytes

    model = ResidualUNet3D(in_channels=1, out_channels=args.out_channels,
                           f_maps=32, packed=True)
    task = SegmentationTask(model=model, loss="DICE")
    x0 = np.zeros((1, args.patch, args.patch, args.patch, 1), np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x0, train=False)
    var_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    params_b = tree_bytes(variables)
    fmaps = create_feature_maps(model.config.f_maps, model.config.num_levels)

    if args.mode == "device":
        predictor = make_device_predictor(
            task, (args.patch,) * 3, (args.overlap,) * 3, args.batch)
    else:
        predictor = make_weighted_device_predictor(task, (args.patch,) * 3)

    for size in args.sizes:
        img_size = np.asarray((size,) * 3, dtype=np.int64)
        corners, padded = _grid_corners(img_size, (args.patch,) * 3,
                                        (args.overlap,) * 3)
        n_p = corners.shape[0]
        n_batches = -(-n_p // args.batch)
        pads = tuple(
            (int(args.overlap), int(p - s - args.overlap))
            for p, s in zip(padded, img_size))
        vol_s = jax.ShapeDtypeStruct((size, size, size, 1), jnp.float16)
        cor_s = jax.ShapeDtypeStruct((n_batches, args.batch, 3), jnp.int32)
        mask_s = jax.ShapeDtypeStruct((n_batches, args.batch), jnp.float32)

        # result width = the executable's uint8 output (num_heatmaps+1 = 1
        # for a seg task: argmax class map); the gaussian fp32 accumulator
        # is the MODEL's out_channels wide
        out_c = getattr(task, "num_heatmaps", 0) + 1
        est, breakdown = device_stitch_bytes(
            (size,) * 3, (args.patch,) * 3, (args.overlap,) * 3, args.batch,
            1, out_c, fmaps, stitch=args.mode,
            params_bytes=params_b,
            acc_channels=args.out_channels if args.mode == "gaussian" else None,
        )
        row = {"size": size, "estimate_gb": round(est / GiB, 2),
               "patches": int(n_p)}
        try:
            if args.mode == "device":
                lowered = predictor.lower(var_shapes, vol_s, cor_s, pads)
            else:
                lowered = predictor.lower(var_shapes, vol_s, cor_s, mask_s,
                                          pads)
            lowered.compile()
            row["outcome"] = "fit"
        except Exception as e:
            msg = str(e)
            row["outcome"] = "oom" if ("memory" in msg.lower()
                                       or "RESOURCE_EXHAUSTED" in msg) \
                else "error"
            m = re.search(r"([\d.]+)G of [\d.]+G", msg)
            if m:
                row["measured_peak_gb"] = float(m.group(1))
            m = re.search(r"allocate ([\d.]+[GMK])", msg)
            if m:
                row["alloc_request"] = m.group(1)
            row["detail"] = msg[:500]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
