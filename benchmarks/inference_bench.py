"""Sliding-window inference throughput: 128³ volumes/min on one chip.

BASELINE config-3 geometry (128³ multi-class volumes, 96³ patches,
overlap 16) through the on-device pipelines: ``stitch=device``
(`inference/device_sliding.py`) and ``stitch=gaussian``
(`inference/weighted.py: predict_volumes_weighted_on_device`).
Run:  python benchmarks/inference_bench.py [--volumes 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8,
                    help="patch batch per forward (profiled optimum: 8 — "
                         "matches the predict CLI default; 2 ran the MXU "
                         "at ~1/3 efficiency, see docs/PERFORMANCE.md)")
    ap.add_argument("--tta", nargs="*", type=int, default=None,
                    metavar="AXIS",
                    help="measure with mirror TTA (bare --tta = all three "
                         "axes): 2^k forwards per patch")
    ap.add_argument("--ab", type=int, default=0, metavar="N",
                    help="interleaved A/B: after warming BOTH modes, "
                         "alternate device/gaussian passes N times over the "
                         "same volumes and report every round — separates "
                         "the mode effect from tunnel day-variance")
    args = ap.parse_args()
    from tpu_mednet.inference.common import normalize_tta
    tta_flips = () if args.tta is None else (normalize_tta(args.tta)
                                             or (0, 1, 2))

    import jax

    from tpu_mednet.data.readers import MemoryReader
    from tpu_mednet.inference.device_sliding import predict_volumes_on_device
    from tpu_mednet.inference.weighted import (
        predict_volumes_weighted_on_device,
    )
    from tpu_mednet.models import ResidualUNet3D
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.utils.flops import unet_forward_flops

    rng = np.random.default_rng(0)
    vols = {
        f"s{i}": rng.normal(0, 1, (1, args.size, args.size, args.size)
                            ).astype(np.float16)
        for i in range(args.volumes)
    }
    reader = MemoryReader({"images": vols})
    keys = list(vols)

    model = ResidualUNet3D(in_channels=1, out_channels=3, f_maps=32,
                           packed=True)
    task = SegmentationTask(model=model, loss="DICE")
    x0 = np.zeros((1, args.patch, args.patch, args.patch, 1), np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x0, train=False
    )

    # forward TFLOP per volume for roofline context (one grid tiling)
    from tpu_mednet.inference.device_sliding import _grid_corners
    n_patches, _ = _grid_corners(
        (args.size,) * 3, (args.patch,) * 3, (args.overlap,) * 3
    )
    vol_tflop = n_patches.shape[0] * unet_forward_flops(
        1, 3, model.config.feature_maps, (args.patch,) * 3, block="residual"
    ) / 1e12
    # TTA multiplies the executed forward work by 2^k
    vol_tflop *= 2 ** len(tta_flips)

    modes = [
        ("device", predict_volumes_on_device),
        ("gaussian", predict_volumes_weighted_on_device),
    ]
    common = dict(
        patch_size=(args.patch,) * 3, patch_overlap=(args.overlap,) * 3,
        batch_size=args.batch, reader=reader, tta_flips=tta_flips,
    )

    def timed_pass(fn):
        t0 = time.perf_counter()
        out = fn(task, variables, None, keys, **common)
        # output arrays are host numpy already (device_get inside)
        _ = sum(int(np.asarray(out[k][:]).sum()) % 2 for k in keys)
        return time.perf_counter() - t0

    results = {}
    if args.ab:
        # warm BOTH compilations first, then alternate: every round pair
        # sees the same tunnel conditions
        for _, fn in modes:
            fn(task, variables, None, keys[:1], **common)
        rounds = {name: [] for name, _ in modes}
        for _ in range(args.ab):
            for name, fn in modes:
                dt = timed_pass(fn)
                rounds[name].append(round(args.volumes / dt * 60.0, 1))
        for name, _ in modes:
            results[name] = round(float(np.mean(rounds[name])), 1)
            results[name + "_tflops"] = round(
                results[name] / 60.0 * vol_tflop, 1)
    else:
        rounds = None
        for name, fn in modes:
            fn(task, variables, None, keys[:1], **common)  # compile warmup
            dt = timed_pass(fn)
            results[name] = round(args.volumes / dt * 60.0, 1)
            results[name + "_tflops"] = round(
                args.volumes * vol_tflop / dt, 1
            )
    # tunnel normalization (VERDICT r4 item 6): same-session link rates +
    # the per-phase split, so a cross-round swing (e.g. round 3's 247 vs
    # round 4's 165 vol/min) is attributable from the artifact alone
    try:
        from tpu_mednet.utils.tunnel import probe_tunnel

        tunnel = probe_tunnel()
    except Exception as e:  # pragma: no cover
        tunnel = {"error": str(e)[:120]}
    phases = {}
    if not tta_flips:  # measure_phases drives the non-TTA predictors
        try:
            import sys
            from pathlib import Path

            sys.path.insert(0, str(Path(__file__).parent))
            from inference_profile import measure_phases

            for name, _ in modes:
                phases[name] = measure_phases(
                    task, variables, model, args.size, args.patch,
                    args.overlap, args.batch, mode=name, volumes=2,
                )
        except Exception as e:  # pragma: no cover
            phases = {"error": str(e)[:120]}

    record = {
        "metric": "volumes_per_min_128cubed",
        "stitch_device": results["device"],
        "stitch_gaussian": results["gaussian"],
        "implied_fwd_tflops_device": results["device_tflops"],
        "implied_fwd_tflops_gaussian": results["gaussian_tflops"],
        "batch": args.batch,
        "tta": list(tta_flips) or False,
        "unit": "volumes/min",
        "tunnel": tunnel,
        "phases": phases,
    }
    if rounds is not None:
        record["ab_rounds"] = rounds
    print(json.dumps(record))


if __name__ == "__main__":
    main()
