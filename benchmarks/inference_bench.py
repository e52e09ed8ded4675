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
    args = ap.parse_args()

    import jax

    from tpu_mednet.data.readers import MemoryReader
    from tpu_mednet.inference.device_sliding import predict_volumes_on_device
    from tpu_mednet.inference.weighted import (
        predict_volumes_weighted_on_device,
    )
    from tpu_mednet.models import ResidualUNet3D
    from tpu_mednet.tasks import SegmentationTask

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

    results = {}
    for name, fn in [
        ("device", predict_volumes_on_device),
        ("gaussian", predict_volumes_weighted_on_device),
    ]:
        common = dict(
            patch_size=(args.patch,) * 3, patch_overlap=(args.overlap,) * 3,
            batch_size=2, reader=reader,
        )
        fn(task, variables, None, keys[:1], **common)  # compile warmup
        t0 = time.perf_counter()
        out = fn(task, variables, None, keys, **common)
        # output arrays are host numpy already (device_get inside)
        _ = sum(int(np.asarray(out[k][:]).sum()) % 2 for k in keys)
        dt = time.perf_counter() - t0
        results[name] = round(args.volumes / dt * 60.0, 1)
    print(json.dumps({
        "metric": "volumes_per_min_128cubed",
        "stitch_device": results["device"],
        "stitch_gaussian": results["gaussian"],
        "unit": "volumes/min",
    }))


if __name__ == "__main__":
    main()
