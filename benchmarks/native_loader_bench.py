"""Host batch-assembly throughput: numpy PatchSampler vs native pipeline.

Measures the pure host-side cost of producing channels-last training
batches (the work torch delegates to its C++ DataLoader workers,
`/root/reference/midasmednet/segmentation.py:122-131`) — no jax, no
device. Run:  python benchmarks/native_loader_bench.py
"""

from __future__ import annotations

import json
import time

import numpy as np

from tpu_mednet.data.native_loader import NativeBatchPipeline
from tpu_mednet.data.patch_sampler import PatchSampler
from tpu_mednet.data.readers import MemoryReader


def build(n_subjects=4, size=128, samples=32, patch=(96, 96, 96), seed=0):
    rng = np.random.default_rng(seed)
    images = {f"s{i}": rng.normal(0, 1, (1, size, size, size)).astype(np.float16)
              for i in range(n_subjects)}
    labels = {k: rng.integers(0, 3, (1, size, size, size)).astype(np.uint8)
              for k in images}
    reader = MemoryReader({"images": images, "labels": labels})
    return PatchSampler(
        data_path=None, subject_keys=list(images),
        samples_per_subject=samples, patch_size=patch,
        reader=reader, class_probabilities=[0.2, 0.4, 0.4], seed=seed,
    )


def time_epoch(source, batch_size=8, consume_ms=0.0):
    """Wall time for one epoch; optional per-batch consumer stall that
    models the TPU dispatch window the prefetch thread can hide behind."""
    t0 = time.perf_counter()
    n = 0
    for b in source.batches(batch_size):
        # touch the data so lazily-materialized paths can't cheat
        n += int(b["data"].shape[0]) + int(b["label"][0, 0, 0, 0, 0] >= 0)
        if consume_ms:
            time.sleep(consume_ms / 1e3)
    return time.perf_counter() - t0, n


def main():
    results = {}
    for consume_ms, tag in [(0.0, "assembly_only"), (120.0, "with_120ms_step")]:
        rows = {}
        for name, make in [
            ("numpy", lambda: build()),
            ("native", lambda: NativeBatchPipeline(build(), prefetch=False)),
            ("native+prefetch", lambda: NativeBatchPipeline(build(), prefetch=True)),
        ]:
            src = make()
            time_epoch(src, consume_ms=consume_ms)  # warmup (page-in, build)
            secs = min(time_epoch(src, consume_ms=consume_ms)[0] for _ in range(3))
            rows[name] = round(secs, 3)
        results[tag] = rows
        print(tag, json.dumps(rows))
    speed = results["assembly_only"]
    print(json.dumps({
        "metric": "native_assembly_speedup",
        "value": round(speed["numpy"] / speed["native"], 2),
        "unit": "x vs numpy (96^3 batch-8 epoch)",
    }))


if __name__ == "__main__":
    main()
