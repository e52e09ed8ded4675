"""Lazy (preload=False) training throughput vs preloaded (VERDICT r4 item 7).

The reference can only train on datasets that fit host RAM (it bulk-loads
every volume up front, dataset.py:114-139).  tpu-mednet's ``preload=False``
mode keeps live h5py window handles instead, reading only each drawn
patch's window per sample — the scaling story for datasets beyond host
RAM.  This bench measures what that costs end-to-end: it writes a real
HDF5 store to disk, then runs the SAME jit'd train step fed by

- ``preload``: volumes bulk-loaded to RAM, native C++ assembly + prefetch
  (the standing pipeline), and
- ``lazy``: preload=False window reads through the numpy path + prefetch

and reports steady-state patches/s for both.  Run on the real chip:

    python benchmarks/lazy_train_bench.py [--subjects 16 --size 192]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def build_store(path, n_subjects, size, seed=0):
    import h5py
    import numpy as np

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for i in range(n_subjects):
            img = rng.normal(0, 0.3, (1, size, size, size)).astype(np.float16)
            lbl = np.zeros((1, size, size, size), np.uint8)
            c = rng.integers(24, size - 24, size=3)
            r = int(rng.integers(10, 20))
            zz, yy, xx = np.ogrid[:size, :size, :size]
            sphere = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                      + (xx - c[2]) ** 2) <= r * r
            lbl[0][sphere] = 1
            img[0][sphere] += 1.0
            f.create_dataset(f"images/s{i}", data=img)
            f.create_dataset(f"labels/s{i}", data=lbl)
    return [f"s{i}" for i in range(n_subjects)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=16)
    ap.add_argument("--size", type=int, default=192,
                    help="subject extent; 16 x 192^3 f16+u8 ~ 340 MB store")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--store", default="/tmp/lazy_bench.h5")
    ap.add_argument("--host_only", action="store_true",
                    help="measure host-side batch production only (no "
                         "device): lazy window reads vs preloaded RAM, "
                         "with a simulated per-step device window — the "
                         "starvation question independent of the axon "
                         "tunnel's transfer floor")
    ap.add_argument("--step_ms", type=float, default=270.0,
                    help="simulated device step time for --host_only "
                         "(270 ms = the measured batch-8 96^3 step)")
    args = ap.parse_args()

    import numpy as np

    store = Path(args.store)
    keys = build_store(store, args.subjects, args.size)
    store_mb = store.stat().st_size / 1e6

    if args.host_only:
        from tpu_mednet.data.native_loader import make_batch_source
        from tpu_mednet.data.patch_sampler import PatchSampler

        def produce(preload: bool):
            sampler = PatchSampler(
                store, keys, samples_per_subject=1000,
                patch_size=(args.patch,) * 3,
                class_probabilities=[0.3, 0.7], preload=preload, seed=1)
            source = make_batch_source(sampler)
            it = source.batches(args.batch)
            next(it)  # warmup (page-in)
            t0 = time.perf_counter()
            n = 0
            for _ in range(args.steps):
                b = next(it)
                n += int(b["data"].shape[0])
                time.sleep(args.step_ms / 1e3)  # the device window
            dt = time.perf_counter() - t0
            sampler.close()
            # production headroom: time NOT spent sleeping is host cost
            host_s = dt - args.steps * args.step_ms / 1e3
            return n / dt, host_s / args.steps * 1e3, type(source).__name__

        pps_pre, host_pre_ms, src_pre = produce(True)
        pps_lazy, host_lazy_ms, src_lazy = produce(False)
        ideal = args.batch / (args.step_ms / 1e3)
        print(json.dumps({
            "metric": "lazy_vs_preload_host_production",
            "store_mb": round(store_mb, 1),
            "step_ms_simulated": args.step_ms,
            "ideal_patches_per_sec": round(ideal, 2),
            "preload": round(pps_pre, 2),
            "lazy": round(pps_lazy, 2),
            "host_ms_per_batch_preload": round(host_pre_ms, 1),
            "host_ms_per_batch_lazy": round(host_lazy_ms, 1),
            "lazy_fraction_of_ideal": round(pps_lazy / ideal, 3),
            "source_preload": src_pre,
            "source_lazy": src_lazy,
            "unit": "patches/s",
        }))
        store.unlink()
        return

    import jax

    from tpu_mednet.data.native_loader import make_batch_source
    from tpu_mednet.data.patch_sampler import PatchSampler
    from tpu_mednet.models import ResidualUNet3D
    from tpu_mednet.ops.augment import AugmentConfig
    from tpu_mednet.parallel.mesh import batch_sharding, make_mesh, replicated
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import create_train_state, make_train_step

    model = ResidualUNet3D(in_channels=1, out_channels=2, f_maps=32,
                           remat=1, packed=True)
    task = SegmentationTask(model=model, loss="DICE")
    step = make_train_step(task, augment=AugmentConfig(mirror_axes=(1, 2, 3)))
    mesh = make_mesh(n_data=1)  # sharded puts = the Trainer/bench path
    state0 = jax.device_put(create_train_state(
        model, (args.batch, args.patch, args.patch, args.patch, 1),
        learning_rate=1e-3, seed=0), replicated(mesh))
    b_shard = batch_sharding(mesh)

    def run(preload: bool):
        sampler = PatchSampler(
            store, keys, samples_per_subject=1000,
            patch_size=(args.patch,) * 3,
            class_probabilities=[0.3, 0.7], preload=preload, seed=1)
        source = make_batch_source(sampler)  # native declines lazy samplers
        state = state0

        # synchronous feed: a producer-thread jax.device_put raced the jit
        # execution over the axon tunnel (repeatable backend
        # InvalidArgument); on this transfer-bound link the prefetch
        # overlap is immaterial to the lazy-vs-preload RATIO anyway
        def batches():
            for b in source.batches(args.batch):
                yield {"data": jax.device_put(b["data"], b_shard),
                       "label": jax.device_put(b["label"], b_shard)}

        it = batches()
        # warmup: compile + first batches
        for _ in range(3):
            state, metrics = step(state, next(it))
        _ = float(metrics["train_loss"])
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.steps):
            state, metrics = step(state, next(it))
            n += args.batch
        _ = float(metrics["train_loss"])  # device sync
        dt = time.perf_counter() - t0
        it.close()
        sampler.close()
        return n / dt, type(source).__name__

    pps_pre, src_pre = run(preload=True)
    pps_lazy, src_lazy = run(preload=False)
    print(json.dumps({
        "metric": "lazy_vs_preload_train_patches_per_sec",
        "store_mb": round(store_mb, 1),
        "subjects": args.subjects,
        "subject_extent": args.size,
        "preload": round(pps_pre, 2),
        "lazy": round(pps_lazy, 2),
        "lazy_fraction": round(pps_lazy / pps_pre, 3),
        "source_preload": src_pre,
        "source_lazy": src_lazy,
        "unit": "patches/s",
    }))
    store.unlink()


if __name__ == "__main__":
    main()
