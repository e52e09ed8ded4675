"""Headline benchmark: 3D training patches/sec/chip on the flagship model.

Measures the full jit'd training step (on-device augmentation + forward +
backward + Adam update, bf16 compute) of the flagship ResidualUNet3D
(5 levels, f_maps=32 — the model both reference tasks train) on 96^3
patches, on one real TPU chip.  Runs in z-packed compute mode (identical
logical math, lanes kept full — docs/PERFORMANCE.md) with selective
rematerialization (remat=1: only the level-0 stage — the GN-stats-saving
policy made deeper-stage recompute a net loss) at batch 32 (sweep: 32 > 24 > 28 — batch 28 hits a
tiling/padding anomaly; docs/PERFORMANCE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` compares against the measured PyTorch reference-equivalent
baseline in benchmarks/baseline.json (see benchmarks/torch_baseline.py —
the reference itself publishes no numbers, BASELINE.md).

Timing forces a device->host sync each window (block_until_ready does not
reliably synchronize over the axon tunnel — see .claude/skills/verify).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np


def wait_for_backend(retries: int = 6, probe_timeout: int = 120,
                     sleep: int = 90) -> bool:
    """Wait out transient tunnel outages before touching the backend.

    The axon tunnel has two observed failure modes (CLAUDE.md): backend
    init fails UNAVAILABLE, or a bare ``jax.devices()`` hangs.  Both are
    transient infra; probing in a SUBPROCESS with a timeout covers both
    without wedging this process.  Diagnostics go to stderr — stdout must
    stay one JSON line for the driver.
    """
    for attempt in range(retries):
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            if p.returncode == 0:
                return True
            msg = (p.stderr or b"").decode(errors="replace").strip()[-200:]
        except subprocess.TimeoutExpired:
            msg = f"probe hung > {probe_timeout}s"
        print(f"bench: backend probe {attempt + 1}/{retries} failed "
              f"({msg}); retrying in {sleep}s", file=sys.stderr, flush=True)
        if attempt + 1 < retries:
            time.sleep(sleep)
    print("bench: backend never came up; attempting the run anyway",
          file=sys.stderr, flush=True)
    return False


def main():
    import argparse

    # no-arg invocation is the driver's headline metric and must stay
    # byte-compatible; the knobs exist for documented variant rows
    # (docs/PERFORMANCE.md), e.g. --in_channels 4 = the BASELINE config 4
    # multi-modality first-conv shape
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_channels", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    wait_for_backend()
    import jax
    import jax.numpy as jnp

    from tpu_mednet.models import ResidualUNet3D
    from tpu_mednet.ops.augment import AugmentConfig
    from tpu_mednet.parallel.mesh import batch_sharding, make_mesh, replicated
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import create_train_state, make_train_step

    PATCH = 96
    BATCH = args.batch
    C_IN = args.in_channels
    ITERS = 20
    WARMUP = 3

    model = ResidualUNet3D(in_channels=C_IN, out_channels=2, f_maps=32, remat=1, packed=True)
    task = SegmentationTask(model=model, loss="DICE")
    mesh = make_mesh(n_data=min(len(jax.devices()), 8))
    n_dev = mesh.shape["data"]

    state = create_train_state(
        model, (BATCH, PATCH, PATCH, PATCH, C_IN), learning_rate=1e-3, seed=0
    )
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(task, augment=AugmentConfig(mirror_axes=(1, 2, 3)))

    rng = np.random.default_rng(0)
    batch = {
        "data": jax.device_put(
            rng.normal(size=(BATCH, PATCH, PATCH, PATCH, C_IN)).astype(np.float32),
            batch_sharding(mesh),
        ),
        "label": jax.device_put(
            rng.integers(0, 2, size=(BATCH, PATCH, PATCH, PATCH, 1)).astype(np.uint8),
            batch_sharding(mesh),
        ),
    }

    # logical train-step FLOPs for MFU.  NOT XLA's cost model: that counts
    # the packed convs' structural zeros (4x inflation at zb=4); the
    # analytic model counts what the math requires (utils/flops.py).
    from tpu_mednet.utils.flops import unet_train_step_flops

    step_flops = unet_train_step_flops(
        in_channels=C_IN, out_channels=2,
        feature_maps=model.config.feature_maps,
        patch=(PATCH, PATCH, PATCH), batch=BATCH, block="residual",
    )

    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    _ = float(metrics["train_loss"])  # full sync

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    _ = float(metrics["train_loss"])  # sync end of window
    dt = (time.perf_counter() - t0) / ITERS
    pps_per_chip = BATCH / dt / n_dev

    baseline_path = Path(__file__).parent / "benchmarks" / "baseline.json"
    vs_baseline = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        # normalize: baseline measured at same patch size, per-"chip" (CPU host)
        vs_baseline = pps_per_chip / base["train_patches_per_sec"]

    # model FLOP utilization vs the mesh's nominal bf16 peak (per-chip
    # peak x n_dev: step_flops/dt is aggregate mesh throughput)
    V5E_BF16_PEAK = 197e12
    mfu = (
        round(step_flops / dt / (V5E_BF16_PEAK * n_dev), 4)
        if step_flops else None
    )

    # same-session tunnel context: lets a future throughput swing be
    # attributed to link day-variance vs a code regression from the
    # artifact alone (the train bench itself is device-resident, but the
    # record travels next to the transfer-bound inference numbers)
    try:
        from tpu_mednet.utils.tunnel import probe_tunnel

        tunnel = probe_tunnel()
    except Exception as e:  # pragma: no cover - probe must never kill bench
        tunnel = {"error": str(e)[:120]}

    metric = "train_patches_per_sec_per_chip_96cubed"
    if C_IN != 1:
        metric += f"_in{C_IN}"
    if BATCH != 32:
        # keep variant rows distinguishable from the standing batch-32
        # config in BENCH logs (vs_baseline stays batch-32-calibrated)
        metric += f"_b{BATCH}"
    print(json.dumps({
        "metric": metric,
        "value": round(pps_per_chip, 3),
        "unit": "patches/s/chip",
        "batch": BATCH,
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "mfu": mfu,
        "tunnel": tunnel,
    }))


if __name__ == "__main__":
    main()
