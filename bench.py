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
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 32 (residual) / 8 (unet3d; 16 OOM'd at "
                         "a measured 23.26G — the concat join's full-res "
                         "temps, see utils/memory.py)")
    ap.add_argument("--model", choices=["residual", "unet3d"],
                    default="residual",
                    help="unet3d = the reference's vanilla 4-level net "
                         "(f_maps from 64, DoubleConv, concat joins, "
                         "ref model.py:11-110); VERDICT r4 item 4")
    ap.add_argument("--out_channels", type=int, default=None,
                    help="default: 2, or 8 with --heatmaps 6")
    ap.add_argument("--heatmaps", type=int, default=0,
                    help="N>0 benches the multitask LandmarkTask step "
                         "(heatmap MSE + Dice), e.g. --heatmaps 6 "
                         "--out_channels 8 --batch 4 = the per-chip "
                         "program of BASELINE config 5 (multitask_dp.yaml)")
    ap.add_argument("--remat", type=int, default=1)
    args = ap.parse_args()

    wait_for_backend()
    import jax
    import jax.numpy as jnp

    from tpu_mednet.models import ResidualUNet3D, UNet3D
    from tpu_mednet.ops.augment import AugmentConfig
    from tpu_mednet.parallel.mesh import batch_sharding, make_mesh, replicated
    from tpu_mednet.tasks import LandmarkTask, SegmentationTask
    from tpu_mednet.train import create_train_state, make_train_step

    PATCH = 96
    BATCH = args.batch if args.batch is not None else (
        32 if args.model == "residual" else 8)
    C_IN = args.in_channels
    OUT_C = args.out_channels if args.out_channels is not None else (
        args.heatmaps + 2 if args.heatmaps else 2)
    ITERS = 20
    WARMUP = 3

    if args.model == "residual":
        model = ResidualUNet3D(in_channels=C_IN, out_channels=OUT_C,
                               f_maps=32, remat=args.remat, packed=True)
    else:
        # vanilla net: DoubleConv/concat family — packed_io does not apply
        # (models/unet.py packed_io gate); remat=1 fits batch 8 at 96^3
        # (batch 16 OOM'd at a measured 23.26G: concat-join full-res temps)
        from tpu_mednet.models import UNet3DBase, UNetConfig

        model = UNet3DBase(config=UNetConfig(
            in_channels=C_IN, out_channels=OUT_C, f_maps=64, num_levels=4,
            block="double", layer_order="gcr", num_groups=8,
            dtype=jnp.bfloat16, remat=args.remat,
        ))
    if args.heatmaps:
        # config-5 per-heatmap weights when the count matches; uniform else
        reg_w = ([0.001, 0.015, 0.015, 0.015, 0.001, 0.001]
                 if args.heatmaps == 6 else [1.0 / args.heatmaps] * args.heatmaps)
        task = LandmarkTask(model=model, loss_regression_weight=reg_w,
                            loss_class="DICE",
                            loss_class_weight=[0.05, 1.0][:OUT_C - args.heatmaps]
                            if OUT_C - args.heatmaps == 2 else None)
    else:
        task = SegmentationTask(model=model, loss="DICE")
    mesh = make_mesh(n_data=min(len(jax.devices()), 8))
    n_dev = mesh.shape["data"]

    state = create_train_state(
        model, (BATCH, PATCH, PATCH, PATCH, C_IN), learning_rate=1e-3, seed=0
    )
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(task, augment=AugmentConfig(mirror_axes=(1, 2, 3)))

    rng = np.random.default_rng(0)
    n_label_c = args.heatmaps + 1
    label = np.concatenate([
        rng.integers(0, 256, size=(BATCH, PATCH, PATCH, PATCH, args.heatmaps)),
        rng.integers(0, OUT_C - args.heatmaps,
                     size=(BATCH, PATCH, PATCH, PATCH, 1)),
    ], axis=-1).astype(np.uint8) if args.heatmaps else rng.integers(
        0, OUT_C, size=(BATCH, PATCH, PATCH, PATCH, 1)).astype(np.uint8)
    assert label.shape[-1] == n_label_c
    batch = {
        "data": jax.device_put(
            rng.normal(size=(BATCH, PATCH, PATCH, PATCH, C_IN)).astype(np.float32),
            batch_sharding(mesh),
        ),
        "label": jax.device_put(label, batch_sharding(mesh)),
    }

    # logical train-step FLOPs for MFU.  NOT XLA's cost model: that counts
    # the packed convs' structural zeros (4x inflation at zb=4); the
    # analytic model counts what the math requires (utils/flops.py).
    from tpu_mednet.utils.flops import unet_train_step_flops

    step_flops = unet_train_step_flops(
        in_channels=C_IN, out_channels=OUT_C,
        feature_maps=model.config.feature_maps,
        patch=(PATCH, PATCH, PATCH), batch=BATCH,
        block=model.config.block,
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
    if args.model != "residual":
        metric += f"_{args.model}"
        vs_baseline = None  # the torch denominator is the residual net
    if args.heatmaps:
        metric += f"_mt{args.heatmaps}"
        vs_baseline = None
    if C_IN != 1:
        metric += f"_in{C_IN}"
    if OUT_C not in (2, args.heatmaps + 2):
        metric += f"_out{OUT_C}"
    if args.remat != 1:
        metric += f"_remat{args.remat}"
    default_batch = 32 if args.model == "residual" else 8
    if BATCH != default_batch:
        # keep variant rows distinguishable from the standing config in
        # BENCH logs (vs_baseline stays batch-32-calibrated)
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
