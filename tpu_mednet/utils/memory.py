"""Analytic HBM footprint estimates + the inference stitch-mode guard.

An oversized volume on the on-device stitch paths used to die as an opaque
``remote_compile: HTTP 500`` OOM (easily confused with infra 500s — see
CLAUDE.md); the reference never had this failure mode because it always
stitched on host (`/root/reference/examples/predict.py:83-97`).  This
module estimates the device-resident footprint BEFORE dispatch and fails
fast with the numbers and the escape hatch.

The models are calibrated against measured points on the v5e chip
(docs/PERFORMANCE.md):

- train step, flagship 35.3M-param ResidualUNet3D, 96 cubed patches,
  bf16, remat=1: batch 36 OOM'd at **19.38G** of 15.75G HBM; batch 32
  fits (the standing bench config).  ``unet_train_peak_bytes`` with
  ``XLA_OVERHEAD=2.0`` brackets that boundary correctly — 16.3G at
  batch 36 (predicts the OOM, 16% under the measured peak) and 14.5G at
  batch 32 (predicts the fit).  A single linear factor cannot hit 19.38
  exactly AND keep batch 32 under budget: the measured pair is
  superlinear in batch (the b36 compile scheduled worse), which a linear
  activation model deliberately does not chase.
- BASELINE config 4 as written (batch 2, 128 cubed, in=4, f_maps=32,
  **remat=0**) OOM'd at **17.52G** (round 4, /tmp OOM dump): the largest
  allocations are fp32 GroupNorm working buffers of the STORED
  full-resolution stages (`ops/packed.py:187,190` broadcast/sub/mul at
  encoder0/decoder3) — a term invisible in the bf16 activation model.
  ``GN_F32_UNITS`` counts those per stored level-0 conv; with remat >= 1
  the level-0 stages are rematerialized and the term vanishes, which is
  why the flagship remat=1 points calibrate without it.  Estimate with
  the term: 18.9G (predicts the OOM, +8% over measured).  With remat=1
  the PACKED compute mode still OOM'd (15.88G measured: the packed GN's
  fp32 normalize materializes across the rematted backward at 128 cubed)
  — the shipped config 4 runs ``remat: 1, packed: false`` and fits; the
  estimator models the unpacked layout.
- ``XLA_OVERHEAD`` covers fusion temps, layout copies, backward
  double-buffering and fragmentation over the analytic sum.
- INFERENCE (round 5, ``benchmarks/infer_oom_probe.py`` — AOT compiles of
  the real stitch executables, no data transfer): gaussian stitch at
  flagship width / 96 cubed patches / batch 8 / 3-channel head compiles at
  832 cubed, OOMs at 896 cubed with a reported peak of **18.08G**; the
  device stitch compiles through 1280 cubed.  The stitch model is
  therefore PHASE-MAX, not sum: XLA frees the raw input after padding and
  the padded volume before the crop, so peak = max(scan phase, finalize
  phase).  ``INFER_WORK_UNITS`` is fit to the 896-point's residual
  (~3.34G forward working set at batch 8).
- UNet3D (DoubleConv/concat, f_maps from 64) at 96 cubed remat=1: batch 16
  OOM'd at **23.26G** (round 5) — the concat join's full-resolution temps
  (bf16 192-channel concat + upsampled deep feature) plus stored encoder
  skips; ``unet_train_peak_bytes`` adds those for ``block='double'`` and
  brackets the boundary (batch 8 fits, measured 11.62 p/s).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

GiB = float(1 << 30)

# measured-peak / analytic-sum ratio at the calibration point (see module
# docstring); applied to activation/working-set terms, not to the static
# volume/accumulator buffers whose sizes are exact
XLA_OVERHEAD = 2.0

# concurrently-live activation units at the widest level of an inference
# forward.  MEASURED (round 5, benchmarks/infer_oom_probe.py): the
# gaussian stitch at 896 cubed OOM'd with a reported peak of 18.08G; its
# device-resident accumulators/padded volume/input account for 14.74G,
# leaving ~3.34G of forward working set at flagship batch 8 — this
# constant reproduces that (skips + W*unit0)*XLA_OVERHEAD = 3.34G fit.
INFER_WORK_UNITS = 2.6

# fp32 GroupNorm working buffers per stored full-resolution conv (measured
# from the config-4 OOM dump; see module docstring)
GN_F32_UNITS = 2.0

# default budget: one TPU v5e chip (what `jax.devices()` exposes here)
DEFAULT_HBM_GB = 15.75


def tree_bytes(tree) -> int:
    """Total bytes of all array leaves in a pytree (params, opt state)."""
    import jax

    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "shape") and hasattr(x, "dtype")
    )


def _unit_bytes(batch: int, patch: Sequence[int], level: int, channels: int,
                dtype_bytes: int) -> float:
    """Bytes of one full activation at encoder/decoder level ``level``."""
    vox = 1.0
    for p in patch:
        vox *= max(int(p) >> level, 1)
    return float(batch) * vox * channels * dtype_bytes


def unet_infer_peak_bytes(
    batch: int,
    patch: Sequence[int],
    feature_maps: Sequence[int],
    dtype_bytes: int = 2,
) -> int:
    """Working-set estimate of one inference forward (no stored backward).

    XLA frees level activations as they are consumed, but the encoder skip
    features stay live until their decoder joins: peak = all skip features
    + a few concurrent units at the widest level.
    """
    f = list(feature_maps)
    skips = sum(
        _unit_bytes(batch, patch, lvl, c, dtype_bytes)
        for lvl, c in enumerate(f[:-1])
    )
    work = INFER_WORK_UNITS * _unit_bytes(batch, patch, 0, f[0], dtype_bytes)
    return int((skips + work) * XLA_OVERHEAD)


def unet_train_peak_bytes(
    batch: int,
    patch: Sequence[int],
    feature_maps: Sequence[int],
    in_channels: int = 1,
    out_channels: int = 3,
    n_params: int = 0,
    dtype_bytes: int = 2,
    block: str = "residual",
    remat: int = 1,
) -> int:
    """Peak HBM of one jit'd train step (fwd+bwd+Adam, ``models/unet.py``).

    Stored-for-backward activations: non-remat stages hold their conv
    outputs (3 per residual stage, 2 per double-conv stage) plus the stage
    input; the ``remat`` highest-resolution stages on each side hold only
    their inputs (`models/unet.py:129-150`).  Params/grads/Adam moments are
    fp32 (x12 bytes/param) plus a bf16 compute cast (x2).
    """
    f = list(feature_maps)
    n_levels = len(f)
    convs = 3 if block == "residual" else 2
    remat_k = n_levels if remat is True else int(remat)

    act = 0.0
    join_raw = 0.0
    # encoder stage i consumes the level-(i-1) output and produces level i
    for i, c in enumerate(f):
        inp = _unit_bytes(batch, patch, max(i - 1, 0), f[i - 1], dtype_bytes) \
            if i else _unit_bytes(batch, patch, 0, in_channels, dtype_bytes)
        act += inp
        if block == "double" and i < n_levels - 1:
            # concat-join family: every encoder skip feature stays live
            # until its decoder concat consumes it (measured: the UNet3D
            # b16 96-cubed OOM dump holds two full-res f[0] skips)
            act += _unit_bytes(batch, patch, i, c, dtype_bytes)
        if i >= remat_k:  # stored stage: conv outputs live until backward
            act += convs * _unit_bytes(batch, patch, i, c, dtype_bytes)
            if i == 0:
                # stored FULL-RESOLUTION stages additionally pin fp32
                # GroupNorm working buffers across the backward (measured:
                # the config-4 remat=0 OOM, module docstring)
                act += GN_F32_UNITS * convs * _unit_bytes(batch, patch, 0, c, 4)
    # decoder stage j outputs at level (n_levels-2-j)
    for j in range(n_levels - 1):
        out_lvl = n_levels - 2 - j
        if block == "double":
            # concat join temps at the OUTPUT resolution: the nearest-
            # upsampled deep feature (f[out_lvl+1]) plus the concatenated
            # (f[out_lvl] + f[out_lvl+1]) conv input are materialized
            # whether or not the stage is rematted.  Counted WITHOUT the
            # XLA_OVERHEAD factor: these ARE the overhead buffers (the
            # 6.75G + 3.38G leaders of the measured b16 dump); the
            # resulting model brackets the measured pair — b16 predicts
            # 24.6G vs 23.26G measured OOM, b8 predicts 13.0G (fits).
            join_raw += _unit_bytes(
                batch, patch, out_lvl, f[out_lvl] + 2 * f[out_lvl + 1],
                dtype_bytes)
        if out_lvl >= remat_k:
            # transpose-conv output + conv outputs
            act += (convs + 1) * _unit_bytes(
                batch, patch, out_lvl, f[out_lvl], dtype_bytes)
            if out_lvl == 0:
                act += GN_F32_UNITS * convs * _unit_bytes(
                    batch, patch, 0, f[0], 4)
        else:
            # rematted: only the stage input (previous decoder output)
            act += _unit_bytes(batch, patch, out_lvl + 1, f[out_lvl + 1],
                               dtype_bytes)
    # fp32 logits + one-hot/loss temps at full resolution
    act += 2 * _unit_bytes(batch, patch, 0, out_channels, 4)
    params = n_params * (12 + dtype_bytes)
    return int(act * XLA_OVERHEAD + join_raw + params)


def _padded_extent(img_size, patch_size, overlap) -> np.ndarray:
    """Padded-volume extent of the grid geometry (device_sliding/_grid_corners,
    reference stride math `/root/reference/midasmednet/dataset.py:369-379`)."""
    img = np.asarray(img_size, dtype=np.int64)
    patch = np.asarray(patch_size, dtype=np.int64)
    ov = np.asarray(overlap, dtype=np.int64)
    stride = patch - 2 * ov
    if np.any(stride <= 0):
        raise ValueError("patch_overlap too large for patch_size")
    overhead = (-img) % stride
    return img + 2 * ov + overhead


def device_stitch_bytes(
    img_size: Sequence[int],
    patch_size: Sequence[int],
    patch_overlap: Sequence[int],
    batch_size: int,
    in_channels: int,
    out_channels: int,
    feature_maps: Sequence[int],
    stitch: str = "device",
    dtype_bytes: int = 2,
    params_bytes: int = 0,
    n_tta: int = 1,
    acc_channels: Optional[int] = None,
) -> Tuple[int, Dict[str, int]]:
    """Estimated HBM footprint of one volume on an on-device stitch path.

    Returns ``(total_bytes, breakdown)``.  Covers both pipelines:

    - ``stitch='device'`` (`inference/device_sliding.py`): f16 input volume
      + f16 padded copy + uint8 result over the padded domain + crop copy.
    - ``stitch='gaussian'`` (`inference/weighted.py`): fp32 activation
      accumulator + fp32 weight accumulator instead of the uint8 result.
      The accumulator is ``acc_channels`` wide — the MODEL's out_channels
      (the jit accumulates raw activations before argmax), which for
      multi-class tasks exceeds the ``out_channels`` of the final uint8
      result (num_heatmaps + 1 class-map channel).
    """
    if acc_channels is None:
        acc_channels = out_channels
    img_vox = float(np.prod(np.asarray(img_size, dtype=np.float64)))
    padded_vox = float(np.prod(
        _padded_extent(img_size, patch_size, patch_overlap).astype(np.float64)
    ))
    breakdown: Dict[str, int] = {
        "input_volume_f16": int(img_vox * in_channels * 2),
        "padded_volume_f16": int(padded_vox * in_channels * 2),
        "params": int(params_bytes),
    }
    # TTA runs the forward per flip combination; the accumulated activation
    # buffer adds ~one fp32 patch batch
    fwd = unet_infer_peak_bytes(batch_size, patch_size, feature_maps,
                                dtype_bytes)
    if n_tta > 1:
        patch_vox = float(np.prod(np.asarray(patch_size, dtype=np.float64)))
        fwd += int(batch_size * patch_vox * out_channels * 4 * XLA_OVERHEAD)
    breakdown["forward_working_set"] = int(fwd)

    # PHASE-MAX model (measured, round 5, benchmarks/infer_oom_probe.py):
    # XLA frees phase-dead buffers, so the peak is the larger of the scan
    # phase (padded volume + accumulators/result + raw input + forward
    # working set) and the finalize phase (accumulators/result + the
    # cropped output copy) — NOT the sum of everything.  Calibration:
    # gaussian 896-cubed OOM'd at a reported 18.08G (scan phase
    # reproduces it), 832-cubed compiles; device stitch compiles through
    # 1280-cubed, which the old sum model mispredicted as a 24.9G OOM.
    if stitch == "gaussian":
        breakdown["accumulator_f32"] = int(padded_vox * acc_channels * 4)
        breakdown["weight_accumulator_f32"] = int(padded_vox * 4)
        breakdown["result_u8"] = int(img_vox * out_channels)
        resident = (breakdown["padded_volume_f16"]
                    + breakdown["accumulator_f32"]
                    + breakdown["weight_accumulator_f32"])
        scan = resident + breakdown["input_volume_f16"] + breakdown[
            "forward_working_set"]
        final = resident + breakdown["result_u8"]
    else:
        breakdown["result_u8"] = int(padded_vox * out_channels)
        breakdown["crop_copy_u8"] = int(img_vox * out_channels)
        resident = breakdown["padded_volume_f16"] + breakdown["result_u8"]
        scan = resident + breakdown["input_volume_f16"] + breakdown[
            "forward_working_set"]
        final = resident + breakdown["crop_copy_u8"]
    breakdown["peak_phase_scan"] = int(scan)
    breakdown["peak_phase_final"] = int(final)
    return int(params_bytes + max(scan, final)), breakdown


def hbm_budget_bytes(default_gb: float = DEFAULT_HBM_GB) -> int:
    """Per-device HBM budget: $TPU_MEDNET_HBM_GB > device stats > default.

    The device query is best-effort — over the axon tunnel (and on the CPU
    test platform) ``memory_stats`` may be absent or meaningless, so a
    non-TPU platform falls straight through to the default.
    """
    env = os.environ.get("TPU_MEDNET_HBM_GB")
    if env:
        return int(float(env) * GiB)
    try:
        import jax

        dev = jax.local_devices()[0]
        if dev.platform not in ("cpu",):
            stats = dev.memory_stats()
            if stats and stats.get("bytes_limit"):
                return int(stats["bytes_limit"])
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return int(default_gb * GiB)


class HBMBudgetError(RuntimeError):
    """An on-device stitch request that cannot fit the chip's HBM."""


def check_stitch_budget(
    key: str,
    img_size: Sequence[int],
    patch_size: Sequence[int],
    patch_overlap: Sequence[int],
    batch_size: int,
    in_channels: int,
    out_channels: int,
    feature_maps: Sequence[int],
    stitch: str = "device",
    params_bytes: int = 0,
    n_tta: int = 1,
    budget_bytes: Optional[int] = None,
    guard: str = "error",
    acc_channels: Optional[int] = None,
) -> bool:
    """Fail fast (or warn) when a volume won't fit the on-device stitch.

    ``guard``: 'error' raises :class:`HBMBudgetError`; 'warn' logs and
    returns False (caller falls back to host stitching); 'off' skips the
    check.  Returns True when the volume fits.
    """
    if guard == "off":
        return True
    if guard not in ("error", "warn"):
        raise ValueError(f"hbm_guard must be error|warn|off, got {guard!r}")
    budget = hbm_budget_bytes() if budget_bytes is None else int(budget_bytes)
    total, breakdown = device_stitch_bytes(
        img_size, patch_size, patch_overlap, batch_size, in_channels,
        out_channels, feature_maps, stitch=stitch, params_bytes=params_bytes,
        n_tta=n_tta, acc_channels=acc_channels,
    )
    if total <= budget:
        return True
    detail = ", ".join(f"{k}={v / GiB:.2f}G" for k, v in breakdown.items())
    msg = (
        f"volume {key!r} {tuple(int(v) for v in img_size)} needs an "
        f"estimated {total / GiB:.2f}G HBM on the '{stitch}' stitch path "
        f"(budget {budget / GiB:.2f}G): {detail}. Use prediction.stitch: "
        f"crop (host stitching), a smaller batch_size/patch count, or set "
        f"hbm_guard: off to force the attempt."
    )
    if guard == "warn":
        import logging

        logging.getLogger(__name__).warning(
            "%s Falling back to host stitching for this volume.", msg)
        return False
    raise HBMBudgetError(msg)
