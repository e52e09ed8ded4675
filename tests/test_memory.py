"""HBM footprint estimator + the on-device stitch guard.

Calibration points are measured on the real chip (docs/PERFORMANCE.md):
the flagship train step (35.3M params, 96 cubed, bf16, remat=1) OOM'd at
batch 36 with 19.38G of 15.75G HBM while batch 32 fits — the estimator
must bracket that boundary.  The stitch guard turns what used to be an
opaque ``remote_compile: HTTP 500`` into an actionable error (or a host
fallback), VERDICT r3 item 5.
"""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader
from tpu_mednet.inference.device_sliding import predict_volumes_on_device
from tpu_mednet.inference.sliding_window import predict_volumes
from tpu_mednet.inference.weighted import (
    predict_volumes_weighted,
    predict_volumes_weighted_on_device,
)
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import create_train_state
from tpu_mednet.utils.memory import (
    GiB,
    HBMBudgetError,
    check_stitch_budget,
    device_stitch_bytes,
    hbm_budget_bytes,
    tree_bytes,
    unet_train_peak_bytes,
)

FLAGSHIP = dict(patch=(96, 96, 96), feature_maps=[32, 64, 128, 256, 512],
                in_channels=1, out_channels=2, n_params=35_316_738,
                remat=1)
V5E_HBM = int(15.75 * GiB)


# -- calibration against the measured batch-36 OOM boundary ----------------


def test_train_estimate_brackets_measured_oom_boundary():
    e36 = unet_train_peak_bytes(36, **FLAGSHIP)
    e32 = unet_train_peak_bytes(32, **FLAGSHIP)
    # batch 36 measured at 19.38G (OOM): the estimate must predict the OOM
    # and land within 30% of the measured peak
    assert e36 > V5E_HBM
    assert abs(e36 - 19.38 * GiB) / (19.38 * GiB) < 0.30
    # batch 32 is the standing bench config: must predict the fit
    assert e32 <= V5E_HBM


def test_train_estimate_config4_remat0_oom_point():
    """BASELINE config 4 as written (batch 2, 128 cubed, in=4, remat=0)
    OOM'd at 17.52G on the real chip (round 4): the stored full-resolution
    stages pin fp32 GroupNorm working buffers.  The estimator must predict
    that OOM — and the remat=1 fix."""
    kw = dict(patch=(128, 128, 128), feature_maps=[32, 64, 128, 256, 512],
              in_channels=4, out_channels=4, n_params=35_318_000)
    e0 = unet_train_peak_bytes(2, remat=0, **kw)
    assert e0 > V5E_HBM
    assert abs(e0 - 17.52 * GiB) / (17.52 * GiB) < 0.30
    # remat=1 rematerializes the level-0 stages -> the GN fp32 term
    # vanishes and the step fits with lots of headroom (the documented fix)
    assert unet_train_peak_bytes(2, remat=1, **kw) < 0.5 * V5E_HBM


def test_train_estimate_unet3d_concat_oom_point():
    """UNet3D (DoubleConv/concat, f_maps from 64) at 96 cubed, remat=1:
    batch 16 OOM'd at a measured **23.26G** (round 5, bench log) — the
    leaders of the dump are the concat join's full-resolution temps
    (bf16 192-channel concat 6.75G + upsampled 3.38G + two stored 64-ch
    skips).  batch 8 runs (11.62 p/s measured).  The estimator's
    double-block join/skip terms must bracket that boundary."""
    kw = dict(patch=(96, 96, 96), feature_maps=[64, 128, 256, 512],
              in_channels=1, out_channels=2, n_params=16_318_756,
              block="double", remat=1)
    e16 = unet_train_peak_bytes(16, **kw)
    e8 = unet_train_peak_bytes(8, **kw)
    assert e16 > V5E_HBM
    assert abs(e16 - 23.26 * GiB) / (23.26 * GiB) < 0.30
    assert e8 <= V5E_HBM


def test_train_estimate_monotonic_in_batch_and_remat():
    base = unet_train_peak_bytes(8, **FLAGSHIP)
    assert unet_train_peak_bytes(16, **FLAGSHIP) > base
    no_remat = dict(FLAGSHIP, remat=0)
    assert unet_train_peak_bytes(8, **no_remat) > base


# -- stitch footprint model ------------------------------------------------


def test_gaussian_accumulators_cost_more_than_device_result():
    kw = dict(img_size=(256, 256, 256), patch_size=(96, 96, 96),
              patch_overlap=(16, 16, 16), batch_size=8, in_channels=1,
              out_channels=3, feature_maps=[32, 64, 128, 256, 512])
    dev, dev_b = device_stitch_bytes(stitch="device", **kw)
    gau, gau_b = device_stitch_bytes(stitch="gaussian", **kw)
    assert gau > dev  # fp32 acc + weight vs uint8 result
    assert "accumulator_f32" in gau_b and "result_u8" in dev_b
    # the fp32 activation accumulator is 4x the uint8 result by dtype alone
    assert gau_b["accumulator_f32"] > 3 * dev_b["result_u8"]


def test_gaussian_accumulator_counts_model_channels():
    """ADVICE r4 (medium): the jit's fp32 accumulator is model.out_channels
    wide — wider than the uint8 result's num_heatmaps+1 for multi-class
    tasks.  Near the budget boundary the guard must use the model width."""
    kw = dict(img_size=(200, 200, 200), patch_size=(96, 96, 96),
              patch_overlap=(16, 16, 16), batch_size=8, in_channels=1,
              out_channels=1, feature_maps=[32, 64, 128, 256, 512])
    lo, lo_b = device_stitch_bytes(stitch="gaussian", **kw)
    hi, hi_b = device_stitch_bytes(stitch="gaussian", acc_channels=5, **kw)
    assert hi_b["accumulator_f32"] == 5 * lo_b["accumulator_f32"]
    # the uint8 result keeps the result width, not the accumulator width
    assert hi_b["result_u8"] == lo_b["result_u8"]
    budget = (lo + hi) // 2
    assert check_stitch_budget("v", stitch="gaussian", budget_bytes=budget,
                               **kw)
    with pytest.raises(HBMBudgetError):
        check_stitch_budget("v", stitch="gaussian", budget_bytes=budget,
                            acc_channels=5, **kw)


def test_stitch_bytes_grow_with_volume():
    kw = dict(patch_size=(32, 32, 32), patch_overlap=(4, 4, 4), batch_size=2,
              in_channels=1, out_channels=2, feature_maps=[8, 16])
    small, _ = device_stitch_bytes(img_size=(64, 64, 64), **kw)
    big, _ = device_stitch_bytes(img_size=(256, 256, 256), **kw)
    assert big > 4 * small


def test_infer_estimates_bracket_measured_boundaries():
    """Round-5 measured inference points (benchmarks/infer_oom_probe.py,
    AOT compiles on the real chip): the gaussian stitch at flagship width,
    96-cubed patches, overlap 16, batch 8, 3-channel head compiles at
    832-cubed and OOMs at 896-cubed with a reported peak of **18.08G**;
    the device stitch compiles through 1280-cubed (the old sum model
    called that a 24.9G OOM).  The phase-max model must bracket all of
    it."""
    kw = dict(patch_size=(96, 96, 96), patch_overlap=(16, 16, 16),
              batch_size=8, in_channels=1, out_channels=1,
              feature_maps=[32, 64, 128, 256, 512],
              params_bytes=35_318_000 * 6)
    g832, _ = device_stitch_bytes(img_size=(832,) * 3, stitch="gaussian",
                                  acc_channels=3, **kw)
    g896, _ = device_stitch_bytes(img_size=(896,) * 3, stitch="gaussian",
                                  acc_channels=3, **kw)
    assert g832 <= V5E_HBM
    assert g896 > V5E_HBM
    assert abs(g896 - 18.08 * GiB) / (18.08 * GiB) < 0.15
    d1152, _ = device_stitch_bytes(img_size=(1152,) * 3, stitch="device", **kw)
    d1280, _ = device_stitch_bytes(img_size=(1280,) * 3, stitch="device", **kw)
    assert d1152 <= V5E_HBM
    assert d1280 <= V5E_HBM


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("TPU_MEDNET_HBM_GB", "2.5")
    assert hbm_budget_bytes() == int(2.5 * GiB)


# -- the guard -------------------------------------------------------------

GUARD_KW = dict(img_size=(400, 400, 400), patch_size=(96, 96, 96),
                patch_overlap=(16, 16, 16), batch_size=8, in_channels=1,
                out_channels=3, feature_maps=[32, 64, 128, 256, 512])


def test_guard_error_is_actionable():
    with pytest.raises(HBMBudgetError) as exc:
        check_stitch_budget("huge", budget_bytes=1 * GiB, **GUARD_KW)
    msg = str(exc.value)
    assert "huge" in msg and "prediction.stitch" in msg
    assert "G HBM" in msg and "budget 1.00G" in msg


def test_guard_warn_returns_false_and_logs(caplog):
    with caplog.at_level(logging.WARNING):
        ok = check_stitch_budget("huge", budget_bytes=1 * GiB, guard="warn",
                                 **GUARD_KW)
    assert ok is False
    assert "host stitching" in caplog.text


def test_guard_off_and_fit():
    assert check_stitch_budget("v", budget_bytes=1, guard="off", **GUARD_KW)
    assert check_stitch_budget("v", budget_bytes=100 * GiB, **GUARD_KW)
    with pytest.raises(ValueError, match="error|warn|off"):
        check_stitch_budget("v", guard="loud", **GUARD_KW)


# -- end-to-end: guard wired into the on-device pipelines ------------------


def tiny_setup():
    rng = np.random.default_rng(0)
    vols = {}
    lbls = {}
    for i, key in enumerate(("a", "b")):
        img = rng.normal(0, 0.1, size=(1, 24, 24, 24)).astype(np.float32)
        img[0, 6:14, 6:14, 6:14] += 2.0
        vols[key] = img
        lbl = np.zeros((1, 24, 24, 24), np.uint8)
        lbl[0, 6:14, 6:14, 6:14] = 1
        lbls[key] = lbl
    reader = MemoryReader({"images": vols, "labels": lbls})
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="residual", layer_order="cge", num_groups=2,
        dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    state = create_train_state(task.model, (1, 16, 16, 16, 1),
                               learning_rate=1e-3, seed=0)
    variables = {"params": state.params}
    return reader, task, variables


PRED_KW = dict(patch_size=(16, 16, 16), patch_overlap=(2, 2, 2),
               batch_size=2)


def test_device_path_guard_error(tmp_path):
    reader, task, variables = tiny_setup()
    with pytest.raises(HBMBudgetError, match="'a'"):
        predict_volumes_on_device(
            task, variables, None, ["a", "b"], reader=reader,
            hbm_budget=1 << 16, **PRED_KW,
        )


def test_device_path_guard_warn_falls_back_to_host(tmp_path, caplog):
    reader, task, variables = tiny_setup()
    with caplog.at_level(logging.WARNING):
        guarded = predict_volumes_on_device(
            task, variables, None, ["a", "b"], reader=reader,
            hbm_budget=1 << 16, hbm_guard="warn", **PRED_KW,
        )
    assert "Falling back to host stitching" in caplog.text
    host = predict_volumes(task, variables, None, ["a", "b"], reader=reader,
                           out_channels=1, **PRED_KW)
    assert sorted(guarded.keys()) == ["a", "b"]
    for key in ("a", "b"):
        np.testing.assert_array_equal(guarded[key].array, host[key].array)
        assert "affine" in guarded[key].attrs


def test_device_path_guard_fits_no_fallback(caplog):
    reader, task, variables = tiny_setup()
    with caplog.at_level(logging.WARNING):
        out = predict_volumes_on_device(
            task, variables, None, ["a", "b"], reader=reader,
            hbm_budget=100 * int(GiB), **PRED_KW,
        )
    assert "Falling back" not in caplog.text
    assert sorted(out.keys()) == ["a", "b"]


def test_weighted_path_guard(tmp_path, caplog):
    reader, task, variables = tiny_setup()
    with pytest.raises(HBMBudgetError):
        predict_volumes_weighted_on_device(
            task, variables, None, ["a"], reader=reader,
            hbm_budget=1 << 16, **PRED_KW,
        )
    with caplog.at_level(logging.WARNING):
        guarded = predict_volumes_weighted_on_device(
            task, variables, None, ["a", "b"], reader=reader,
            hbm_budget=1 << 16, hbm_guard="warn", **PRED_KW,
        )
    assert "Falling back to host stitching" in caplog.text
    host = predict_volumes_weighted(task, variables, None, ["a", "b"],
                                    reader=reader, **PRED_KW)
    for key in ("a", "b"):
        np.testing.assert_array_equal(guarded[key].array, host[key].array)


def test_weighted_guard_wired_to_model_channels():
    """E2E wiring of the ADVICE r4 medium fix: the weighted path must pass
    the MODEL's out_channels as the accumulator width.  Budget is pinned
    between the (wrong) result-width estimate and the (right) model-width
    estimate — the old code approved this volume, the fix rejects it."""
    reader, task, variables = tiny_setup()
    kw = dict(img_size=(24, 24, 24), patch_size=(16, 16, 16),
              patch_overlap=(2, 2, 2), batch_size=2, in_channels=1,
              out_channels=1, feature_maps=[4, 8],
              params_bytes=tree_bytes(variables))
    lo, _ = device_stitch_bytes(stitch="gaussian", **kw)
    hi, _ = device_stitch_bytes(stitch="gaussian", acc_channels=2, **kw)
    assert hi > lo
    with pytest.raises(HBMBudgetError):
        predict_volumes_weighted_on_device(
            task, variables, None, ["a"], reader=reader,
            hbm_budget=(lo + hi) // 2, **PRED_KW,
        )


class _ClosableMemoryReader(MemoryReader):
    def __init__(self, store):
        super().__init__(store)
        self.closed = False

    def close(self):
        self.closed = True


def test_guard_error_closes_owned_reader():
    """ADVICE r4 (low): an HBMBudgetError must not leak a reader the
    pipeline opened itself (owns=True path via reader_cls factory)."""
    rng = np.random.default_rng(0)
    store = {"images": {"a": rng.normal(
        0, 0.1, size=(1, 24, 24, 24)).astype(np.float32)}}
    _, task, variables = tiny_setup()
    for fn in (predict_volumes_on_device, predict_volumes_weighted_on_device):
        holder = {}

        def factory(path):
            holder["r"] = _ClosableMemoryReader(store)
            return holder["r"]

        with pytest.raises(HBMBudgetError):
            fn(task, variables, "unused-path", ["a"], reader_cls=factory,
               hbm_budget=1 << 16, **PRED_KW)
        assert holder["r"].closed, fn.__name__


def test_params_bytes_counted():
    reader, task, variables = tiny_setup()
    assert tree_bytes(variables) > 0
