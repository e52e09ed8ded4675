"""Serving export tests: jax.export artifacts round-trip and match the model.

The serving artifact bakes the weights in and serializes forward +
postprocess to versioned StableHLO — a serving host deserializes and calls
it without tpu_mednet or the checkpoint (deployment complement to the
reference's live-process `load_from_checkpoint`, predict.py:46-50).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mednet.inference.serving import (
    export_predictor,
    load_exported,
    make_serving_fn,
    save_exported,
)
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import LandmarkTask, SegmentationTask
from tpu_mednet.train import create_train_state


def make_seg_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    state = create_train_state(model, (1, 16, 16, 16, 1), 1e-3, seed=0)
    return task, {"params": state.params}


def make_ldmk_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=4, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = LandmarkTask(model=model, loss_regression_weight=[0.01, 0.01])
    state = create_train_state(model, (1, 16, 16, 16, 1), 1e-3, seed=0)
    return task, {"params": state.params}


def test_export_symbolic_batch_roundtrip(tmp_path):
    task, variables = make_seg_task()
    exported = export_predictor(task, variables, (16, 16, 16))
    path = tmp_path / "seg.jaxep"
    save_exported(exported, path)
    assert path.stat().st_size > 0

    loaded = load_exported(path)
    serve = make_serving_fn(task, variables)
    rng = np.random.default_rng(0)
    # symbolic batch: one artifact serves different batch sizes
    for n in (1, 3):
        x = rng.normal(size=(n, 16, 16, 16, 1)).astype(np.float32)
        got = np.asarray(loaded.call(jnp.asarray(x)))
        want = np.asarray(serve(jnp.asarray(x)))
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.uint8
        assert got.shape == (n, 16, 16, 16, 1)


def test_export_with_tta_baked_in(tmp_path):
    """--tta bakes the mirror-TTA ensemble into the artifact: the call
    equals postprocess(tta_split_activations) on the same input."""
    from tpu_mednet.inference.common import (
        postprocess_activations,
        tta_split_activations,
    )

    task, variables = make_seg_task()
    flips = (0, 2)
    exported = export_predictor(task, variables, (16, 16, 16),
                                tta_flips=flips)
    save_exported(exported, tmp_path / "tta.jaxep")
    loaded = load_exported(tmp_path / "tta.jaxep")

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
    got = np.asarray(loaded.call(x))
    want = np.asarray(
        postprocess_activations(task, tta_split_activations(
            task, variables, x, flips
        ))
    )
    np.testing.assert_array_equal(got, want)


def test_export_pinned_batch(tmp_path):
    task, variables = make_seg_task()
    exported = export_predictor(task, variables, (16, 16, 16), batch_size=2)
    save_exported(exported, tmp_path / "p.jaxep")
    loaded = load_exported(tmp_path / "p.jaxep")
    x = jnp.zeros((2, 16, 16, 16, 1), jnp.float32)
    assert loaded.call(x).shape == (2, 16, 16, 16, 1)
    with pytest.raises(Exception):
        loaded.call(jnp.zeros((3, 16, 16, 16, 1), jnp.float32))


def test_export_landmark_postprocess(tmp_path):
    task, variables = make_ldmk_task()
    exported = export_predictor(task, variables, (16, 16, 16))
    save_exported(exported, tmp_path / "l.jaxep")
    loaded = load_exported(tmp_path / "l.jaxep")
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 16, 16, 16, 1)).astype(np.float32))
    got = np.asarray(loaded.call(x))
    want = np.asarray(make_serving_fn(task, variables)(x))
    np.testing.assert_array_equal(got, want)
    # heatmaps first (uint8-clipped), class map last channel
    assert got.shape[-1] == task.num_heatmaps + 1


def test_export_cross_platform_tpu_lowering():
    """TPU lowering at export time must not need a TPU attached."""
    task, variables = make_seg_task()
    try:
        exported = export_predictor(
            task, variables, (16, 16, 16), platforms=("tpu", "cpu"))
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"multi-platform TPU lowering unavailable here: {e}")
    assert set(exported.platforms) == {"tpu", "cpu"}
    # still callable on the CPU platform
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    out = exported.call(x)
    assert out.shape == (1, 16, 16, 16, 1)


def test_detect_task_name():
    from tpu_mednet.inference.serving import detect_task_name

    assert detect_task_name({"fmaps": 32}) == "SegmentationNet"
    assert detect_task_name({"loss_regression_weight": None}) == "SegmentationNet"
    assert detect_task_name(
        {"loss_regression_weight": [0.01, 0.01]}) == "LandmarkNet"
    import types
    ns = types.SimpleNamespace(loss_regression_weight=[0.5], fmaps=8)
    assert detect_task_name(ns) == "LandmarkNet"
