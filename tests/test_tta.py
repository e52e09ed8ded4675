"""Mirror test-time augmentation: unit oracle + pipeline plumbing tests.

TTA averages the 2^k mirrored forwards in activation space (class channels
in probability space, heatmaps raw) before the argmax — the standard
medical-segmentation inference ensemble.  Capability beyond the reference
(its predict.py:83-97 runs one forward per patch).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader
from tpu_mednet.inference.common import (
    normalize_tta,
    postprocess_activations,
    split_activations,
    tta_split_activations,
)
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import LandmarkTask, SegmentationTask
from tpu_mednet.train import create_train_state

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow


def tiny_model(out_channels, in_channels=1):
    return UNet3DBase(config=UNetConfig(
        in_channels=in_channels, out_channels=out_channels, f_maps=8,
        num_levels=2, block="residual", layer_order="cge", num_groups=4,
        dtype=jnp.float32,
    ))


def make_task(kind):
    if kind == "landmark":
        return LandmarkTask(model=tiny_model(4),
                            loss_regression_weight=[0.01, 0.01],
                            loss_class="DICE")
    return SegmentationTask(model=tiny_model(2), loss="DICE")


def variables_for(task, shape=(1, 16, 16, 16, 1)):
    state = create_train_state(task.model, shape, 1e-3, seed=0)
    return {"params": state.params}


def test_normalize_tta():
    assert normalize_tta(False) == ()
    assert normalize_tta(None) == ()
    assert normalize_tta([]) == ()
    assert normalize_tta(True) == (0, 1, 2)
    assert normalize_tta([2, 0]) == (0, 2)
    assert normalize_tta(1) == (1,)
    assert normalize_tta(0) == (0,)  # axis 0 is falsy but valid
    with pytest.raises(ValueError, match="spatial"):
        normalize_tta([3])


@pytest.mark.parametrize("kind", ["seg", "landmark"])
def test_tta_activations_match_manual_flip_average(kind):
    task = make_task(kind)
    variables = variables_for(task)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))

    # flips=() is EXACTLY split_activations
    base = split_activations(task, variables, x)
    np.testing.assert_array_equal(
        np.asarray(tta_split_activations(task, variables, x, ())),
        np.asarray(base),
    )

    # flips=(0,): mean of identity and the X-mirrored forward, mirrored back
    got = tta_split_activations(task, variables, x, (0,))
    flipped = jnp.flip(
        split_activations(task, variables, jnp.flip(x, 1)), 1
    )
    want = (base + flipped) / 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # flips=(0, 2): all four subsets
    got2 = tta_split_activations(task, variables, x, (0, 2))
    parts = [base,
             jnp.flip(split_activations(task, variables, jnp.flip(x, 1)), 1),
             jnp.flip(split_activations(task, variables, jnp.flip(x, 3)), 3),
             jnp.flip(split_activations(task, variables,
                                        jnp.flip(x, (1, 3))), (1, 3))]
    want2 = sum(parts) / 4
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-6)


@pytest.mark.parametrize("kind", ["seg", "landmark"])
def test_tta_device_pipeline_single_patch_oracle(kind):
    """patch == volume, overlap 0: the stitched TTA output must equal the
    direct postprocess(tta_split_activations) of the whole-volume patch."""
    from tpu_mednet.inference.device_sliding import predict_volumes_on_device

    task = make_task(kind)
    variables = variables_for(task)
    rng = np.random.default_rng(1)
    vol = rng.normal(0, 1, size=(1, 16, 16, 16)).astype(np.float32)
    reader = MemoryReader({"images": {"s": vol}})

    flips = (0, 2)
    results = predict_volumes_on_device(
        task, variables, None, ["s"], patch_size=[16, 16, 16],
        patch_overlap=[0, 0, 0], batch_size=1, reader=reader,
        tta_flips=flips,
    )
    got = np.asarray(results["s"])  # (outC, 16, 16, 16)

    # oracle: same f16 preload, one whole-volume patch
    x = jnp.asarray(np.moveaxis(vol.astype(np.float16), 0, -1))[None]
    act = tta_split_activations(task, variables, x, flips)
    want = np.moveaxis(np.asarray(postprocess_activations(task, act))[0], -1, 0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("kind", ["seg", "landmark"])
def test_tta_weighted_pipeline_single_patch_oracle(kind):
    """Gaussian stitch with one patch: weights cancel (w*act/w) — output is
    the postprocessed TTA activation up to fp division + uint8 truncation."""
    from tpu_mednet.inference.weighted import predict_volumes_weighted_on_device

    task = make_task(kind)
    variables = variables_for(task)
    rng = np.random.default_rng(2)
    vol = rng.normal(0, 1, size=(1, 16, 16, 16)).astype(np.float32)
    reader = MemoryReader({"images": {"s": vol}})

    flips = (1,)
    results = predict_volumes_weighted_on_device(
        task, variables, None, ["s"], patch_size=[16, 16, 16],
        patch_overlap=[0, 0, 0], batch_size=1, reader=reader,
        tta_flips=flips,
    )
    got = np.asarray(results["s"]).astype(np.int64)

    x = jnp.asarray(np.moveaxis(vol.astype(np.float16), 0, -1))[None]
    act = tta_split_activations(task, variables, x, flips)
    want = np.moveaxis(
        np.asarray(postprocess_activations(task, act))[0], -1, 0
    ).astype(np.int64)
    # class channel (last) must agree exactly; uint8 heatmap channels may
    # truncate one step apart across the w*act/w round trip
    np.testing.assert_array_equal(got[-1], want[-1])
    if got.shape[0] > 1:  # heatmap channels (landmark task only)
        assert np.abs(got[:-1] - want[:-1]).max() <= 1


def test_tta_host_pipeline_runs_and_matches_device(tmp_path):
    """Host-stitched predict_volumes with TTA equals the on-device stitcher
    (both reduce to the same per-patch forward; geometry is shared)."""
    from tpu_mednet.inference.device_sliding import predict_volumes_on_device
    from tpu_mednet.inference.sliding_window import predict_volumes

    task = make_task("seg")
    variables = variables_for(task)
    rng = np.random.default_rng(3)
    vol = rng.normal(0, 1, size=(1, 20, 20, 20)).astype(np.float32)
    store = {"images": {"s": vol}}

    flips = (0,)
    host = predict_volumes(
        task, variables, None, ["s"], patch_size=[16, 16, 16],
        patch_overlap=[2, 2, 2], batch_size=2, reader=MemoryReader(store),
        tta_flips=flips,
    )
    dev = predict_volumes_on_device(
        task, variables, None, ["s"], patch_size=[16, 16, 16],
        patch_overlap=[2, 2, 2], batch_size=2, reader=MemoryReader(store),
        tta_flips=flips,
    )
    np.testing.assert_array_equal(np.asarray(host["s"]), np.asarray(dev["s"]))
