"""Data-parallel multi-device inference (8 virtual CPU devices).

The on-device sliding-window pipelines deal whole volumes round-robin
across devices (``devices=...``) — the TPU answer to the reference's
``gpus=N`` inference placement (`/root/reference/examples/predict.py:75-82`).
Each volume runs whole on one chip, so outputs must be bit-identical to the
single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader
from tpu_mednet.inference.common import round_robin_placement, run_pipelined
from tpu_mednet.inference.device_sliding import predict_volumes_on_device
from tpu_mednet.inference.weighted import predict_volumes_weighted_on_device
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import create_train_state

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow

SHAPES = ((24, 24, 24), (17, 19, 23), (20, 24, 20), (24, 20, 17))


def make_reader(shapes=SHAPES):
    rng = np.random.default_rng(0)
    store = {"images": {}, "labels": {}}
    attrs = {"images": {}}
    for i, shape in enumerate(shapes):
        key = f"s{i}"
        img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
        store["images"][key] = img
        store["labels"][key] = np.zeros((1, *shape), dtype=np.uint8)
        attrs["images"][key] = {"affine": np.eye(4)}
    return MemoryReader(store, attrs)


def make_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    state = create_train_state(model, (2, 8, 8, 8, 1), 1e-3)
    return task, {"params": state.params}


def test_run_pipelined_depth_bounds_in_flight():
    in_flight = []
    max_seen = []

    def dispatch(i):
        in_flight.append(i)
        max_seen.append(len(in_flight))
        return (i,)

    done = []

    def finalize(i):
        in_flight.remove(i)
        done.append(i)

    run_pipelined([(i,) for i in range(10)], dispatch, finalize, depth=3)
    assert done == list(range(10))  # FIFO completion order preserved
    assert max(max_seen) == 4  # depth 3 in flight + the one being dispatched
    assert not in_flight


def test_round_robin_placement_single_path():
    devs, per_dev, depth = round_robin_placement({"w": jnp.ones(2)}, None)
    assert devs is None and per_dev is None and depth == 1


def test_round_robin_placement_devices():
    devices = jax.devices()
    assert len(devices) == 8  # conftest forces the 8-device virtual platform
    variables = {"w": jnp.ones((3,))}
    devs, per_dev, depth = round_robin_placement(variables, devices)
    assert depth == 8 and len(per_dev) == 8
    for d, v in zip(devs, per_dev):
        assert v["w"].devices() == {d}


def test_dp_device_stitch_matches_single_device():
    task, variables = make_task()
    kw = dict(patch_size=[8, 8, 8], patch_overlap=[2, 2, 2], batch_size=4)
    keys = [f"s{i}" for i in range(len(SHAPES))]
    single = predict_volumes_on_device(
        task, variables, None, keys, reader=make_reader(), **kw)
    multi = predict_volumes_on_device(
        task, variables, None, keys, reader=make_reader(),
        devices=jax.devices(), **kw)
    for k in keys:
        np.testing.assert_array_equal(np.asarray(single[k]), np.asarray(multi[k]))
        assert np.asarray(multi[k].attrs["affine"]).shape == (4, 4)


def test_dp_weighted_stitch_matches_single_device():
    task, variables = make_task()
    kw = dict(patch_size=[8, 8, 8], patch_overlap=[2, 2, 2], batch_size=4)
    keys = [f"s{i}" for i in range(len(SHAPES))]
    single = predict_volumes_weighted_on_device(
        task, variables, None, keys, reader=make_reader(), **kw)
    multi = predict_volumes_weighted_on_device(
        task, variables, None, keys, reader=make_reader(),
        devices=jax.devices(), **kw)
    for k in keys:
        np.testing.assert_array_equal(np.asarray(single[k]), np.asarray(multi[k]))


def test_placement_passthrough_reuses_resident_weights():
    """A prebuilt RoundRobinPlacement is reused as-is (no re-replication)."""
    from tpu_mednet.inference.common import RoundRobinPlacement

    devices = jax.devices()[:2]
    variables = {"w": jnp.ones((3,))}
    devs, per_dev, depth = round_robin_placement(variables, devices)
    placement = RoundRobinPlacement(devs, per_dev)
    devs2, per_dev2, depth2 = round_robin_placement(variables, placement)
    assert devs2 is devs and per_dev2 is per_dev and depth2 == 2
    for d, v in zip(devs2, per_dev2):
        assert v["w"].devices() == {d}


def test_dp_pipeline_accepts_placement():
    """Pipelines accept a RoundRobinPlacement for devices= (chunked CLI use)."""
    from tpu_mednet.inference.common import RoundRobinPlacement

    task, variables = make_task()
    kw = dict(patch_size=[8, 8, 8], patch_overlap=[2, 2, 2], batch_size=4)
    keys = [f"s{i}" for i in range(len(SHAPES))]
    devs, per_dev, _ = round_robin_placement(variables, jax.devices())
    placement = RoundRobinPlacement(devs, per_dev)
    single = predict_volumes_on_device(
        task, variables, None, keys, reader=make_reader(), **kw)
    multi = predict_volumes_on_device(
        task, variables, None, keys, reader=make_reader(),
        devices=placement, **kw)
    for k in keys:
        np.testing.assert_array_equal(np.asarray(single[k]), np.asarray(multi[k]))
