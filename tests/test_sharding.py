"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader, PatchSampler
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.parallel import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import Trainer, create_train_state, make_train_step

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow


def tiny_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="residual", layer_order="cge", num_groups=2, dtype=jnp.float32,
    ))
    return SegmentationTask(model=model, loss="DICE")


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "space": 1}
    mesh = make_mesh(n_data=4, n_space=2)
    assert mesh.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=16)


def test_batch_is_sharded_over_data_axis():
    mesh = make_mesh()
    batch = {"data": np.zeros((8, 4, 4, 4, 1), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["data"].sharding.device_set) == 8


def test_data_parallel_train_step_matches_single_device():
    """The dp train step on 8 devices must match the 1-device result."""
    task = tiny_task()
    rng = np.random.default_rng(0)
    batch_np = {
        "data": rng.normal(size=(8, 8, 8, 8, 1)).astype(np.float32),
        "label": rng.integers(0, 2, size=(8, 8, 8, 8, 1)).astype(np.uint8),
    }

    def run(mesh):
        state = create_train_state(task.model, (8, 8, 8, 8, 1), 1e-2, seed=0)
        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(task, donate=False)
        batch = shard_batch(batch_np, mesh)
        losses = []
        for _ in range(3):
            state, m = step(state, batch)
            losses.append(float(m["train_loss"]))
        return losses, state

    losses_8, state_8 = run(make_mesh())
    losses_1, state_1 = run(make_mesh(n_data=1))
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)
    p8 = jax.tree_util.tree_leaves(state_8.params)[0]
    p1 = jax.tree_util.tree_leaves(state_1.params)[0]
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=2e-5)


def test_trainer_on_8_device_mesh():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 24, 24, 24)).astype(np.float32)
    lbl = (img > 0.5).astype(np.uint8)
    reader = MemoryReader({"images": {"s": img}, "labels": {"s": lbl}})
    sampler = PatchSampler(None, ["s"], samples_per_subject=16,
                           patch_size=[8, 8, 8], reader=reader, seed=0)
    task = tiny_task()
    trainer = Trainer(task, sampler, batch_size=8, max_epochs=1,
                      mesh=make_mesh())
    state = trainer.fit()
    assert int(state.step) == 2  # 16 samples / batch 8


def test_spatial_sharding_forward_consistent():
    """Forward with a spatially-sharded input must match the replicated one
    (XLA inserts halo exchanges for the convs automatically under jit)."""
    mesh = make_mesh(n_data=1, n_space=8)
    task = tiny_task()
    x = np.random.default_rng(2).normal(size=(1, 32, 16, 16, 1)).astype(np.float32)
    state = create_train_state(task.model, (1, 32, 16, 16, 1), 1e-3, seed=0)

    fwd = jax.jit(lambda p, x: task.model.apply({"params": p}, x, train=False))
    y_ref = np.asarray(fwd(state.params, jnp.asarray(x)))

    xs = jax.device_put(x, spatial_sharding(mesh, axis=1))
    y_sharded = np.asarray(fwd(state.params, xs))
    np.testing.assert_allclose(y_ref, y_sharded, atol=1e-4)


def test_spatial_partitioned_train_step_matches_single_device():
    """dp x sp TRAIN step (2 data x 4 space) == the 1-device numerics.

    Shards batch AND patch-X over the mesh via train_batch_sharding; XLA
    must insert conv halo exchanges and GN/loss reductions in forward AND
    backward.  Includes mirror augmentation (flips of the sharded axis
    become collective permutes)."""
    from tpu_mednet.ops.augment import AugmentConfig
    from tpu_mednet.parallel.mesh import train_batch_sharding

    task = tiny_task()
    rng = np.random.default_rng(3)
    batch_np = {
        "data": rng.normal(size=(4, 16, 8, 8, 1)).astype(np.float32),
        "label": rng.integers(0, 2, size=(4, 16, 8, 8, 1)).astype(np.uint8),
    }
    augment = AugmentConfig(mirror_axes=(1, 2, 3))

    def run(mesh):
        state = create_train_state(task.model, (4, 16, 8, 8, 1), 1e-2, seed=0)
        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(task, augment=augment, donate=False)
        sharding = train_batch_sharding(mesh)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch_np
        )
        losses = []
        for _ in range(3):
            state, m = step(state, batch)
            losses.append(float(m["train_loss"]))
        return losses, state

    losses_sp, state_sp = run(make_mesh(n_data=2, n_space=4))
    losses_1, state_1 = run(make_mesh(n_data=1, n_space=1,
                                      devices=jax.devices()[:1]))
    np.testing.assert_allclose(losses_sp, losses_1, rtol=2e-4)
    p_sp = jax.tree_util.tree_leaves(state_sp.params)[0]
    p_1 = jax.tree_util.tree_leaves(state_1.params)[0]
    np.testing.assert_allclose(np.asarray(p_sp), np.asarray(p_1), atol=2e-5)


def test_trainer_spatial_mesh_validation():
    """Trainer rejects sp meshes with indivisible patch-X or device samplers."""
    task = tiny_task()
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 24, 24, 24)).astype(np.float32)
    reader = MemoryReader({"images": {"s": img},
                           "labels": {"s": (img > 0.5).astype(np.uint8)}})
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[9, 8, 8], reader=reader, seed=0)
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(task, sampler, batch_size=2, mesh=make_mesh(n_data=2, n_space=4))


def test_multitask_data_parallel_train_step():
    """BASELINE config 5 shape: joint seg+landmark multitask, dp mesh."""
    from tpu_mednet.tasks import LandmarkTask

    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=4, f_maps=4, num_levels=2,
        block="residual", layer_order="cge", num_groups=2, dtype=jnp.float32,
    ))
    task = LandmarkTask(model=model, loss_regression_weight=[0.01, 0.01])
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    batch = shard_batch({
        "data": rng.normal(size=(8, 8, 8, 8, 1)).astype(np.float32),
        # 2 heatmap channels + class map last
        "label": rng.integers(0, 2, size=(8, 8, 8, 8, 3)).astype(np.uint8),
    }, mesh)
    state = create_train_state(task.model, (8, 8, 8, 8, 1), 1e-3)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(task, donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train_loss"]))
    assert {"class_loss", "regression_loss"} <= set(metrics)
