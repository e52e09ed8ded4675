"""Whole-volume spatially-sharded inference tests (8 virtual CPU devices)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.inference.spatial import predict_volume_spatial, receptive_halo
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.parallel.mesh import make_mesh, shard_subject_keys
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import create_train_state

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow


def make_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    state = create_train_state(model, (1, 16, 16, 16, 1), 1e-3, seed=0)
    return task, {"params": state.params}


def test_receptive_halo_monotonic():
    assert receptive_halo(2) < receptive_halo(3) < receptive_halo(5)


def test_spatial_auto_matches_single_device():
    task, variables = make_task()
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(1, 64, 16, 16)).astype(np.float32)

    import jax
    x = jnp.asarray(np.moveaxis(vol, 0, -1)[None])
    ref = np.asarray(task.predict_postprocess(
        task.model.apply(variables, x, train=False)
    ))[0]
    ref = np.moveaxis(ref, -1, 0)

    mesh = make_mesh(n_data=1, n_space=8)
    out = predict_volume_spatial(task, variables, vol, mesh, mode="auto")
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (1, 64, 16, 16)


def test_spatial_auto_pads_odd_x():
    task, variables = make_task()
    vol = np.random.default_rng(1).normal(size=(1, 50, 16, 16)).astype(np.float32)
    mesh = make_mesh(n_data=1, n_space=8)
    out = predict_volume_spatial(task, variables, vol, mesh, mode="auto")
    assert out.shape == (1, 50, 16, 16)


def test_spatial_tta_matches_single_device():
    """Whole-volume mirror TTA over the sharded mesh == the single-device
    postprocess(tta_split_activations) oracle (incl. a flip of the sharded
    X axis under GSPMD auto mode)."""
    from tpu_mednet.inference.common import (
        postprocess_activations,
        tta_split_activations,
    )

    task, variables = make_task()
    rng = np.random.default_rng(5)
    vol = rng.normal(size=(1, 64, 16, 16)).astype(np.float32)
    flips = (0, 2)  # axis 0 is the sharded one

    x = jnp.asarray(np.moveaxis(vol, 0, -1)[None])
    ref = np.asarray(postprocess_activations(
        task, tta_split_activations(task, variables, x, flips)
    ))[0]
    ref = np.moveaxis(ref, -1, 0)

    mesh = make_mesh(n_data=1, n_space=8)
    out = predict_volume_spatial(task, variables, vol, mesh, mode="auto",
                                 tta_flips=flips)
    np.testing.assert_array_equal(out, ref)

    # explicit halo mode refuses the sharded axis, accepts unsharded ones
    with pytest.raises(ValueError, match="sharded X axis"):
        predict_volume_spatial(task, variables, vol, mesh, mode="explicit",
                               halo=4, tta_flips=(0,))
    out2 = predict_volume_spatial(task, variables, vol, mesh,
                                  mode="explicit", halo=4, tta_flips=(2,))
    assert out2.shape == (1, 64, 16, 16)


def test_spatial_explicit_runs():
    task, variables = make_task()
    vol = np.random.default_rng(2).normal(size=(1, 64, 16, 16)).astype(np.float32)
    mesh = make_mesh(n_data=1, n_space=8)
    out = predict_volume_spatial(task, variables, vol, mesh, mode="explicit",
                                 halo=4)
    assert out.shape == (1, 64, 16, 16)
    assert set(np.unique(out)) <= {0, 1}


def test_shard_subject_keys():
    keys = [f"k{i}" for i in range(10)]
    # uneven 10 / 4: truncated to 8 so every process gets an EQUAL share
    # (unequal per-host epoch lengths would deadlock the collectives)
    s0 = shard_subject_keys(keys, process_index=0, process_count=4)
    s3 = shard_subject_keys(keys, process_index=3, process_count=4)
    assert s0 == ["k0", "k4"]
    assert s3 == ["k3", "k7"]
    all_keys = sorted(sum(
        [shard_subject_keys(keys, i, 4) for i in range(4)], []
    ))
    assert all_keys == sorted(keys[:8])
    # even split keeps every key
    all_even = sorted(sum(
        [shard_subject_keys(keys[:8], i, 4) for i in range(4)], []
    ))
    assert all_even == sorted(keys[:8])
    # single host = identity
    assert shard_subject_keys(keys, 0, 1) == keys


def test_data_parallel_inference_matches_single_device():
    """predict_volumes with an 8-way data mesh must match 1-device output."""
    from tpu_mednet.data import MemoryReader
    from tpu_mednet.inference.sliding_window import predict_volumes

    task, variables = make_task()
    rng = np.random.default_rng(3)
    store = {"images": {"k": rng.normal(size=(1, 24, 24, 24)).astype(np.float32)}}

    def run(mesh):
        reader = MemoryReader(store)
        return np.asarray(predict_volumes(
            task, variables, None, ["k"], patch_size=[8, 8, 8],
            patch_overlap=[2, 2, 2], batch_size=8, reader=reader, mesh=mesh,
        )["k"])

    single = run(None)
    dp = run(make_mesh(n_data=8))
    np.testing.assert_array_equal(single, dp)

    # batch not divisible by mesh -> clean error
    reader = MemoryReader(store)
    with pytest.raises(ValueError):
        predict_volumes(task, variables, None, ["k"], patch_size=[8, 8, 8],
                        patch_overlap=[2, 2, 2], batch_size=3, reader=reader,
                        mesh=make_mesh(n_data=8))


def test_spatial_explicit_matches_contract_oracle():
    """Value equivalence of the explicit-halo path for a pooled U-Net.

    The documented contract (parallel/halo.py:85-89): with halo >= the
    receptive-field reach, the sharded result equals
    ``crop(fn(zero_pad(volume, halo)), halo)`` computed unsharded, EXACTLY.
    A norm-free config is used because GroupNorm statistics are global
    (local per-shard stats diverge by design in explicit mode; the 'auto'
    GSPMD mode covers GN exactly via inserted collectives, tested above).
    A too-small halo must break equality (negative control), validating
    that receptive_halo's bound is doing real work.
    """
    import jax
    from tpu_mednet.parallel.halo import spatially_sharded_apply
    from tpu_mednet.parallel.mesh import spatial_sharding

    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="residual", layer_order="cr", dtype=jnp.float32,
    ))
    state = create_train_state(model, (1, 16, 16, 16, 1), 1e-3, seed=0)
    variables = {"params": state.params}

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 64, 16, 16, 1)).astype(np.float32))

    def fwd(v):
        return model.apply(variables, v, train=False)

    pool = 2  # 2 levels -> one 2x pooling
    mesh = make_mesh(n_data=1, n_space=2)

    def oracle(halo):
        padded = jnp.pad(x, [(0, 0), (halo, halo), (0, 0), (0, 0), (0, 0)])
        out = fwd(padded)
        return np.asarray(out[:, halo:out.shape[1] - halo])

    def sharded(halo):
        xs = jax.device_put(x, spatial_sharding(mesh, axis=1))
        f = spatially_sharded_apply(fwd, mesh, halo=halo, spatial_axis=1)
        return np.asarray(jax.jit(f)(xs))

    halo = receptive_halo(2)  # 18, a multiple of pool already
    assert halo % pool == 0 and halo < 32  # fits in a 32-wide shard
    np.testing.assert_array_equal(sharded(halo), oracle(halo))

    # negative control: a 1-conv-deep halo cannot cover the pooled reach
    small = pool  # 2
    assert np.any(sharded(small) != oracle(small))
