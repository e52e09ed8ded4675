"""Multi-host (2-process) input pipeline + dp training test.

Spawns two REAL processes, each with 2 virtual CPU devices, connected via
``jax.distributed`` (Gloo): each process samples only its subject-key
shard, contributes its rows to the global batch via
``jax.make_array_from_process_local_data`` (inside ``device_prefetch``),
and runs the shared dp train step over the 4-device global mesh — the
multi-host story of SURVEY §5.8 / BASELINE config 5, which the reference
delegates entirely to pytorch-lightning (`examples/train_seg.py:126`).
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpu_mednet.parallel.multihost import maybe_initialize_distributed
    assert maybe_initialize_distributed()  # env-var driven, as in the CLIs
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from tpu_mednet.data import MemoryReader, PatchSampler
    from tpu_mednet.models import UNet3DBase, UNetConfig
    from tpu_mednet.parallel.mesh import make_mesh, shard_subject_keys
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import Trainer

    # global key list; this process loads/samples only its shard
    all_keys = ["s0", "s1"]
    keys = shard_subject_keys(all_keys)
    assert keys == [all_keys[pid]], keys

    def make_volume(key):  # deterministic per key, independent of process
        rng = np.random.default_rng(abs(hash(key)) % (2**31))
        img = rng.normal(0, 0.1, size=(1, 16, 16, 16)).astype(np.float32)
        lbl = np.zeros((1, 16, 16, 16), dtype=np.uint8)
        lbl[0, 4:12, 4:12, 4:12] = 1
        img[0, 4:12, 4:12, 4:12] += 2.0
        return img, lbl

    store = {"images": {}, "labels": {}}
    for k in keys:
        store["images"][k], store["labels"][k] = make_volume(k)
    sampler = PatchSampler(None, keys, samples_per_subject=4,
                           patch_size=[8, 8, 8],
                           reader=MemoryReader(store), seed=pid)

    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="residual", layer_order="cge", num_groups=2,
        dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    mesh = make_mesh(n_data=4)  # global mesh over both processes' devices
    trainer = Trainer(task, sampler, batch_size=4, max_epochs=1,
                      learning_rate=1e-3, mesh=mesh, seed=0)
    assert trainer.local_batch_size == 2  # 4 global / 2 processes
    state = trainer.fit()
    # loss of one more global step, pulled identically on both processes
    n_steps = int(state.step)  # read BEFORE the donated train_step deletes it
    from tpu_mednet.data.prefetch import device_prefetch
    batch = next(iter(
        device_prefetch(sampler.batches(2), sharding=trainer._batch_sharding)
    ))
    _, metrics = trainer.train_step(state, {"data": batch["data"],
                                            "label": batch["label"]})
    print("RESULT", pid, n_steps, float(metrics["train_loss"]),
          flush=True)
    """
)


def _run_workers(tmp_path, script, n=2, timeout=600):
    with socket.socket() as s:  # pick a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(script)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append((p.returncode, out))
    results = {}
    for rc, out in outs:
        assert rc == 0, f"worker failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        parts = line.split()
        results[int(parts[1])] = tuple(float(v) for v in parts[2:])
    assert set(results) == set(range(n))
    return results


def test_two_process_dp_training(tmp_path):
    results = _run_workers(tmp_path, WORKER)
    # both processes saw the same global step count and the SAME global loss
    assert int(results[0][0]) == int(results[1][0]) == 2  # 1 epoch x 2 steps
    assert np.isfinite(results[0][1])
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)


WORKER_SP = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpu_mednet.parallel.multihost import maybe_initialize_distributed
    assert maybe_initialize_distributed()
    assert len(jax.devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from tpu_mednet.data import MemoryReader, PatchSampler
    from tpu_mednet.data.prefetch import device_prefetch
    from tpu_mednet.models import UNet3DBase, UNetConfig
    from tpu_mednet.parallel.mesh import make_mesh, shard_subject_keys
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import Trainer, create_train_state

    keys = shard_subject_keys(["s0", "s1"])

    def make_volume(key):
        rng = np.random.default_rng(abs(hash(key)) % (2**31))
        img = rng.normal(0, 0.1, size=(1, 16, 16, 16)).astype(np.float32)
        lbl = np.zeros((1, 16, 16, 16), dtype=np.uint8)
        lbl[0, 4:12, 4:12, 4:12] = 1
        img[0, 4:12, 4:12, 4:12] += 2.0
        return img, lbl

    store = {"images": {}, "labels": {}}
    for k in keys:
        store["images"][k], store["labels"][k] = make_volume(k)
    sampler = PatchSampler(None, keys, samples_per_subject=4,
                           patch_size=[8, 8, 8],
                           reader=MemoryReader(store), seed=pid)

    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="residual", layer_order="cge", num_groups=2,
        dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    # dp x sp: 2 data rows (one per process) x 2 spatial shards (in-process)
    mesh = make_mesh(n_data=2, n_space=2)
    trainer = Trainer(task, sampler, batch_size=4, max_epochs=1,
                      learning_rate=1e-3, mesh=mesh, seed=0)
    assert trainer.local_batch_size == 2
    state = trainer.fit()  # full loop over the dp x sp mesh: no deadlock
    n_steps = int(state.step)

    # deterministic fixed global batch -> exact numerics vs one device
    rng = np.random.default_rng(123)
    gdata = rng.normal(0, 1, (4, 8, 8, 8, 1)).astype(np.float32)
    glabel = (rng.random((4, 8, 8, 8, 1)) < 0.3).astype(np.uint8)
    local = {"data": gdata[pid * 2:(pid + 1) * 2],
             "label": glabel[pid * 2:(pid + 1) * 2]}
    batch = next(iter(device_prefetch(
        iter([local]), sharding=trainer._batch_sharding
    )))
    assert batch["data"].shape == (4, 8, 8, 8, 1)  # GLOBAL dp x sp array
    state2 = jax.device_put(
        create_train_state(model, (4, 8, 8, 8, 1), 1e-3, seed=0),
        trainer._replicated,
    )
    _, metrics = trainer.train_step(
        state2, {"data": batch["data"], "label": batch["label"]}
    )
    print("RESULT", pid, n_steps, float(metrics["train_loss"]), flush=True)
    """
)


def test_two_process_spatial_training(tmp_path):
    """dp x sp ACROSS processes: rows over 'data', patch-X over 'space',
    assembled with make_array_from_process_local_data (VERDICT round-2 #3:
    the former NotImplementedError guard, SURVEY §5.8 / BASELINE config 5).
    The fixed-batch loss must equal the single-device value."""
    results = _run_workers(tmp_path, WORKER_SP)
    assert int(results[0][0]) == int(results[1][0]) == 2
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)

    # single-device reference on the SAME deterministic batch
    import jax
    import jax.numpy as jnp

    from tpu_mednet.models import UNet3DBase, UNetConfig
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import create_train_state
    from tpu_mednet.train.step import make_train_step

    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="residual", layer_order="cge", num_groups=2,
        dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    rng = np.random.default_rng(123)
    gdata = rng.normal(0, 1, (4, 8, 8, 8, 1)).astype(np.float32)
    glabel = (rng.random((4, 8, 8, 8, 1)) < 0.3).astype(np.uint8)
    state = create_train_state(model, (4, 8, 8, 8, 1), 1e-3, seed=0)
    step = make_train_step(task, donate=False)
    _, metrics = step(state, {"data": jnp.asarray(gdata),
                              "label": jnp.asarray(glabel)})
    ref_loss = float(metrics["train_loss"])
    assert results[0][1] == pytest.approx(ref_loss, rel=1e-5)


def test_local_batch_size_single_process():
    from tpu_mednet.parallel.multihost import local_batch_size

    assert local_batch_size(4) == 4  # single process: identity


def test_shard_subject_keys_equalizes_shares(caplog):
    """Uneven key counts are truncated to an equal per-process share —
    unequal per-host epoch lengths would deadlock the collectives."""
    import logging

    from tpu_mednet.parallel.mesh import shard_subject_keys

    keys = [f"s{i}" for i in range(7)]
    with caplog.at_level(logging.WARNING, logger="tpu_mednet.parallel.mesh"):
        shards = [shard_subject_keys(keys, process_index=p, process_count=3)
                  for p in range(3)]
    # every process gets exactly 2 keys; s6 is dropped, no overlaps
    assert [len(s) for s in shards] == [2, 2, 2]
    flat = [k for s in shards for k in s]
    assert sorted(flat) == [f"s{i}" for i in range(6)]
    assert any("dropping 1 of 7" in r.getMessage() for r in caplog.records)
    # even split: untouched, no warning
    caplog.clear()
    shards = [shard_subject_keys(keys[:6], process_index=p, process_count=3)
              for p in range(3)]
    assert [len(s) for s in shards] == [2, 2, 2]
    assert not caplog.records
    # fewer keys than processes: a zero share must raise, not silently
    # turn the epoch into a no-op
    import pytest
    with pytest.raises(ValueError, match="0"):
        shard_subject_keys(keys[:2], process_index=0, process_count=3)


def test_assemble_global_array_single_process():
    import jax.numpy as jnp
    from tpu_mednet.parallel.mesh import batch_sharding, make_mesh
    from tpu_mednet.parallel.multihost import assemble_global_batch

    mesh = make_mesh(n_data=8)
    sh = batch_sharding(mesh)
    batch = {"data": np.arange(16, dtype=np.float32).reshape(8, 2),
             "label": np.ones((8, 2), np.uint8), "subject_key": ["a"] * 8}
    out = assemble_global_batch(batch, sh)
    assert out["subject_key"] == ["a"] * 8  # non-arrays pass through
    np.testing.assert_array_equal(np.asarray(out["data"]), batch["data"])
    assert out["data"].sharding == sh


def test_maybe_initialize_distributed_noop(monkeypatch):
    from tpu_mednet.parallel import multihost

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_MEDNET_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.maybe_initialize_distributed() is False
