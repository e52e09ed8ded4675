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


def test_two_process_dp_training(tmp_path):
    with socket.socket() as s:  # pick a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append((p.returncode, out))
    results = {}
    for rc, out in outs:
        assert rc == 0, f"worker failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        _, pid, step, loss = line.split()
        results[int(pid)] = (int(step), float(loss))
    assert set(results) == {0, 1}
    # both processes saw the same global step count and the SAME global loss
    assert results[0][0] == results[1][0] == 2  # 1 epoch x 2 steps
    assert np.isfinite(results[0][1])
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)


def test_local_batch_size_single_process():
    from tpu_mednet.parallel.multihost import local_batch_size

    assert local_batch_size(4) == 4  # single process: identity


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
