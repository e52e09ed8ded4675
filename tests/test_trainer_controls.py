"""PL Trainer runtime-control parity: early stopping, val frequency, limits.

The reference gets these behaviors from ``pl.Trainer``
(`/root/reference/examples/train_seg.py:122-132`): EarlyStopping(monitor,
patience, min_delta, mode='min'), check_val_every_n_epoch, and the
percent-check epoch limits (here as absolute batch counts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader, PatchSampler
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import CheckpointManager, Trainer

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow


def make_reader(shape=(32, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    lbl = np.zeros((1, *shape), dtype=np.uint8)
    lbl[0, 8:20, 8:20, 8:20] = 1
    img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
    img[0, 8:20, 8:20, 8:20] += 2.0
    return MemoryReader({"images": {"s": img}, "labels": {"s": lbl}})


def make_sampler(samples=4, seed=0):
    return PatchSampler(None, ["s"], samples_per_subject=samples,
                        patch_size=[16, 16, 16], reader=make_reader(),
                        seed=seed)


def tiny_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=8, num_levels=2,
        block="residual", layer_order="cge", num_groups=4,
        dtype=jnp.float32,
    ))
    return SegmentationTask(model=model, loss="DICE")


def scripted_val(trainer, values):
    """Replace val_epoch with a script of val_loss values."""
    it = iter(values)
    trainer.val_epoch = lambda epoch: {"val_loss": next(it)}


def test_early_stopping_stops_on_plateau(tmp_path):
    # patience=2: epoch0 sets best, epoch1 improves, epochs 2-3 are stale
    # -> stop after epoch 3 (4 of 10 epochs; 2 steps/epoch)
    trainer = Trainer(tiny_task(), make_sampler(), val_sampler=make_sampler(),
                      batch_size=2, max_epochs=10, early_stop_patience=2,
                      model_dir=str(tmp_path / "m"))
    scripted_val(trainer, [1.0, 0.5, 0.5, 0.5] + [0.5] * 10)
    state = trainer.fit()
    assert int(state.step) == 4 * 2
    # the stop epoch is checkpointed even though checkpoint_every_epochs
    # already saved it (no duplicate save), and the step is restorable
    mgr = CheckpointManager(tmp_path / "m")
    assert mgr.latest_step == 8
    mgr.close()


def test_early_stopping_min_delta_counts_tiny_gains_as_stale():
    trainer = Trainer(tiny_task(), make_sampler(), val_sampler=make_sampler(),
                      batch_size=2, max_epochs=10, early_stop_patience=2,
                      early_stop_min_delta=0.1)
    # improvements of 0.01 are within min_delta -> stale from epoch 1 on
    scripted_val(trainer, [1.0, 0.99, 0.98, 0.97] + [0.9] * 10)
    state = trainer.fit()
    assert int(state.step) == 3 * 2  # epochs 1 and 2 stale -> stop at 3


def test_early_stopping_requires_val_set():
    with pytest.raises(ValueError, match="validation set"):
        Trainer(tiny_task(), make_sampler(), batch_size=2,
                early_stop_patience=3)


def test_check_val_every_n_epoch(tmp_path):
    trainer = Trainer(tiny_task(), make_sampler(), val_sampler=make_sampler(),
                      batch_size=2, max_epochs=4, check_val_every_n_epoch=2)
    calls = []
    orig = trainer.val_epoch
    trainer.val_epoch = lambda epoch: (calls.append(epoch), orig(epoch))[1]
    trainer.fit()
    assert calls == [1, 3]  # epochs 2 and 4 (1-based) only


def test_check_val_every_n_epoch_validates():
    with pytest.raises(ValueError, match="check_val_every_n_epoch"):
        Trainer(tiny_task(), make_sampler(), batch_size=2,
                check_val_every_n_epoch=0)


def test_limit_train_batches_caps_epoch():
    # 8 samples / batch 2 = 4 batches; cap at 2 -> 2 steps per epoch
    trainer = Trainer(tiny_task(), make_sampler(samples=8), batch_size=2,
                      max_epochs=2, limit_train_batches=2)
    assert trainer._steps_per_epoch == 2  # schedule horizon follows the cap
    state = trainer.fit()
    assert int(state.step) == 2 * 2


def test_limit_val_batches_caps_val_epoch():
    trainer = Trainer(tiny_task(), make_sampler(),
                      val_sampler=make_sampler(samples=8), batch_size=2,
                      max_epochs=1, limit_val_batches=1, log_interval=1,
                      sample_visualizer=None)
    seen = []
    trainer.sample_visualizer = lambda t, batch, epoch, i: seen.append(i)
    trainer.fit()
    assert seen == [0]  # only the first of 4 val batches ran


def test_cli_flags_reach_trainer(tmp_path, monkeypatch):
    """The train_seg CLI forwards the runtime-control flags."""
    import tpu_mednet.cli.train_seg as cli

    captured = {}

    class FakeTrainer:
        def __init__(self, *a, **kw):
            captured.update(kw)

        def fit(self, resume=None):
            return None

    # the CLI does `from tpu_mednet.train import Trainer` inside main()
    monkeypatch.setattr("tpu_mednet.train.Trainer", FakeTrainer)
    # build a minimal on-disk dataset the CLI can open
    import h5py

    data = tmp_path / "train.h5"
    with h5py.File(data, "w") as f:
        img = np.random.default_rng(0).normal(
            size=(1, 32, 32, 32)).astype(np.float32)
        lbl = np.zeros((1, 32, 32, 32), dtype=np.uint8)
        f.create_dataset("images/s", data=img)
        f.create_dataset("labels/s", data=lbl)
    keys = tmp_path / "keys.txt"
    keys.write_text("s\n")
    rc = cli.main([
        "--data_path", str(data), "--train_set", str(keys),
        "--patch_size", "16", "16", "16", "--batch_size", "2",
        "--max_epochs", "1", "--no_bf16", "--fmaps", "8",
        "--out_channels", "2",
        "--model_dir", str(tmp_path / "model"),
        "--early_stop_patience", "0",
        "--check_val_every_n_epoch", "3",
        "--limit_train_batches", "5", "--limit_val_batches", "2",
        "--nonfinite", "skip",
        "--track_grad_norm",
    ])
    assert rc == 0
    assert captured["check_val_every_n_epoch"] == 3
    assert captured["limit_train_batches"] == 5
    assert captured["limit_val_batches"] == 2
    assert captured["nonfinite"] == "skip"
    assert captured["track_grad_norm"] is True


def test_track_grad_norm_metric():
    # grad_norm = pre-clip global L2 norm of the gradients, matching a
    # manual value_and_grad of the same loss; absent by default
    import optax
    from tpu_mednet.train import create_train_state, make_train_step

    task = tiny_task()
    model = task.model
    state = create_train_state(model, (2, 16, 16, 16, 1), 1e-2, seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "data": jnp.asarray(
            rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, 2, size=(2, 16, 16, 16, 1)).astype(np.uint8)),
    }

    _, plain = make_train_step(task, donate=False)(state, batch)
    assert "grad_norm" not in plain

    _, metrics = make_train_step(task, donate=False,
                                 track_grad_norm=True)(state, batch)

    def loss_fn(params):
        outputs = model.apply({"params": params}, batch["data"], train=True)
        return task.loss_fn(outputs, batch)[0]

    want = float(optax.global_norm(jax.grad(loss_fn)(state.params)))
    got = float(metrics["grad_norm"])
    assert got > 0 and np.isclose(got, want, rtol=1e-5), (got, want)


def test_keep_checkpoints_retention(tmp_path):
    # keep_checkpoints=1: after 3 epochs only the newest resumable step
    # survives (the best-val checkpoint lives separately under /best)
    trainer = Trainer(tiny_task(), make_sampler(), batch_size=2,
                      max_epochs=3, keep_checkpoints=1,
                      model_dir=str(tmp_path / "m"))
    trainer.fit()
    mgr = CheckpointManager(tmp_path / "m")
    assert mgr.available_steps == [6]  # 3 epochs x 2 steps, newest only
    mgr.close()

    with pytest.raises(ValueError, match="keep_checkpoints"):
        Trainer(tiny_task(), make_sampler(), batch_size=2,
                keep_checkpoints=0)
