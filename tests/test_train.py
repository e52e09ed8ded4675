"""End-to-end training tests: the minimum slice (BASELINE config 1 analogue).

Tiny 2-level 8-channel U-Net overfitting one synthetic volume on CPU —
loss must drop, checkpoints must round-trip, resume must continue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tpu_mednet.data import MemoryReader, PatchSampler
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.ops.augment import AugmentConfig
from tpu_mednet.tasks import LandmarkTask, SegmentationTask
from tpu_mednet.train import (
    CheckpointManager,
    Trainer,
    create_train_state,
    load_for_inference,
    make_eval_step,
    make_train_step,
)


def make_reader(shape=(32, 32, 32), with_heatmaps=False, seed=0):
    rng = np.random.default_rng(seed)
    lbl = np.zeros((1, *shape), dtype=np.uint8)
    lbl[0, 8:20, 8:20, 8:20] = 1  # bright cube = class 1
    img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
    img[0, 8:20, 8:20, 8:20] += 2.0
    store = {"images": {"s": img}, "labels": {"s": lbl}}
    if with_heatmaps:
        hm = np.zeros((2, *shape), dtype=np.uint8)
        hm[0, 10:14, 10:14, 10:14] = 200
        hm[1, 16:20, 16:20, 16:20] = 200
        store["heatmaps"] = {"s": hm}
    return MemoryReader(store)


def tiny_model(out_channels, in_channels=1):
    return UNet3DBase(config=UNetConfig(
        in_channels=in_channels, out_channels=out_channels, f_maps=8,
        num_levels=2, block="residual", layer_order="cge", num_groups=4,
        dtype=jnp.float32,
    ))


def test_seg_overfit_loss_drops():
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=8,
                           patch_size=[16, 16, 16], reader=reader,
                           class_probabilities=[0.5, 0.5], seed=0)
    task = SegmentationTask(model=tiny_model(2), loss="DICE")
    train_step = make_train_step(task)
    state = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-2, seed=0)
    losses = []
    for epoch in range(6):
        for batch in sampler.batches(batch_size=2):
            batch = {"data": jnp.asarray(batch["data"]),
                     "label": jnp.asarray(batch["label"])}
            state, metrics = train_step(state, batch)
            losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"


def test_trainer_fit_and_metrics(tmp_path):
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2), loss="CE")
    trainer = Trainer(
        task, sampler, val_sampler=sampler, batch_size=2, max_epochs=2,
        learning_rate=1e-3, model_dir=str(tmp_path / "model"),
        log_dir=str(tmp_path / "logs"),
        augment=AugmentConfig(mirror_axes=(1, 2, 3)),
    )
    state = trainer.fit()
    assert int(state.step) == 2 * 2  # 2 epochs x 2 steps
    # metrics jsonl written with reference scalar names
    lines = (tmp_path / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    keys = set()
    for line in lines:
        import json
        keys |= set(json.loads(line).keys())
    assert "train_loss" in keys
    assert "val_loss" in keys
    assert "val_dice0" in keys and "val_dice1" in keys
    # checkpoint exists and restores
    mgr = CheckpointManager(tmp_path / "model")
    assert mgr.latest_step == 4
    template = create_train_state(task.model, trainer.sample_shape, 1e-3)
    restored, hparams = mgr.restore(template)
    assert int(restored.step) == 4
    mgr.close()


def test_resume_continues_from_checkpoint(tmp_path):
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2))
    model_dir = str(tmp_path / "model")
    t1 = Trainer(task, sampler, batch_size=2, max_epochs=1, model_dir=model_dir)
    t1.fit()
    t2 = Trainer(task, sampler, batch_size=2, max_epochs=1, model_dir=model_dir)
    t2.init_state(resume=model_dir)
    assert int(t2.state.step) == 2


def test_load_for_inference(tmp_path):
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=2,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2))
    model_dir = str(tmp_path / "model")
    Trainer(task, sampler, batch_size=2, max_epochs=1, model_dir=model_dir,
            hparams={"fmaps": 8}).fit()
    template = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-3)
    variables, hparams = load_for_inference(model_dir, template)
    assert "params" in variables
    assert hparams["fmaps"] == 8
    # public JSON-only hparams restore — no state template, no weights read
    mgr = CheckpointManager(model_dir)
    try:
        hp = mgr.restore_hparams()
        assert hp["fmaps"] == 8
        # format version auto-stamped at save time (upsample geometry tag)
        from tpu_mednet.train.checkpoint import CKPT_FORMAT
        assert hp["ckpt_format"] == CKPT_FORMAT
    finally:
        mgr.close()


def test_checkpoint_step_selection(tmp_path):
    """Explicit step restore (predict's prediction.checkpoint_step); a
    missing step fails fast listing the available steps."""
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2))
    model_dir = str(tmp_path / "model")
    Trainer(task, sampler, batch_size=2, max_epochs=2,
            model_dir=model_dir, hparams={"x": 1}).fit()
    mgr = CheckpointManager(model_dir)
    try:
        assert mgr.latest_step == 4
        template = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-3)
        restored, _ = mgr.restore(template, step=2)  # NOT latest
        assert int(restored.step) == 2
        assert mgr.restore_hparams(step=2)["x"] == 1
        with pytest.raises(FileNotFoundError, match="available steps"):
            mgr.restore_hparams(step=99)
    finally:
        mgr.close()
    variables, _ = load_for_inference(model_dir, template, step=2)
    assert "params" in variables


def test_ckpt_format_checks(tmp_path, caplog):
    import logging as _logging

    import pytest as _pytest

    from tpu_mednet.train.checkpoint import check_ckpt_format

    # legacy checkpoint (no tag): one warning, no failure
    with caplog.at_level(_logging.WARNING, logger="tpu_mednet.train.checkpoint"):
        check_ckpt_format({"fmaps": 8}, tmp_path)
    assert any("ckpt_format" in r.getMessage() for r in caplog.records)
    # newer-than-this-build format: refuse
    with _pytest.raises(ValueError, match="format 99"):
        check_ckpt_format({"ckpt_format": 99}, tmp_path)
    # current format: silent
    caplog.clear()
    with caplog.at_level(_logging.WARNING, logger="tpu_mednet.train.checkpoint"):
        check_ckpt_format({"ckpt_format": 2}, tmp_path)
        check_ckpt_format(None, tmp_path)
    assert not caplog.records


def test_restore_hparams_missing_sidecar(tmp_path):
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=2,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2))
    model_dir = str(tmp_path / "model")
    # no hparams= passed: checkpoint has no side-car
    Trainer(task, sampler, batch_size=2, max_epochs=1, model_dir=model_dir).fit()
    mgr = CheckpointManager(model_dir)
    try:
        assert mgr.restore_hparams() is None
    finally:
        mgr.close()


def test_best_checkpoint_tracking(tmp_path):
    """<model_dir>/best keeps exactly the lowest-val_loss step — the PL 0.9
    default ModelCheckpoint (monitor='val_loss', save_top_k=1) the reference
    gets implicitly from Trainer(...) (train_seg.py:122-131)."""
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2), loss="CE")
    model_dir = tmp_path / "model"
    trainer = Trainer(task, sampler, val_sampler=sampler, batch_size=2,
                      max_epochs=1, model_dir=str(model_dir),
                      hparams={"fmaps": [8, 16]})
    trainer.fit()
    assert trainer._best_value is not None
    first_best = trainer._best_value
    assert (model_dir / "best").exists()
    mgr = CheckpointManager(model_dir / "best")
    try:
        hp = mgr.restore_hparams()
        info = hp["_best_monitor"]
        assert info["metric"] == "val_loss"
        assert info["value"] == first_best
        assert info["step"] == mgr.latest_step == 2
        assert hp["fmaps"] == [8, 16]  # training hparams carried along
        # best/ is a REGULAR checkpoint dir: predict/export point at it
        template = create_train_state(task.model, trainer.sample_shape, 1e-3)
        restored, _ = mgr.restore(template)
        assert int(restored.step) == 2
    finally:
        mgr.close()

    # a worse val metric must NOT overwrite best/
    trainer.state = trainer.state.replace(step=trainer.state.step + 1)
    assert not trainer._maybe_save_best({"val_loss": first_best + 1.0})
    # a better one must
    assert trainer._maybe_save_best({"val_loss": first_best - 1.0})
    trainer._ckpt_best.wait()
    mgr = CheckpointManager(model_dir / "best")
    try:
        assert mgr.latest_step == 3
        assert mgr.restore_hparams()["_best_monitor"]["value"] == first_best - 1.0
    finally:
        mgr.close()

    # --resume continues best tracking across the boundary
    t2 = Trainer(task, sampler, val_sampler=sampler, batch_size=2,
                 max_epochs=2, model_dir=str(model_dir))
    t2.init_state(resume=str(model_dir))
    assert t2._best_value == first_best - 1.0

    # no val sampler / no model_dir: feature inert
    t3 = Trainer(task, sampler, batch_size=2, max_epochs=1)
    assert not t3.save_best
    assert not t3._maybe_save_best({"val_loss": 0.0})


def test_landmark_task_train_step():
    reader = make_reader(with_heatmaps=True)
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], heatmap_group="heatmaps",
                           reader=reader, seed=0)
    # 2 heatmaps + 2 classes = 4 output channels
    task = LandmarkTask(
        model=tiny_model(4), loss_regression_weight=[0.01, 0.01],
        loss_class="DICE",
    )
    train_step = make_train_step(task)
    eval_step = make_eval_step(task)
    state = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-3)
    batch = next(sampler.batches(batch_size=2))
    jbatch = {"data": jnp.asarray(batch["data"]), "label": jnp.asarray(batch["label"])}
    state, metrics = train_step(state, jbatch)
    assert {"train_loss", "class_loss", "regression_loss"} <= set(metrics)
    val = eval_step(state, jbatch)
    assert {"val_loss", "val_class_loss", "val_regression_loss",
            "val_dice0", "val_dice1"} <= set(val)


def test_batchnorm_state_updates():
    """'cbr' order exercises the BatchNorm mutable-state path."""
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="double", layer_order="cbr", dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="CE")
    state = create_train_state(model, (2, 8, 8, 8, 1), 1e-3)
    assert state.batch_stats is not None
    step = make_train_step(task)
    rng = np.random.default_rng(0)
    batch = {
        "data": jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(2, 8, 8, 8, 1)).astype(np.uint8)),
    }
    import jax
    before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, _ = step(state, batch)
    after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_landmark_coordinate_error():
    import jax.numpy as jnp
    from tpu_mednet.ops.heatmap import batched_gaussian_heatmaps
    from tpu_mednet.tasks.landmarks import landmark_coordinate_error

    true_c = jnp.asarray([[[4.0, 4.0, 4.0], [10.0, 10.0, 10.0]]])
    pred_c = jnp.asarray([[[4.0, 4.0, 7.0], [10.0, 10.0, 10.0]]])  # 3 off, 0 off
    true_hm = batched_gaussian_heatmaps(true_c, (16, 16, 16), 1.5)
    pred_hm = batched_gaussian_heatmaps(pred_c, (16, 16, 16), 1.5)
    err = float(landmark_coordinate_error(pred_hm, true_hm))
    assert abs(err - 1.5) < 1e-5  # mean of (3, 0)

    # absent landmark (all-zero GT heatmap) is excluded
    true_c2 = jnp.asarray([[[4.0, 4.0, 4.0], [-9999.0, -9999.0, -9999.0]]])
    true_hm2 = batched_gaussian_heatmaps(true_c2, (16, 16, 16), 1.5)
    err2 = float(landmark_coordinate_error(pred_hm, true_hm2))
    assert abs(err2 - 3.0) < 1e-5


def test_resume_epoch_accounting(tmp_path):
    """A resumed run trains to the ORIGINAL max_epochs total, not
    max_epochs additional epochs (PL resume_from_checkpoint semantics,
    reference train_seg.py:123-125)."""
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2))
    model_dir = str(tmp_path / "model")
    t1 = Trainer(task, sampler, batch_size=2, max_epochs=1, model_dir=model_dir)
    t1.fit()  # 1 epoch x 2 steps
    t2 = Trainer(task, sampler, batch_size=2, max_epochs=3, model_dir=model_dir)
    state = t2.fit(resume=model_dir)
    assert t2.start_epoch == 1
    assert int(state.step) == 3 * 2  # total, not 1 + 3 epochs


def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-fit: finish the in-flight step, checkpoint, exit cleanly;
    --resume then continues to the original max_epochs total."""
    import os
    import signal
    import threading

    from tpu_mednet.train.loop import PreemptionGuard

    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(2), loss="CE")
    model_dir = str(tmp_path / "model")

    trainer = Trainer(task, sampler, batch_size=2, max_epochs=50,
                      learning_rate=1e-3, model_dir=model_dir)
    handler_before = signal.getsignal(signal.SIGTERM)

    orig_epoch = trainer.train_epoch

    def epoch_then_sigterm(epoch):
        out = orig_epoch(epoch)
        if epoch == 1:  # preempt after 2 full epochs (4 steps)
            os.kill(os.getpid(), signal.SIGTERM)
            # the flag must flip before the next epoch's first step
        return out

    trainer.train_epoch = epoch_then_sigterm
    state = trainer.fit()  # must RETURN, not die
    preempt_step = int(state.step)
    assert 4 <= preempt_step < 100  # far short of max_epochs * 2

    # handler restored after fit
    assert signal.getsignal(signal.SIGTERM) == handler_before

    # checkpoint at the preempted step exists and resume continues from it
    trainer2 = Trainer(task, sampler, batch_size=2, max_epochs=3,
                       learning_rate=1e-3, model_dir=model_dir)
    state2 = trainer2.init_state(resume=model_dir)
    assert int(state2.step) == preempt_step

    # second signal during shutdown raises (escape hatch)
    with PreemptionGuard() as g:
        os.kill(os.getpid(), signal.SIGTERM)
        # deliver the first signal
        threading.Event().wait(0.01)
        assert g.triggered
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
            threading.Event().wait(0.05)


def test_fit_bit_deterministic_across_runs(tmp_path):
    # production reproducibility: two fresh runs with identical seeds,
    # samplers and config produce BIT-identical params — covering the
    # whole chain (sampler rng -> native/numpy batch path -> on-device
    # augmentation PRNG -> optimizer update)
    def run(tag):
        reader = make_reader()
        sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                               patch_size=[16, 16, 16], reader=reader,
                               class_probabilities=[0.5, 0.5], seed=7)
        task = SegmentationTask(model=tiny_model(2), loss="DICE")
        trainer = Trainer(
            task, sampler, batch_size=2, max_epochs=2, learning_rate=1e-3,
            seed=11, model_dir=str(tmp_path / f"m_{tag}"),
            augment=AugmentConfig(mirror_axes=(1, 2, 3), noise_sigma=0.05,
                                  elastic_sigma=1.5, rotate_deg=5.0),
        )
        return trainer.fit()

    s1, s2 = run("a"), run("b")
    assert int(s1.step) == int(s2.step) == 4
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    assert all(bool(jnp.array_equal(a, b))
               for a, b in zip(leaves1, leaves2))
