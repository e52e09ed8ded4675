"""Non-finite protection: the on-device update gate and the host policies.

Production robustness the reference lacks (PL's ``terminate_on_nan`` is the
closest analogue): a NaN/Inf loss or gradient must never reach the params.
The gate lives inside the jit'd step (``make_train_step(guard_nonfinite=)``,
train/step.py) so detection costs no per-step host sync; the Trainer policy
('skip' logs the per-epoch count, 'terminate' checkpoints clean params and
raises) is tested through real inf-contaminated datasets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader, PatchSampler
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import (

    CheckpointManager,
    NonFiniteError,
    Trainer,
    create_train_state,
    make_train_step,
)


# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow

def tiny_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=8, num_levels=2,
        block="residual", layer_order="cge", num_groups=4,
        dtype=jnp.float32,
    ))
    return SegmentationTask(model=model, loss="DICE")


def make_batch(bad: bool, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    if bad:
        data[0, 4:8] = np.inf
    label = rng.integers(0, 2, size=(2, 16, 16, 16, 1)).astype(np.uint8)
    return {"data": jnp.asarray(data), "label": jnp.asarray(label)}


def tree_equal(a, b):
    return all(
        bool(jnp.array_equal(x, y))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )


def tree_finite(t):
    return all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(t))


def test_guarded_step_skips_nonfinite_and_applies_finite():
    task = tiny_task()
    state = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-2, seed=0)
    step = make_train_step(task, guard_nonfinite=True, donate=False)

    # a batch with inf voxels: loss/grads go non-finite -> update skipped
    before = jax.tree_util.tree_map(jnp.copy, state.params)
    new_state, metrics = step(state, make_batch(bad=True))
    assert float(metrics["nonfinite"]) == 1.0
    assert tree_equal(new_state.params, before)
    assert int(new_state.step) == int(state.step)  # optax count untouched
    # the PRNG still advanced (next batch draws fresh augmentation noise)
    assert not bool(jnp.array_equal(new_state.rng, state.rng))

    # a clean batch through the SAME jitted step applies normally
    new_state2, metrics2 = step(new_state, make_batch(bad=False))
    assert float(metrics2["nonfinite"]) == 0.0
    assert not tree_equal(new_state2.params, before)
    assert int(new_state2.step) == int(state.step) + 1
    assert tree_finite(new_state2.params)


def test_unguarded_step_poisons_params():
    # the hazard the gate exists for: without it the inf batch NaNs the
    # params in one step (also proves the fixture really produces
    # non-finite gradients, so the guarded tests test something)
    task = tiny_task()
    state = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-2, seed=0)
    step = make_train_step(task, donate=False)
    new_state, metrics = step(state, make_batch(bad=True))
    assert "nonfinite" not in metrics  # default metrics unchanged
    assert not tree_finite(new_state.params)


def _readers(all_bad: bool):
    """One clean subject and (optionally) one inf-contaminated subject."""
    rng = np.random.default_rng(0)
    shape = (16, 16, 16)
    clean = rng.normal(size=(1, *shape)).astype(np.float32)
    bad = clean.copy()
    bad[0, 4:8] = np.inf
    lbl = np.zeros((1, *shape), dtype=np.uint8)
    lbl[0, 4:12, 4:12, 4:12] = 1
    if all_bad:
        images = {"a": bad, "b": bad.copy()}
    else:
        images = {"a": clean, "b": bad}
    return MemoryReader({
        "images": images,
        "labels": {"a": lbl, "b": lbl.copy()},
    })


def _sampler(all_bad: bool, samples=4):
    # patch == volume: every patch of subject 'b' contains the inf block
    return PatchSampler(None, ["a", "b"], samples_per_subject=samples,
                        patch_size=[16, 16, 16], reader=_readers(all_bad),
                        seed=0)


def test_trainer_skip_survives_bad_subject(tmp_path, caplog):
    # batch_size=1 -> every sample from subject 'b' is a skipped step and
    # every sample from 'a' applies; the epoch completes, params stay finite
    import logging

    trainer = Trainer(tiny_task(), _sampler(all_bad=False), batch_size=1,
                      max_epochs=1, nonfinite="skip",
                      log_dir=str(tmp_path / "logs"))
    with caplog.at_level(logging.WARNING):
        state = trainer.fit()
    assert tree_finite(state.params)
    # 8 samples: 4 clean applied, 4 inf skipped
    assert int(state.step) == 4
    assert any("updates were skipped" in r.message for r in caplog.records)
    # the skip count lands in the metrics log
    jsonl = (tmp_path / "logs" / "metrics.jsonl").read_text()
    assert "nonfinite_steps" in jsonl


def test_trainer_skip_raises_when_whole_epoch_is_bad(tmp_path):
    trainer = Trainer(tiny_task(), _sampler(all_bad=True), batch_size=2,
                      max_epochs=1, nonfinite="skip",
                      model_dir=str(tmp_path / "m"))
    with pytest.raises(NonFiniteError, match="non-finite"):
        trainer.fit()


def test_trainer_terminate_checkpoints_clean_params(tmp_path):
    trainer = Trainer(tiny_task(), _sampler(all_bad=False), batch_size=1,
                      max_epochs=2, nonfinite="terminate",
                      model_dir=str(tmp_path / "m"))
    with pytest.raises(NonFiniteError, match="terminate"):
        trainer.fit()
    # the checkpoint written at the raise holds only finite params
    mgr = CheckpointManager(tmp_path / "m")
    assert mgr.latest_step is not None
    task = tiny_task()
    template = create_train_state(task.model, (1, 16, 16, 16, 1), 1e-2)
    restored, _ = mgr.restore(template)
    mgr.close()
    assert tree_finite(restored.params)


def test_trainer_rejects_unknown_policy():
    with pytest.raises(ValueError, match="off/skip/terminate"):
        Trainer(tiny_task(), _sampler(all_bad=False), batch_size=1,
                nonfinite="explode")


def test_cli_terminate_exits_clean(tmp_path, caplog):
    # the CLI converts NonFiniteError into a logged error + rc=3 (no
    # traceback); the checkpoint written at the stop restores finite
    import logging

    h5py = pytest.importorskip("h5py")
    from tpu_mednet.cli.train_seg import main as train_seg_main

    rng = np.random.default_rng(0)
    shape = (16, 16, 16)
    with h5py.File(tmp_path / "data.h5", "w") as hf:
        img = rng.normal(size=(1, *shape)).astype(np.float32)
        img[0, 4:8] = np.inf
        lbl = np.zeros((1, *shape), dtype=np.uint8)
        lbl[0, 4:12, 4:12, 4:12] = 1
        hf.create_dataset("images/s0", data=img)
        hf.create_dataset("labels/s0", data=lbl)
    (tmp_path / "train.txt").write_text("s0\n")

    with caplog.at_level(logging.ERROR):
        rc = train_seg_main([
            "--data_path", str(tmp_path / "data.h5"),
            "--train_set", str(tmp_path / "train.txt"),
            "--model_dir", str(tmp_path / "model"),
            "--log_dir", str(tmp_path / "logs"),
            "--patch_size", "16", "16", "16",
            "--patches_per_subject", "2",
            "--max_epochs", "2", "--batch_size", "2",
            "--fmaps", "4", "--out_channels", "2",
            "--loss", "CE", "--no_bf16",
            "--nonfinite", "terminate",
        ])
    assert rc == 3
    assert any("training stopped" in r.message for r in caplog.records)


def test_duplicate_step_save_keeps_nonfinite_error(tmp_path):
    # regression: a fully non-finite run leaves state.step where a previous
    # save already put a checkpoint; the terminate-path save then collided
    # with orbax's duplicate-step ValueError, masking NonFiniteError (and
    # the CLI's clean rc=3 exit)
    kwargs = dict(batch_size=2, max_epochs=2, nonfinite="skip",
                  model_dir=str(tmp_path / "m"))
    with pytest.raises(NonFiniteError):
        Trainer(tiny_task(), _sampler(all_bad=True), **kwargs).fit()
    mgr = CheckpointManager(tmp_path / "m")
    steps_before = mgr.available_steps
    mgr.close()
    assert steps_before  # the first run checkpointed at the raise
    # resume: the step has not advanced, so the raise-path save targets an
    # EXISTING step and must skip it instead of crashing inside orbax
    with pytest.raises(NonFiniteError):
        Trainer(tiny_task(), _sampler(all_bad=True), **kwargs).fit(
            resume=str(tmp_path / "m"))
