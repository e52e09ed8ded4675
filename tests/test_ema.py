"""Weight EMA (OptimizerConfig.ema_decay / TrainState.ema_params).

The reference has no EMA (it trains raw Adam weights,
segmentation.py:119-120); this is additive production capability: the
train step maintains ema = d*ema + (1-d)*params inside the jit,
validation and inference run on the EMA weights, and checkpoints carry
them (resume-guarded, since they change the state tree).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader, PatchSampler
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import (
    OptimizerConfig,
    Trainer,
    create_train_state,
    load_for_inference,
    make_eval_step,
    make_train_step,
)
from tpu_mednet.train.optim import check_resume_optimizer

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow


def tiny_model(out=2):
    return UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=out, f_maps=8, num_levels=2,
        block="residual", layer_order="cge", num_groups=4,
        dtype=jnp.float32,
    ))


def make_reader(shape=(32, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    lbl = np.zeros((1, *shape), dtype=np.uint8)
    lbl[0, 8:20, 8:20, 8:20] = 1
    img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
    img[0, 8:20, 8:20, 8:20] += 2.0
    return MemoryReader({"images": {"s": img}, "labels": {"s": lbl}})


def make_batch(seed=0, n=2, s=16):
    rng = np.random.default_rng(seed)
    return {
        "data": jnp.asarray(rng.normal(size=(n, s, s, s, 1)), jnp.float32),
        "label": jnp.asarray(
            rng.integers(0, 2, size=(n, s, s, s, 1)), jnp.uint8),
    }


def test_train_step_updates_ema_with_decay():
    task = SegmentationTask(model=tiny_model(), loss="DICE")
    state = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-2, ema=True)
    # fresh state: ema == params
    for e, p in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    d = 0.5
    step = make_train_step(task, ema_decay=d, donate=False)
    old_params = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, _ = step(state, make_batch())
    # one step: ema = d*old + (1-d)*new, old ema == old params
    expect = jax.tree_util.tree_map(
        lambda o, n: d * o + (1 - d) * np.asarray(n),
        old_params, new_state.params)
    for e, x in zip(jax.tree_util.tree_leaves(new_state.ema_params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), x, rtol=1e-6, atol=1e-7)


def test_ema_off_keeps_historic_state_tree():
    task = SegmentationTask(model=tiny_model(), loss="DICE")
    state = create_train_state(task.model, (1, 16, 16, 16, 1), 1e-3)
    assert state.ema_params is None
    step = make_train_step(task, donate=False)
    new_state, _ = step(state, make_batch(n=1))
    assert new_state.ema_params is None


def test_train_step_validates_decay_range():
    task = SegmentationTask(model=tiny_model(), loss="DICE")
    with pytest.raises(ValueError, match="ema_decay"):
        make_train_step(task, ema_decay=1.5)
    with pytest.raises(ValueError, match="ema_decay"):
        OptimizerConfig(ema_decay=1.0)


def test_eval_step_uses_ema_weights():
    task = SegmentationTask(model=tiny_model(), loss="DICE")
    state = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-2, ema=True)
    # make EMA differ hard from the raw params: zero the raw params
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    state = state.replace(params=zeroed)
    batch = make_batch()
    raw = make_eval_step(task, use_ema=False)(state, batch)
    ema = make_eval_step(task, use_ema=True)(state, batch)
    assert float(raw["val_loss"]) != pytest.approx(float(ema["val_loss"]))
    # use_ema on a state without EMA falls back to the raw params
    no_ema_state = state.replace(ema_params=None)
    fallback = make_eval_step(task, use_ema=True)(no_ema_state, batch)
    assert float(fallback["val_loss"]) == pytest.approx(float(raw["val_loss"]))


def test_resume_guard_ema_toggle_refuses():
    ours = OptimizerConfig(ema_decay=0.999)
    with pytest.raises(ValueError, match="ema"):
        check_resume_optimizer({"optimizer": "adam", "ema_decay": 0.0},
                               ours, "ckpt")
    # same structure, different decay value: fine
    check_resume_optimizer({"optimizer": "adam", "ema_decay": 0.99},
                           ours, "ckpt")
    # pre-flag side-car means no EMA
    with pytest.raises(ValueError, match="ema"):
        check_resume_optimizer({"fmaps": 8}, ours, "ckpt")


def test_trainer_ema_checkpoint_and_inference(tmp_path):
    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(), loss="DICE")
    hparams = {"ema_decay": 0.5, "optimizer": "adam"}
    trainer = Trainer(
        task, sampler, batch_size=2, max_epochs=2, learning_rate=1e-2,
        model_dir=str(tmp_path / "m"), hparams=hparams,
        optim=OptimizerConfig(learning_rate=1e-2, ema_decay=0.5),
    )
    state = trainer.fit()
    # after a few steps EMA lags the raw params
    diffs = [float(jnp.abs(e - p).max()) for e, p in zip(
        jax.tree_util.tree_leaves(state.ema_params),
        jax.tree_util.tree_leaves(state.params))]
    assert max(diffs) > 0

    # inference restore: a template WITHOUT ema is widened automatically,
    # and the returned weights are the EMA ones
    template = create_train_state(task.model, (1, 16, 16, 16, 1), 1e-2)
    variables, hp = load_for_inference(str(tmp_path / "m"), template)
    assert float(hp["ema_decay"]) == 0.5
    for v, e in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(v), np.asarray(e))
    raw, _ = load_for_inference(str(tmp_path / "m"), template, use_ema=False)
    for v, p in zip(jax.tree_util.tree_leaves(raw["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(v), np.asarray(p))

    # resume with EMA on restores and keeps training
    resumed = Trainer(
        task, sampler, batch_size=2, max_epochs=3, learning_rate=1e-2,
        model_dir=str(tmp_path / "m"), hparams=hparams,
        optim=OptimizerConfig(learning_rate=1e-2, ema_decay=0.5),
    )
    final = resumed.fit(resume=str(tmp_path / "m"))
    assert int(final.step) == 6
    assert final.ema_params is not None

    # resume with EMA off refuses with the structural diff named
    with pytest.raises(ValueError, match="ema"):
        Trainer(
            task, sampler, batch_size=2, max_epochs=3,
            model_dir=str(tmp_path / "m"),
            optim=OptimizerConfig(learning_rate=1e-2),
        ).init_state(resume=str(tmp_path / "m"))


def test_predict_cli_forwards_use_ema(tmp_path, monkeypatch):
    """prediction.use_ema=false reaches load_for_inference."""
    import h5py

    import tpu_mednet.cli.predict as cli

    reader = make_reader()
    sampler = PatchSampler(None, ["s"], samples_per_subject=4,
                           patch_size=[16, 16, 16], reader=reader, seed=0)
    task = SegmentationTask(model=tiny_model(), loss="DICE")
    Trainer(task, sampler, batch_size=2, max_epochs=1, learning_rate=1e-2,
            model_dir=str(tmp_path / "m"),
            hparams={"ema_decay": 0.5, "out_channels": 2, "fmaps": 8,
                     "levels": 2, "in_channels": 1, "loss": "DICE"},
            optim=OptimizerConfig(learning_rate=1e-2, ema_decay=0.5)).fit()

    captured = {}

    def spy(directory, template, step=None, use_ema=True):
        captured["use_ema"] = use_ema
        raise SystemExit(0)  # stop before the heavy inference

    # predict does `from tpu_mednet.train import load_for_inference` inside
    # main(), so patching the package attribute intercepts it
    monkeypatch.setattr("tpu_mednet.train.load_for_inference", spy)

    with h5py.File(tmp_path / "d.h5", "w") as f:
        img = np.zeros((1, 32, 32, 32), np.float32)
        f.create_dataset("images/s", data=img)
        f["images/s"].attrs["affine"] = np.eye(4)
    (tmp_path / "keys.txt").write_text("s\n")
    (tmp_path / "cfg.yaml").write_text(f"""
base:
  data: {tmp_path / 'd.h5'}
prediction:
  test_set: {tmp_path / 'keys.txt'}
  checkpoint: {tmp_path / 'm'}
  data: {tmp_path / 'out.h5'}
  patch_size: [16, 16, 16]
  patch_overlap: [4, 4, 4]
  use_ema: false
""")
    with pytest.raises(SystemExit):
        cli.main(["-c", str(tmp_path / "cfg.yaml")])
    assert captured["use_ema"] is False


def test_optimizer_config_ema_signature_and_hparams():
    import argparse
    cfg = OptimizerConfig.from_hparams(
        argparse.Namespace(ema_decay=0.999, optimizer="adam"))
    assert cfg.ema_decay == 0.999
    assert cfg.signature()["ema"] is True
    assert OptimizerConfig().signature()["ema"] is False


def test_ema_advances_once_per_optimizer_step_with_accumulation():
    # regression: the EMA update ran every micro-step against unchanged
    # params, compounding the decay to decay^k per real optimizer step
    task = SegmentationTask(model=tiny_model(), loss="DICE")
    k, d = 3, 0.5
    cfg = OptimizerConfig(learning_rate=1e-2, accumulate_grad_batches=k,
                          ema_decay=d)
    state = create_train_state(task.model, (2, 16, 16, 16, 1), 1e-2,
                               optimizer=cfg.build(), ema=True)
    step = make_train_step(task, ema_decay=d, donate=False)
    ema0 = jax.tree_util.tree_map(np.asarray, state.ema_params)
    # micro-steps 1..k-1 accumulate: params unchanged, EMA must hold still
    for i in range(k - 1):
        state, _ = step(state, make_batch(seed=i))
        for e, e0 in zip(jax.tree_util.tree_leaves(state.ema_params),
                         jax.tree_util.tree_leaves(ema0)):
            np.testing.assert_array_equal(np.asarray(e), e0)
    # the k-th micro-step applies the real update: exactly ONE EMA advance
    state, _ = step(state, make_batch(seed=k))
    expect = jax.tree_util.tree_map(
        lambda o, n: d * o + (1 - d) * np.asarray(n), ema0, state.params)
    for e, x in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), x, rtol=1e-6, atol=1e-7)
