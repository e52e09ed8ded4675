"""Neptune sink execution + training-time figure observability.

The reference wires Neptune as a first-class channel — experiment creation
with hparams/tags/source upload (`/root/reference/examples/train_seg.py:74-79`)
and per-val-interval MIP image logging
(`/root/reference/midasmednet/segmentation.py:82-91,100-101`).  The neptune
client is not installed in this image, so these tests inject a duck-typed
fake module (the same pattern test_utils.py uses for SimpleITK) and drive
the REAL code paths: ``maybe_create_neptune_run`` -> ``NeptuneSink`` ->
``MetricsLogger.extra_sinks`` during a real 1-epoch Trainer fit.

Also covers the PNG fallback: when TensorBoard is unavailable (simulated
by nulling the module handle — tensorboardX IS importable in this image),
``MetricsLogger.log_figure`` must write
``<log_dir>/figures/<tag>_<step>.png`` instead of dropping the figure.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader, PatchSampler
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import Trainer
from tpu_mednet.utils.metrics_logging import MetricsLogger
from tpu_mednet.utils.neptune_logger import (
    NeptuneSink,
    maybe_create_neptune_run,
)
from tpu_mednet.utils.plots import make_seg_sample_visualizer


# -- fake neptune client (duck-typed; the real one is not in this image) ---


class FakeHandle:
    def __init__(self, run, key):
        self.run, self.key = run, key

    def append(self, value, step=None):
        self.run.appends.setdefault(self.key, []).append((value, step))


class FakeRun:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.appends = {}
        self.assigned = {}
        self.stopped = False

    def __getitem__(self, key):
        return FakeHandle(self, key)

    def __setitem__(self, key, value):
        self.assigned[key] = value

    def stop(self):
        self.stopped = True


@pytest.fixture
def fake_neptune(monkeypatch):
    mod = types.ModuleType("neptune")
    mod.runs = []

    def init_run(**kwargs):
        run = FakeRun(**kwargs)
        mod.runs.append(run)
        return run

    mod.init_run = init_run
    monkeypatch.setitem(sys.modules, "neptune", mod)
    monkeypatch.setenv("NEPTUNE_API_TOKEN", "fake-token")
    return mod


# -- tiny fit harness (same shape as test_trainer_controls) ----------------


def make_sampler(samples=4, seed=0):
    rng = np.random.default_rng(seed)
    shape = (32, 32, 32)
    lbl = np.zeros((1, *shape), dtype=np.uint8)
    lbl[0, 8:20, 8:20, 8:20] = 1
    img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
    img[0, 8:20, 8:20, 8:20] += 2.0
    reader = MemoryReader({"images": {"s": img}, "labels": {"s": lbl}})
    return PatchSampler(None, ["s"], samples_per_subject=samples,
                        patch_size=[16, 16, 16], reader=reader, seed=seed)


def tiny_task():
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=8, num_levels=2,
        block="residual", layer_order="cge", num_groups=4,
        dtype=jnp.float32,
    ))
    return SegmentationTask(model=model, loss="DICE")


# -- maybe_create_neptune_run gating + experiment creation -----------------


def test_no_project_returns_none(fake_neptune):
    assert maybe_create_neptune_run(None, "exp") is None
    assert fake_neptune.runs == []


def test_no_token_returns_none(monkeypatch, fake_neptune):
    monkeypatch.delenv("NEPTUNE_API_TOKEN")
    assert maybe_create_neptune_run("ws/proj", "exp") is None
    assert fake_neptune.runs == []


def test_client_missing_warns_and_returns_none(monkeypatch, caplog):
    monkeypatch.setenv("NEPTUNE_API_TOKEN", "fake-token")
    monkeypatch.setitem(sys.modules, "neptune", None)  # force ImportError
    with caplog.at_level("WARNING"):
        assert maybe_create_neptune_run("ws/proj", "exp") is None
    assert "not installed" in caplog.text


def test_experiment_created_with_hparams_tags_sources(fake_neptune):
    # reference train_seg.py:74-79: NeptuneLogger(project_name=...,
    # experiment_name=..., params=vars(hparams), tags=[...],
    # upload_source_files=[...])
    sink = maybe_create_neptune_run(
        "ws/proj", "exp1", hparams={"lr": 1e-3, "fmaps": [8, 16]},
        tags=["seg", "demo"], source_files=["train_seg.py", "cfg.yaml"],
    )
    assert isinstance(sink, NeptuneSink)
    (run,) = fake_neptune.runs
    assert run.kwargs["project"] == "ws/proj"
    assert run.kwargs["name"] == "exp1"
    assert run.kwargs["tags"] == ["seg", "demo"]
    assert run.kwargs["source_files"] == ["train_seg.py", "cfg.yaml"]
    # hparams are stringified (neptune rejects nested/list values)
    assert run.assigned["parameters"] == {"lr": "0.001", "fmaps": "[8, 16]"}


def test_default_tags_are_experiment_name(fake_neptune):
    maybe_create_neptune_run("ws/proj", "exp2")
    assert fake_neptune.runs[-1].kwargs["tags"] == ["exp2"]


# -- sink behavior through MetricsLogger -----------------------------------


def test_sink_scalars_and_figures_and_close(fake_neptune, tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sink = maybe_create_neptune_run("ws/proj", "exp")
    metrics = MetricsLogger(tmp_path / "logs", extra_sinks=(sink,))
    metrics.log_scalars(3, {"train_loss": 0.5})
    fig = plt.figure()
    metrics.log_figure("images", fig, 3)
    plt.close(fig)
    metrics.close()
    (run,) = fake_neptune.runs
    assert run.appends["train_loss"] == [(0.5, 3)]
    (logged_fig, step) = run.appends["images"][0]
    assert logged_fig is fig and step == 3
    assert run.stopped


# -- the real thing: a 1-epoch Trainer fit ---------------------------------


@pytest.mark.slow  # heavy jit/fit (measured r5)
def test_neptune_and_png_fallback_during_fit(fake_neptune, tmp_path,
                                             monkeypatch):
    """1-epoch fit with the MIP sample visualizer: the Neptune sink receives
    the reference's scalar names AND the rendered figures; with TensorBoard
    unavailable (simulated), the same figures land as PNGs on disk."""
    from tpu_mednet.utils import metrics_logging

    monkeypatch.setattr(metrics_logging, "SummaryWriter", None)
    sink = maybe_create_neptune_run(
        "ws/proj", "fit", hparams={"lr": 1e-3}, source_files=[__file__])
    log_dir = tmp_path / "logs"
    trainer = Trainer(
        tiny_task(), make_sampler(), val_sampler=make_sampler(seed=1),
        batch_size=2, max_epochs=1, log_dir=str(log_dir),
        sample_visualizer=make_seg_sample_visualizer(), log_interval=5,
        metric_sinks=(sink,),
    )
    trainer.fit()
    (run,) = fake_neptune.runs
    # reference scalar names (segmentation.py:64,111-117)
    assert "train_loss" in run.appends
    assert "val_loss" in run.appends
    assert any(k.startswith("val_dice") for k in run.appends)
    # MIP figures reached the sink (segmentation.py:100-101 log_samples)
    assert "images" in run.appends and "labels" in run.appends
    # PNG fallback: with no TensorBoard writer the figures must exist on
    # disk too
    pngs = sorted((log_dir / "figures").glob("*.png"))
    names = {p.name.rsplit("_", 1)[0] for p in pngs}
    assert {"images", "labels"} <= names
    assert all(p.stat().st_size > 0 for p in pngs)
    assert run.stopped  # Trainer closed the sink at fit end


def test_png_fallback_without_tensorboard(tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tpu_mednet.utils import metrics_logging

    monkeypatch.setattr(metrics_logging, "SummaryWriter", None)
    metrics = MetricsLogger(tmp_path / "logs")
    assert metrics._tb is None
    fig = plt.figure()
    metrics.log_figure("val/images", fig, 7)
    plt.close(fig)
    metrics.close()
    out = tmp_path / "logs" / "figures" / "val_images_000007.png"
    assert out.exists() and out.stat().st_size > 0
