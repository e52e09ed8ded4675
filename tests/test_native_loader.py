"""Native batch pipeline: byte-equivalence with the numpy PatchSampler path.

The native loader (tpu_mednet/native + data/native_loader.py) replaces the
per-batch numpy work with one fused C++ pass; these tests pin its output
byte-for-byte against ``PatchSampler.batches`` under identical seeds —
the contract that lets CLIs switch it on transparently.
"""

import numpy as np
import pytest

from tpu_mednet import native
from tpu_mednet.data.native_loader import NativeBatchPipeline, make_batch_source
from tpu_mednet.data.patch_sampler import PatchSampler
from tpu_mednet.data.readers import MemoryReader


def make_reader(n_subjects=3, size=24, heatmaps=False, seed=0):
    rng = np.random.default_rng(seed)
    images, labels, hms = {}, {}, {}
    for i in range(n_subjects):
        key = f"s{i}"
        images[key] = rng.normal(0, 1, size=(2, size, size + 2, size + 4)).astype(
            np.float16)
        lbl = rng.integers(0, 3, size=(1, size, size + 2, size + 4)).astype(np.uint8)
        labels[key] = lbl
        if heatmaps:
            hms[key] = rng.integers(0, 255, size=(2, size, size + 2, size + 4)).astype(
                np.uint8)
    groups = {"images": images, "labels": labels}
    if heatmaps:
        groups["heatmaps"] = hms
    return MemoryReader(groups), list(images)


def build_sampler(heatmaps=False, transform=None, seed=7):
    reader, keys = make_reader(heatmaps=heatmaps)
    return PatchSampler(
        data_path=None,
        subject_keys=keys,
        samples_per_subject=4,
        patch_size=(12, 10, 8),
        heatmap_group="heatmaps" if heatmaps else None,
        reader=reader,
        class_probabilities=[0.2, 0.4, 0.4],
        transform=transform,
        seed=seed,
    )


needs_native = pytest.mark.skipif(
    not native.available(), reason="native patchloader not built")


@needs_native
@pytest.mark.parametrize("heatmaps", [False, True])
@pytest.mark.parametrize("prefetch", [False, True])
def test_native_matches_numpy_bytes(heatmaps, prefetch):
    """Same seed => identical batch streams (data, label, metadata)."""
    ref = build_sampler(heatmaps=heatmaps)
    nat = build_sampler(heatmaps=heatmaps)
    pipe = NativeBatchPipeline(nat, prefetch=prefetch)
    assert pipe.usable()

    ref_batches = list(ref.batches(batch_size=4))
    got = 0
    for b_ref, b_nat in zip(ref_batches, pipe.batches(batch_size=4)):
        np.testing.assert_array_equal(b_ref["data"], b_nat["data"])
        np.testing.assert_array_equal(b_ref["label"], b_nat["label"])
        assert b_ref["subject_key"] == b_nat["subject_key"]
        np.testing.assert_array_equal(b_ref["selected_class"],
                                      b_nat["selected_class"])
        assert b_nat["data"].dtype == np.float32
        assert b_nat["label"].dtype == np.uint8
        got += 1
    assert got == len(ref_batches) > 0


@needs_native
def test_native_f16_conversion_exact():
    """LUT f16->f32 must equal numpy's cast for every finite bit pattern."""
    bits = np.arange(65536, dtype=np.uint16)
    halves = bits.view(np.float16).reshape(1, 16, 64, 64)  # (C,X,Y,Z)
    want = halves.astype(np.float32)
    lbl = np.zeros((1, 16, 64, 64), np.uint8)
    out_d = np.empty((1, 16, 64, 64, 1), np.float32)
    out_l = np.empty((1, 16, 64, 64, 1), np.uint8)
    native.assemble_batch([halves], [lbl], None,
                          np.zeros((1, 3), np.int64), (16, 64, 64),
                          out_d, out_l)
    got = np.moveaxis(out_d[0], -1, 0)
    # NaNs: compare bitwise equality of the conversion where finite,
    # NaN-ness where not
    finite = np.isfinite(want)
    np.testing.assert_array_equal(got[finite], want[finite])
    assert np.all(np.isnan(got[~finite]) == np.isnan(want[~finite]))


@needs_native
def test_make_batch_source_auto_and_fallback():
    s = build_sampler()
    src = make_batch_source(s)
    assert isinstance(src, NativeBatchPipeline)

    # a transform hook forces the numpy path (identity transform)
    s2 = build_sampler(transform=lambda **kw: kw)
    src2 = make_batch_source(s2)
    assert src2 is s2
    with pytest.raises(RuntimeError):
        make_batch_source(s2, use_native=True)


@needs_native
def test_lazy_sampler_falls_back_to_window_reads(tmp_path):
    """A preload=False sampler holds live h5py handles — the native path
    must decline (np.asarray on a handle would read WHOLE volumes per
    batch) and the pipeline must still yield the identical batch stream
    through the numpy window-read fallback."""
    import h5py

    rng = np.random.default_rng(3)
    path = tmp_path / "lazy.h5"
    with h5py.File(path, "w") as f:
        for i in range(2):
            f.create_dataset(
                f"images/s{i}",
                data=rng.normal(0, 1, (1, 24, 24, 24)).astype(np.float16))
            f.create_dataset(
                f"labels/s{i}",
                data=rng.integers(0, 3, (1, 24, 24, 24)).astype(np.uint8))
    kw = dict(samples_per_subject=4, patch_size=(12, 12, 12),
              class_probabilities=[0.2, 0.4, 0.4], seed=5)
    lazy = PatchSampler(path, ["s0", "s1"], preload=False, **kw)
    ref = PatchSampler(path, ["s0", "s1"], preload=True, **kw)
    pipe = NativeBatchPipeline(lazy, prefetch=False)
    assert not pipe.usable()
    for b_ref, b_lazy in zip(ref.batches(4), pipe.batches(4)):
        np.testing.assert_array_equal(b_ref["data"], b_lazy["data"])
        np.testing.assert_array_equal(b_ref["label"], b_lazy["label"])
    lazy.close()


@needs_native
def test_prefetch_propagates_worker_errors():
    s = build_sampler()
    pipe = NativeBatchPipeline(s, prefetch=True)
    s.patch_size = np.asarray([999, 999, 999], dtype=np.int64)  # out of range
    with pytest.raises(Exception):
        list(pipe.batches(batch_size=4))


def test_fallback_env_var(monkeypatch):
    """TPU_MEDNET_NO_NATIVE forces the numpy path through make_batch_source."""
    import importlib

    import tpu_mednet.native as nat_mod
    monkeypatch.setenv("TPU_MEDNET_NO_NATIVE", "1")
    monkeypatch.setattr(nat_mod, "_lib", None)
    monkeypatch.setattr(nat_mod, "_load_attempted", False)
    try:
        assert not nat_mod.available()
        s = build_sampler()
        src = make_batch_source(s)
        assert src is s
        batches = list(src.batches(batch_size=4))
        assert batches and batches[0]["data"].dtype == np.float32
    finally:
        monkeypatch.undo()
        importlib.reload(nat_mod)


@needs_native
def test_prefetch_early_abandon_stops_worker():
    """Breaking out of an epoch mid-iteration must not leak/block the
    prefetch thread."""
    import threading

    s = build_sampler()
    pipe = NativeBatchPipeline(s, prefetch=True)
    before = {t.name for t in threading.enumerate()}
    it = pipe.batches(batch_size=2)
    next(it)
    it.close()  # GeneratorExit -> finally: stop + drain + join
    leftover = [t for t in threading.enumerate()
                if t.name == "tpu-mednet-native-loader" and t.is_alive()]
    assert not leftover, f"worker still alive (before: {before})"


@needs_native
def test_held_batches_never_overwritten():
    """The refcount-gated pool must NEVER reuse a buffer the consumer still
    holds: hold every yielded array while iterating, then verify each still
    equals the snapshot taken at yield time (a reuse would corrupt it)."""
    s = build_sampler()
    pipe = NativeBatchPipeline(s, prefetch=True)
    held, snaps = [], []
    for b in pipe.batches(batch_size=2, drop_last=False):
        held.append((b["data"], b["label"]))
        snaps.append((b["data"].copy(), b["label"].copy()))
    assert len(held) >= 3
    for (d, l), (sd, sl) in zip(held, snaps):
        np.testing.assert_array_equal(d, sd)
        np.testing.assert_array_equal(l, sl)


def test_early_abandon_terminates_promptly():
    """Abandoning an epoch early (break out of ``batches`` — what
    ``limit_train_batches`` does) must terminate the prefetch worker even
    when it enters ``q.put`` AFTER the consumer's shutdown drain.  The
    one-shot drain-then-join shutdown deadlocked here (producer in put,
    consumer in join) — observed hanging the epoch-limited CLI drives.
    Many iterations to give the race a chance; a watchdog converts any
    regression back into a failure instead of a hung suite."""
    import threading

    done = threading.Event()

    def run():
        for i in range(30):
            pipe = NativeBatchPipeline(build_sampler(seed=i))
            if not pipe.usable():  # no .so in this environment
                break
            gen = pipe.batches(2, shuffle=True, drop_last=True)
            next(gen)      # consume one batch...
            gen.close()    # ...and abandon the epoch
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert done.wait(timeout=120), "early-abandon shutdown hung (deadlock)"
