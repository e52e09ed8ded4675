"""Tests for readers, the patch sampler and the grid tile→stitch pipeline."""

import numpy as np
import pytest

from tpu_mednet.data import (
    GridPatchSampler,
    HDF5Reader,
    MemoryReader,
    PatchSampler,
    VolumeGroup,
    grid_patch_generator,
    num_grid_patches,
)


def make_store(n_subjects=2, shape=(24, 28, 20), n_classes=3, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    images, labels, attrs = {}, {}, {"images": {}, "labels": {}}
    for i in range(n_subjects):
        key = f"subj{i}"
        images[key] = rng.normal(size=(channels, *shape)).astype(np.float32)
        lbl = np.zeros((1, *shape), dtype=np.uint8)
        # deterministic blobs of each class
        for c in range(1, n_classes):
            x = 2 + 4 * c
            lbl[0, x : x + 3, x : x + 3, 2 : 2 + 3] = c
        labels[key] = lbl
        attrs["images"][key] = {"affine": np.diag([1.0, 2.0, 3.0, 1.0])}
    return {"images": images, "labels": labels}, attrs


@pytest.fixture
def mem_reader():
    store, attrs = make_store()
    return MemoryReader(store, attrs)


def test_memory_reader_roundtrip(mem_reader):
    data = mem_reader.read_data_to_memory(["subj0", "subj1"], "images")
    assert len(data) == 2
    assert data[0].dtype == np.float16
    shapes = mem_reader.get_data_shape(["subj0"], "images")
    assert shapes["subj0"] == (1, 24, 28, 20)
    affine = mem_reader.get_data_attribute(["subj0"], "images", "affine")["subj0"]
    assert affine[1, 1] == 2.0


def test_hdf5_reader_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    store, attrs = make_store(n_subjects=1)
    path = tmp_path / "data.h5"
    with h5py.File(path, "w") as hf:
        ds = hf.create_dataset("images/subj0", data=store["images"]["subj0"])
        ds.attrs["affine"] = np.eye(4)
        hf.create_dataset("labels/subj0", data=store["labels"]["subj0"])
    r = HDF5Reader(path)
    data = r.read_data_to_memory(["subj0"], "images")
    assert data[0].shape == (1, 24, 28, 20)
    assert r.get_data_attribute(["subj0"], "images", "affine")["subj0"].shape == (4, 4)
    r.close()


def test_patch_sampler_basic(mem_reader):
    ps = PatchSampler(
        None, ["subj0", "subj1"], samples_per_subject=3, patch_size=[8, 8, 8],
        reader=mem_reader, seed=0,
    )
    assert len(ps) == 6
    s = ps.sample(0)
    assert s["data"].shape == (1, 8, 8, 8)
    assert s["data"].dtype == np.float32
    assert s["label"].shape == (1, 8, 8, 8)
    assert s["label"].dtype == np.uint8
    assert s["subject_key"] == "subj0"


def test_patch_sampler_class_balanced(mem_reader):
    ps = PatchSampler(
        None, ["subj0"], samples_per_subject=100, patch_size=[6, 6, 6],
        reader=mem_reader, class_probabilities=[0.0, 0.0, 1.0], seed=1,
    )
    # every patch must contain at least one voxel of class 2
    for i in range(30):
        s = ps.sample(i)
        assert np.any(s["label"] == 2), f"sample {i} missing class 2"


def test_patch_sampler_heatmap_channel_order():
    store, attrs = make_store()
    store["heatmaps"] = {
        k: np.full((2, 24, 28, 20), 7, dtype=np.uint8) for k in store["images"]
    }
    reader = MemoryReader(store, attrs)
    ps = PatchSampler(
        None, ["subj0"], samples_per_subject=1, patch_size=[8, 8, 8],
        heatmap_group="heatmaps", reader=reader,
    )
    s = ps.sample(0)
    # heatmaps first (2 channels of constant 7), class map LAST
    assert s["label"].shape[0] == 3
    assert np.all(s["label"][0] == 7)
    assert np.all(s["label"][1] == 7)
    assert s["label"][2].max() <= 2


def test_patch_sampler_batches(mem_reader):
    ps = PatchSampler(
        None, ["subj0", "subj1"], samples_per_subject=4, patch_size=[8, 8, 8],
        reader=mem_reader,
    )
    batches = list(ps.batches(batch_size=4))
    assert len(batches) == 2
    b = batches[0]
    assert b["data"].shape == (4, 8, 8, 8, 1)  # channels-last
    assert b["label"].shape == (4, 8, 8, 8, 1)


def test_patch_sampler_transform_sees_batch_dim(mem_reader):
    seen = {}

    def transform(**patch):
        seen["data_shape"] = patch["data"].shape
        patch["data"] = patch["data"] * 2
        return patch

    ps = PatchSampler(
        None, ["subj0"], samples_per_subject=1, patch_size=[8, 8, 8],
        reader=mem_reader, transform=transform,
    )
    s = ps.sample(0)
    assert seen["data_shape"] == (1, 1, 8, 8, 8)  # B,C,X,Y,Z
    assert s["data"].shape == (1, 8, 8, 8)


def test_grid_patch_generator_covers_volume():
    img = np.arange(1 * 10 * 12 * 8).reshape(1, 10, 12, 8).astype(np.float32)
    patches = list(grid_patch_generator(img, [6, 6, 6], [1, 1, 1], mode="symmetric"))
    assert len(patches) == num_grid_patches((10, 12, 8), [6, 6, 6], [1, 1, 1])
    for patch, idx, count in patches:
        assert patch.shape == (1, 6, 6, 6)


@pytest.mark.parametrize("shape", [(24, 28, 20), (16, 16, 16), (17, 19, 23)])
@pytest.mark.parametrize("overlap", [[2, 2, 2], [0, 0, 0]])
def test_tile_stitch_roundtrip_identity(shape, overlap):
    """The core invariant: tile -> identity-process -> stitch == original."""
    store, attrs = make_store(n_subjects=2, shape=shape)
    # uint8 content so the roundtrip through out_dtype=uint8 is lossless
    for k in store["images"]:
        store["images"][k] = np.random.default_rng(3).integers(
            0, 255, size=(1, *shape)
        ).astype(np.float32)
    reader = MemoryReader(store, attrs)
    gs = GridPatchSampler(
        None, ["subj0", "subj1"], patch_size=[8, 8, 8], patch_overlap=overlap,
        out_channels=1, out_dtype=np.uint8, reader=reader,
        pad_args={"mode": "symmetric"},
    )
    for batch in gs.batches(batch_size=4, channels_last=False):
        batch = dict(batch)
        batch["data"] = batch["data"]  # identity "model"
        gs.add_processed_batch(batch)
    results = gs.get_assembled_data()
    for k in ["subj0", "subj1"]:
        np.testing.assert_array_equal(
            np.asarray(results[k]), store["images"][k].astype(np.uint8)
        )
        assert np.asarray(results[k].attrs["affine"])[1][1] == 2.0


def test_tile_stitch_channels_last_path():
    store, attrs = make_store(n_subjects=1, shape=(16, 16, 16))
    store["images"]["subj0"] = np.random.default_rng(4).integers(
        0, 255, size=(1, 16, 16, 16)
    ).astype(np.float32)
    reader = MemoryReader(store, attrs)
    gs = GridPatchSampler(
        None, ["subj0"], patch_size=[8, 8, 8], patch_overlap=[2, 2, 2],
        out_channels=1, reader=reader,
    )
    for batch in gs.batches(batch_size=3, channels_last=True):
        assert batch["data"].shape[-1] == 1
        gs.add_processed_batch(batch, channels_last=True)
    np.testing.assert_array_equal(
        np.asarray(gs.get_assembled_data()["subj0"]),
        store["images"]["subj0"].astype(np.uint8),
    )


def test_grid_overlap_too_large_raises():
    img = np.zeros((1, 8, 8, 8), dtype=np.float32)
    with pytest.raises(ValueError):
        list(grid_patch_generator(img, [4, 4, 4], [2, 2, 2]))


def test_volume_group_hdf5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    vg = VolumeGroup()
    ds = vg.require_dataset("a", (1, 4, 4, 4), np.uint8)
    ds[:] = 3
    ds.attrs["affine"] = np.eye(4).tolist()
    path = tmp_path / "out.h5"
    vg.save(path, group="prediction")
    with h5py.File(path, "r") as hf:
        assert np.all(hf["prediction/a"][:] == 3)
        assert np.asarray(hf["prediction/a"].attrs["affine"]).shape == (4, 4)


def test_open_reader_suffix_routing(tmp_path):
    """open_reader infers the backend from the path suffix, so CLIs reach
    zarr stores without a reader_cls flag (reference dataset.py:179-207)."""
    from tpu_mednet.data import open_reader, ZarrReader

    h5py = pytest.importorskip("h5py")
    path = tmp_path / "d.h5"
    with h5py.File(path, "w") as hf:
        hf.create_dataset("images/s0", data=np.ones((1, 4, 4, 4), np.float32))
    r = open_reader(path)
    assert isinstance(r, HDF5Reader)
    (vol,) = list(r.read(["s0"], "images", dtype=np.float32))
    assert vol.shape == (1, 4, 4, 4)
    r.close()

    with pytest.raises(ValueError):
        open_reader(tmp_path / "d.unknown")

    # explicit class always wins over suffix inference
    assert isinstance(open_reader(path, reader_cls=HDF5Reader), HDF5Reader)


def _make_zarr_store(tmp_path):
    try:
        import zarr
    except ImportError:  # bundled fallback — same v2 format on disk
        from tpu_mednet.data import zarrlite as zarr
    root = zarr.open(str(tmp_path / "d.zarr"), mode="w")
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.normal(size=(1, 24, 24, 24)).astype(np.float32)
        lbl = np.zeros((1, 24, 24, 24), dtype=np.uint8)
        lbl[0, 4:12, 4:12, 4:12] = 1
        a = root.create_dataset(f"images/s{i}", data=img) \
            if hasattr(root, "create_dataset") else root.create_array(f"images/s{i}", data=img)
        a.attrs["affine"] = np.eye(4).tolist()
        root[f"labels/s{i}"] = lbl
    return tmp_path / "d.zarr"


def test_zarr_reader_end_to_end(tmp_path):
    """ZarrReader through open_reader feeds the patch sampler — the
    working equivalent of the reference's broken DataReaderZarr path
    (dataset.py:179-207). Activates when zarr is installed."""
    from tpu_mednet.data import ZarrReader, open_reader

    path = _make_zarr_store(tmp_path)
    r = open_reader(path)
    assert isinstance(r, ZarrReader)
    shapes = r.get_data_shape(["s0", "s1"], "images")
    assert shapes["s0"] == (1, 24, 24, 24)
    affine = r.get_data_attribute(["s0"], "images", "affine")["s0"]
    assert np.asarray(affine).shape == (4, 4)

    sampler = PatchSampler(path, ["s0", "s1"], samples_per_subject=2,
                           patch_size=[8, 8, 8], seed=0)
    batch = next(sampler.batches(2))
    assert batch["data"].shape == (2, 8, 8, 8, 1)


def test_patch_sampler_tiny_epoch_pads_and_warns(mem_reader, caplog):
    """An epoch smaller than one batch pads by re-drawing with replacement
    (one-time warning) instead of silently yielding nothing under the
    drop_last semantics — e.g. validation on a tiny val set."""
    import logging

    ps = PatchSampler(
        None, ["subj0", "subj1"], samples_per_subject=1, patch_size=[8, 8, 8],
        reader=mem_reader, seed=0,
    )
    assert len(ps) == 2
    with caplog.at_level(logging.WARNING, logger="tpu_mednet.data.patch_sampler"):
        batches = list(ps.batches(batch_size=4))
    assert len(batches) == 1
    assert batches[0]["data"].shape == (4, 8, 8, 8, 1)
    warns = [r for r in caplog.records if "re-drawing" in r.getMessage()]
    assert len(warns) == 1
    # the warning is one-time: a second epoch stays quiet
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="tpu_mednet.data.patch_sampler"):
        assert len(list(ps.batches(batch_size=4))) == 1
    assert not [r for r in caplog.records if "re-drawing" in r.getMessage()]


def test_patch_sampler_rejects_volume_smaller_than_patch(mem_reader):
    """Construction fails fast naming the offending subject when a volume
    is smaller than the patch (instead of an opaque rng error mid-epoch)."""
    with pytest.raises(ValueError, match=r"subj0.*smaller than patch_size"):
        PatchSampler(
            None, ["subj0"], samples_per_subject=1, patch_size=[32, 8, 8],
            reader=mem_reader,
        )


def test_patch_sampler_lazy_reader_stays_open(tmp_path):
    """With preload=False an owned reader must stay open for the sampler's
    lifetime (the deques hold live h5py dataset handles); close() releases."""
    h5py = pytest.importorskip("h5py")
    store, _ = make_store(n_subjects=1)
    path = tmp_path / "d.h5"
    with h5py.File(path, "w") as hf:
        hf.create_dataset("images/subj0", data=store["images"]["subj0"])
        hf.create_dataset("labels/subj0", data=store["labels"]["subj0"])
    ps = PatchSampler(
        path, ["subj0"], samples_per_subject=2, patch_size=[8, 8, 8],
        reader_cls=HDF5Reader, preload=False, seed=0,
    )
    s = ps.sample(0)  # would raise "Closed HDF5 dataset" if the file closed
    assert s["data"].shape == (1, 8, 8, 8)
    ps.close()
    assert ps._reader is None


def test_device_prefetch_early_abandonment_joins_producer():
    """Breaking out of a prefetch epoch must unblock and join the producer
    thread — no thread leak, and the shared sampler rng is never raced by
    the next epoch's shuffle."""
    import threading

    from tpu_mednet.data.prefetch import device_prefetch

    n_before = threading.active_count()
    produced = []

    def host_iter():
        for i in range(100):
            produced.append(i)
            yield {"data": np.zeros((2, 4, 4, 4, 1), np.float32), "i": i}

    it = device_prefetch(host_iter(), buffer_size=2)
    first = next(it)
    assert first["i"] == 0
    it.close()  # early abandonment (same as `break` in a for-loop)
    # producer stopped early (buffer_size-bounded) and its thread is gone
    assert len(produced) < 100
    deadline = 50
    while threading.active_count() > n_before and deadline:
        import time
        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= n_before


def test_bulk_load_works_without_tqdm(mem_reader, monkeypatch):
    """The tqdm progress wrapper (reference dataset.py:158,492) is
    optional: loads must work identically when tqdm is absent."""
    import sys

    monkeypatch.setitem(sys.modules, "tqdm", None)  # force ImportError
    data = mem_reader.read_data_to_memory(["subj0", "subj1"], "images")
    assert len(data) == 2
