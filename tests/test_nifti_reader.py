"""NiftiReader: training/prediction straight from .nii/.nii.gz directories.

Beyond-reference capability (the reference reads HDF5/zarr containers only,
`/root/reference/midasmednet/dataset.py:150-207`); built on the bundled
dependency-free NIfTI-1 parser (`tpu_mednet.utils.nifti`).  Layout:
``<root>/<group>/<key>.nii[.gz]``, channels-first (C, X, Y, Z) like every
other reader; ``VolumeGroup.to_nifti`` / ``save('*.nii')`` is the inverse.
"""

import json

import numpy as np
import pytest

from tpu_mednet.data import (
    HDF5Reader,
    NiftiReader,
    PatchSampler,
    VolumeGroup,
    ZarrReader,
    open_reader,
)
from tpu_mednet.utils.nifti import read_nifti_header, save_nifti


def make_nii_dataset(root, shape=(16, 16, 16), keys=("s0", "s1"), seed=0,
                     gz=True):
    rng = np.random.default_rng(seed)
    sfx = ".nii.gz" if gz else ".nii"
    vols = {}
    for g, dtype in (("images", np.float32), ("labels", np.uint8)):
        (root / g).mkdir(parents=True, exist_ok=True)
        for k in keys:
            if dtype == np.uint8:
                arr = np.zeros(shape, dtype)
                arr[4:12, 4:12, 4:12] = 1
            else:
                arr = rng.normal(size=shape).astype(dtype)
            save_nifti(root / g / f"{k}{sfx}", arr)
            vols[(g, k)] = arr
    return vols


def test_reader_roundtrip_3d(tmp_path):
    vols = make_nii_dataset(tmp_path)
    r = NiftiReader(tmp_path)
    out = list(r.read(["s0", "s1"], "images", dtype=np.float32))
    for k, got in zip(["s0", "s1"], out):
        assert got.shape == (1, 16, 16, 16)  # channels-first convention
        np.testing.assert_array_equal(got[0], vols[("images", k)])
    lbl = next(iter(r.read(["s0"], "labels", dtype=np.uint8)))
    np.testing.assert_array_equal(lbl[0], vols[("labels", "s0")])


def test_reader_4d_maps_trailing_axis_to_channels(tmp_path):
    (tmp_path / "images").mkdir()
    arr = np.random.default_rng(1).normal(size=(8, 8, 8, 3)).astype(np.float32)
    save_nifti(tmp_path / "images" / "m.nii.gz", arr)
    r = NiftiReader(tmp_path)
    assert r.get_data_shape(["m"], "images") == {"m": (3, 8, 8, 8)}
    got = next(iter(r.read(["m"], "images", dtype=np.float32)))
    np.testing.assert_array_equal(got, np.moveaxis(arr, -1, 0))


def test_header_only_shape_and_affine_queries(tmp_path):
    (tmp_path / "images").mkdir()
    affine = np.diag([2.0, 3.0, 4.0, 1.0])
    affine[:3, 3] = (5.0, -7.0, 9.0)
    save_nifti(tmp_path / "images" / "a.nii.gz",
               np.zeros((4, 5, 6), np.float32), affine)
    # header parse alone recovers shape/dtype/affine
    shape, dtype, aff = read_nifti_header(tmp_path / "images" / "a.nii.gz")
    assert shape == (4, 5, 6) and dtype == np.float32
    np.testing.assert_allclose(aff, affine)
    r = NiftiReader(tmp_path)
    assert r.get_data_shape(["a"], "images") == {"a": (1, 4, 5, 6)}
    np.testing.assert_allclose(
        r.get_data_attribute(["a"], "images", "affine")["a"], affine)
    with pytest.raises(KeyError, match="affine"):
        r.get_data_attribute(["a"], "images", "spacing")
    with pytest.raises(KeyError, match="no NIfTI volume"):
        next(iter(r.read(["missing"], "images")))


def test_open_reader_routing(tmp_path):
    # a directory of NIfTI groups routes to NiftiReader
    nii = tmp_path / "niidata"
    make_nii_dataset(nii, keys=("s0",))
    assert isinstance(open_reader(nii), NiftiReader)
    # zarr markers win over the directory heuristic
    zdir = tmp_path / "store"
    zdir.mkdir()
    (zdir / ".zgroup").write_text('{"zarr_format": 2}')
    assert isinstance(open_reader(zdir), ZarrReader)
    # marker-less stores with children (foreign-layout zarr) keep the
    # historic zarr interpretation as long as no .nii files are present
    bare = tmp_path / "bare"
    (bare / "images").mkdir(parents=True)
    (bare / "images" / ".zarray").write_text(
        json.dumps({
            "zarr_format": 2, "shape": [2, 2], "chunks": [2, 2],
            "dtype": "<f4", "compressor": None, "fill_value": 0.0,
            "order": "C", "filters": None,
        }))
    assert isinstance(open_reader(bare), ZarrReader)
    # .h5 unchanged
    h5py = pytest.importorskip("h5py")
    with h5py.File(tmp_path / "d.h5", "w") as hf:
        hf.create_dataset("images/s0", data=np.zeros((1, 4, 4, 4), np.float32))
    r = open_reader(tmp_path / "d.h5")
    assert isinstance(r, HDF5Reader)
    r.close()


def test_wide_dtypes_roundtrip_and_flat_dir_refused(tmp_path):
    from tpu_mednet.utils.nifti import load_nifti

    # regression: int64 labels (torch-exported datasets) silently became
    # float32 — the standard NIfTI-1 integer codes now round-trip
    (tmp_path / "g").mkdir()
    for dtype in (np.int8, np.uint32, np.int64, np.uint64):
        top = min(np.iinfo(dtype).max, 2 ** 40)  # exact in float64
        arr = np.linspace(0, top, 27).astype(dtype).reshape(3, 3, 3)
        save_nifti(tmp_path / "g" / "v.nii.gz", arr)
        got, _ = load_nifti(tmp_path / "g" / "v.nii.gz")
        assert got.dtype == dtype
        np.testing.assert_array_equal(got, arr)
    # bool widens losslessly to uint8, float16 to float32
    save_nifti(tmp_path / "g" / "b.nii", np.ones((2, 2, 2), bool))
    got, _ = load_nifti(tmp_path / "g" / "b.nii")
    assert got.dtype == np.uint8 and got.all()
    save_nifti(tmp_path / "g" / "f.nii", np.ones((2, 2, 2), np.float16))
    got, _ = load_nifti(tmp_path / "g" / "f.nii")
    assert got.dtype == np.float32

    # regression: a flat directory of .nii files routed to NiftiReader,
    # which can never read that layout — now an actionable error
    flat = tmp_path / "flat"
    flat.mkdir()
    save_nifti(flat / "s0.nii.gz", np.zeros((2, 2, 2), np.float32))
    with pytest.raises(ValueError, match="group directories"):
        open_reader(flat)


def test_list_keys_across_readers(tmp_path):
    from tpu_mednet.data import MemoryReader

    make_nii_dataset(tmp_path / "nii", keys=("b", "a"))
    assert NiftiReader(tmp_path / "nii").list_keys("images") == ["a", "b"]
    assert NiftiReader(tmp_path / "nii").list_keys("missing") == []
    mem = MemoryReader({"images": {"y": np.zeros((1, 2, 2, 2)),
                                   "x": np.zeros((1, 2, 2, 2))}})
    assert mem.list_keys("images") == ["x", "y"]
    h5py = pytest.importorskip("h5py")
    with h5py.File(tmp_path / "d.h5", "w") as hf:
        hf.create_dataset("images/k1", data=np.zeros((1, 2, 2, 2)))
        hf.create_dataset("images/k0", data=np.zeros((1, 2, 2, 2)))
    r = HDF5Reader(tmp_path / "d.h5")
    assert r.list_keys("images") == ["k0", "k1"]
    r.close()
    # zarr (bundled store works when the zarr package is absent)
    from tpu_mednet.data.stores import VolumeGroup
    g = VolumeGroup()
    g.require_dataset("z1", (1, 2, 2, 2), np.uint8)
    g.require_dataset("z0", (1, 2, 2, 2), np.uint8)
    g.save(tmp_path / "s.zarr", group="images")
    zr = ZarrReader(tmp_path / "s.zarr")
    assert zr.list_keys("images") == ["z0", "z1"]
    zr.close()


def test_patch_sampler_over_nifti_directory(tmp_path):
    make_nii_dataset(tmp_path, keys=("s0",))
    sampler = PatchSampler(str(tmp_path), ["s0"], samples_per_subject=2,
                           patch_size=[8, 8, 8], seed=0)
    batches = list(sampler.batches(2))
    assert len(batches) == 1
    b = batches[0]
    assert b["data"].shape == (2, 8, 8, 8, 1)  # channels-last batches
    assert b["label"].shape == (2, 8, 8, 8, 1)
    assert set(np.unique(b["label"])) <= {0, 1}


def test_volume_group_nifti_save_roundtrips(tmp_path):
    g = VolumeGroup()
    ds = g.require_dataset("p0", (2, 6, 6, 6), np.uint8)
    ds[:] = np.random.default_rng(2).integers(0, 9, (2, 6, 6, 6),
                                              dtype=np.uint8)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    ds.attrs["affine"] = affine
    single = g.require_dataset("p1", (1, 6, 6, 6), np.uint8)
    single[:] = 3
    g.save(tmp_path / "pred.nii", group="predictions")
    r = NiftiReader(tmp_path / "pred.nii")
    got = next(iter(r.read(["p0"], "predictions", dtype=np.uint8)))
    np.testing.assert_array_equal(got, ds.array)  # channel round-trip
    np.testing.assert_allclose(
        r.get_data_attribute(["p0"], "predictions", "affine")["p0"], affine)
    # C == 1 writes a plain 3D NIfTI and reads back with the channel axis
    got1 = next(iter(r.read(["p1"], "predictions", dtype=np.uint8)))
    assert got1.shape == (1, 6, 6, 6)
    shape, _, _ = read_nifti_header(
        tmp_path / "pred.nii" / "predictions" / "p1.nii.gz")
    assert shape == (6, 6, 6)


@pytest.mark.slow  # heavy jit/fit (measured r5)
def test_train_cli_end_to_end_on_nifti_dataset(tmp_path):
    # the routing makes --data_path <dir-of-nii> work through the whole
    # training stack with no other change
    from tpu_mednet.cli.train_seg import main as train_seg_main

    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    (data / "images").mkdir(parents=True)
    (data / "labels").mkdir()
    img = rng.normal(0, 0.1, size=(16, 16, 16)).astype(np.float32)
    lbl = np.zeros((16, 16, 16), np.uint8)
    lbl[4:12, 4:12, 4:12] = 1
    img[4:12, 4:12, 4:12] += 2.0
    save_nifti(data / "images" / "s0.nii.gz", img)
    save_nifti(data / "labels" / "s0.nii.gz", lbl)
    (tmp_path / "train.txt").write_text("s0\n")

    rc = train_seg_main([
        "--data_path", str(data),
        "--train_set", str(tmp_path / "train.txt"),
        "--model_dir", str(tmp_path / "model"),
        "--patch_size", "16", "16", "16",
        "--patches_per_subject", "2",
        "--max_epochs", "1", "--batch_size", "2",
        "--fmaps", "4", "--out_channels", "2",
        "--loss", "CE", "--no_bf16",
    ])
    assert rc == 0
    assert (tmp_path / "model").exists()
