"""mednet-pack: store format conversion (cli/pack.py).

Beyond-reference ops tool (the reference only exports containers to NIfTI,
`/root/reference/midasmednet/utils/export.py`; it cannot build or convert
training containers).  Round-trips h5 -> zarr -> nii-dir -> h5 checking
bytes, dtypes and affine carry-through.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from tpu_mednet.cli.pack import main as pack_main
from tpu_mednet.data.readers import open_reader


@pytest.fixture
def src_h5(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "src.h5"
    vols = {}
    with h5py.File(path, "w") as hf:
        for i in range(3):
            img = rng.normal(size=(2, 6, 6, 6)).astype(np.float32)
            lbl = rng.integers(0, 3, (1, 6, 6, 6)).astype(np.uint8)
            ds = hf.create_dataset(f"images/s{i}", data=img)
            if i != 1:  # mixed presence: s1 has no affine
                ds.attrs["affine"] = np.diag([2.0, 1.0, 1.0, 1.0])
            hf.create_dataset(f"labels/s{i}", data=lbl)
            vols[("images", f"s{i}")] = img
            vols[("labels", f"s{i}")] = lbl
    return path, vols


def _check(store_path, vols, keys=("s0", "s1", "s2"), groups=("images", "labels")):
    r = open_reader(store_path)
    try:
        for g in groups:
            assert r.list_keys(g) == sorted(keys)
            for k, got in zip(sorted(keys), r.read(sorted(keys), g,
                                                   preload=False)):
                got = np.asarray(got)
                want = vols[(g, k)]
                assert got.dtype == want.dtype
                np.testing.assert_array_equal(got, want)
    finally:
        r.close()


def test_pack_h5_to_zarr_to_nii_roundtrip(src_h5, tmp_path):
    path, vols = src_h5
    assert pack_main(["--src", str(path), "--dst", str(tmp_path / "d.zarr")]) == 0
    _check(tmp_path / "d.zarr", vols)
    # affine carried for s0, absent for s1
    r = open_reader(tmp_path / "d.zarr")
    affs = r.get_data_attribute(["s0"], "images", "affine")
    np.testing.assert_allclose(np.asarray(affs["s0"]),
                               np.diag([2.0, 1.0, 1.0, 1.0]))
    with pytest.raises(KeyError):
        r.get_data_attribute(["s1"], "images", "affine")
    r.close()

    # zarr -> nii dir: floats survive, labels survive; multi-channel 4D
    assert pack_main(["--src", str(tmp_path / "d.zarr"),
                      "--dst", str(tmp_path / "d.nii")]) == 0
    _check(tmp_path / "d.nii", vols)

    # nii dir -> h5 closes the loop
    assert pack_main(["--src", str(tmp_path / "d.nii"),
                      "--dst", str(tmp_path / "back.h5")]) == 0
    _check(tmp_path / "back.h5", vols)


def test_pack_subset(src_h5, tmp_path):
    path, vols = src_h5
    (tmp_path / "keys.txt").write_text("s2\n")
    assert pack_main(["--src", str(path), "--dst", str(tmp_path / "sub.h5"),
                      "--groups", "images",
                      "--subjects", str(tmp_path / "keys.txt")]) == 0
    r = open_reader(tmp_path / "sub.h5")
    assert r.list_groups() == ["images"]
    assert r.list_keys("images") == ["s2"]
    r.close()


def test_pack_errors(src_h5, tmp_path):
    path, _ = src_h5
    with pytest.raises(SystemExit, match="not found|no keys"):
        pack_main(["--src", str(path), "--dst", str(tmp_path / "x.h5"),
                   "--groups", "nonexistent"])
