"""zarrlite: the bundled stdlib-only zarr v2 store.

These tests pin the ON-DISK FORMAT to the zarr v2 spec (so stores written
here are readable by the real package and vice versa — interop with real
zarr itself can't run in this image, where zarr is absent; the format
assertions below are the proxy), and exercise the zarr code paths the
reference has (`/root/reference/midasmednet/dataset.py:179-207`,
`examples/predict.py:100-115`) end-to-end without the package.
"""

import json
import zipfile

import numpy as np
import pytest

from tpu_mednet.data import zarrlite


# ---------------------------------------------------------------------------
# on-disk format compliance (the interop contract with real zarr)
# ---------------------------------------------------------------------------

def test_zarray_metadata_matches_v2_spec(tmp_path):
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    data = np.arange(24, dtype=np.float32).reshape(4, 6)
    root.create_dataset("g/a", data=data, chunks=(3, 4))

    assert json.loads((tmp_path / "s.zarr" / ".zgroup").read_text()) == {
        "zarr_format": 2
    }
    # intermediate group gets its own marker
    assert json.loads((tmp_path / "s.zarr" / "g" / ".zgroup").read_text()) == {
        "zarr_format": 2
    }
    meta = json.loads((tmp_path / "s.zarr" / "g" / "a" / ".zarray").read_text())
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [4, 6]
    assert meta["chunks"] == [3, 4]
    assert meta["dtype"] == "<f4"
    assert meta["compressor"]["id"] == "zlib"
    assert meta["order"] == "C"
    assert meta["filters"] is None
    # chunk grid 2x2, "."-separated keys, all present
    names = sorted(p.name for p in (tmp_path / "s.zarr" / "g" / "a").iterdir()
                   if not p.name.startswith("."))
    assert names == ["0.0", "0.1", "1.0", "1.1"]


def test_chunk_bytes_are_zlib_of_c_order(tmp_path):
    """A full chunk decompresses to exactly tobytes(order='C')."""
    import zlib

    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    data = np.arange(12, dtype=np.int16).reshape(3, 4)
    root.create_dataset("a", data=data, chunks=(3, 4))
    raw = zlib.decompress((tmp_path / "s.zarr" / "a" / "0.0").read_bytes())
    assert raw == data.tobytes(order="C")


def test_partial_edge_chunks_padded_with_fill(tmp_path):
    """Edge chunks are stored full-size, padded with fill_value (spec)."""
    import zlib

    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    data = np.ones((5,), dtype=np.uint8) * 7
    root.create_dataset("a", data=data, chunks=(4,), fill_value=9)
    raw = zlib.decompress((tmp_path / "s.zarr" / "a" / "1").read_bytes())
    assert np.frombuffer(raw, np.uint8).tolist() == [7, 9, 9, 9]
    # ...and the pad does not leak into reads
    assert zarrlite.open(tmp_path / "s.zarr")["a"][:].tolist() == [7] * 5


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.float32, np.float16, np.uint8,
                                   np.int64, np.bool_])
def test_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(5, 7, 3)) * 10).astype(dtype)
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    root.create_dataset("x", data=data, chunks=(2, 4, 3))
    back = zarrlite.open(tmp_path / "s.zarr", mode="r")["x"]
    assert back.dtype == np.dtype(dtype)
    assert back.shape == (5, 7, 3)
    np.testing.assert_array_equal(back[:], data)


def test_basic_indexing(tmp_path):
    data = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    root["x"] = data  # __setitem__ creation, like the reference fixture
    arr = zarrlite.open(tmp_path / "s.zarr")["x"]
    np.testing.assert_array_equal(arr[:-1], data[:-1])
    np.testing.assert_array_equal(arr[-1:], data[-1:])
    np.testing.assert_array_equal(arr[1, ...], data[1, ...])
    np.testing.assert_array_equal(arr[:, 2, 1:4], data[:, 2, 1:4])
    np.testing.assert_array_equal(np.asarray(arr), data)
    assert len(arr) == 3


def test_attrs_persist_and_jsonify(tmp_path):
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    a = root.create_dataset("x", data=np.zeros((2, 2), np.float32))
    a.attrs["affine"] = np.eye(4)  # ndarray auto-converted
    a.attrs["name"] = "s0"
    root.attrs["version"] = np.int64(3)  # numpy scalar auto-converted

    raw = json.loads((tmp_path / "s.zarr" / "x" / ".zattrs").read_text())
    assert raw["affine"] == np.eye(4).tolist()

    re = zarrlite.open(tmp_path / "s.zarr")
    assert np.asarray(re["x"].attrs["affine"]).shape == (4, 4)
    assert re["x"].attrs["name"] == "s0"
    assert re.attrs["version"] == 3


def test_nan_fill_value_and_missing_chunk(tmp_path):
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    arr = root.create_dataset("x", shape=(4,), dtype=np.float32,
                              chunks=(2,), fill_value=np.nan)
    meta = json.loads((tmp_path / "s.zarr" / "x" / ".zarray").read_text())
    assert meta["fill_value"] == "NaN"  # spec string encoding
    # no chunks written yet -> all fill
    assert np.isnan(arr[:]).all()
    arr[0] = 1.5
    re = zarrlite.open(tmp_path / "s.zarr")["x"]
    assert re[0] == 1.5


def test_write_modes_and_errors(tmp_path):
    p = tmp_path / "s.zarr"
    root = zarrlite.open(p, mode="w")
    root.create_dataset("x", data=np.zeros(3, np.float32))
    with pytest.raises(ValueError):
        root.create_dataset("x", data=np.zeros(3, np.float32))  # no overwrite
    root.create_dataset("x", data=np.ones(3, np.float32), overwrite=True)

    ro = zarrlite.open(p, mode="r")
    with pytest.raises(OSError):
        ro.create_dataset("y", data=np.zeros(1, np.float32))
    with pytest.raises(OSError):
        ro["x"][0] = 2.0
    with pytest.raises(KeyError):
        ro["nope"]

    # mode="w" truncates
    root2 = zarrlite.open(p, mode="w")
    assert "x" not in root2
    # mode="r" on a missing path fails loudly
    with pytest.raises(FileNotFoundError):
        zarrlite.open(tmp_path / "absent.zarr", mode="r")


def test_group_iteration_and_containment(tmp_path):
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    root.create_dataset("images/s0", data=np.zeros((2, 2), np.float32))
    root.create_dataset("images/s1", data=np.zeros((2, 2), np.float32))
    root.require_group("empty")
    assert sorted(root) == ["empty", "images"]
    assert sorted(root["images"]) == ["s0", "s1"]  # export.py iterates this
    assert "images" in root and "images/s0" in root and "ghost" not in root
    assert root["images"].array_keys() == ["s0", "s1"]
    assert root.group_keys() == ["empty", "images"]


# ---------------------------------------------------------------------------
# reading foreign v2 layout variants (what real zarr may have written)
# ---------------------------------------------------------------------------

def _write_foreign_array(path, meta: dict, chunks: dict):
    path.mkdir(parents=True)
    (path / ".zarray").write_text(json.dumps(meta))
    for key, buf in chunks.items():
        (path / key).parent.mkdir(parents=True, exist_ok=True)
        (path / key).write_bytes(buf)


def test_read_slash_separator_and_null_compressor(tmp_path):
    """dimension_separator '/' + compressor null, as real zarr can write."""
    data = np.arange(6, dtype=np.int32).reshape(2, 3)
    meta = {
        "zarr_format": 2, "shape": [2, 3], "chunks": [1, 3],
        "dtype": "<i4", "compressor": None, "fill_value": 0,
        "order": "C", "filters": None, "dimension_separator": "/",
    }
    arr_dir = tmp_path / "s.zarr" / "a"
    _write_foreign_array(
        arr_dir, meta,
        {"0/0": data[0:1].tobytes(), "1/0": data[1:2].tobytes()},
    )
    # nested chunk dirs must not be mistaken for members; read via Array
    arr = zarrlite.Array(zarrlite.DirectoryStore(tmp_path / "s.zarr"), "a")
    np.testing.assert_array_equal(arr[:], data)


def test_read_fortran_order_chunks(tmp_path):
    data = np.arange(12, dtype=np.float64).reshape(3, 4)
    meta = {
        "zarr_format": 2, "shape": [3, 4], "chunks": [3, 4],
        "dtype": "<f8", "compressor": None, "fill_value": 0,
        "order": "F", "filters": None,
    }
    _write_foreign_array(tmp_path / "a", meta, {"0.0": data.tobytes(order="F")})
    arr = zarrlite.Array(zarrlite.DirectoryStore(tmp_path), "a")
    np.testing.assert_array_equal(arr[:], data)


def test_read_gzip_compressor(tmp_path):
    import gzip

    data = np.arange(4, dtype=np.uint16)
    meta = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<u2",
        "compressor": {"id": "gzip", "level": 5}, "fill_value": 0,
        "order": "C", "filters": None,
    }
    _write_foreign_array(tmp_path / "a", meta, {"0": gzip.compress(data.tobytes())})
    arr = zarrlite.Array(zarrlite.DirectoryStore(tmp_path), "a")
    np.testing.assert_array_equal(arr[:], data)


def test_blosc_chunks_fail_with_clear_message(tmp_path):
    meta = {
        "zarr_format": 2, "shape": [1], "chunks": [1], "dtype": "|u1",
        "compressor": {"id": "blosc", "cname": "lz4"}, "fill_value": 0,
        "order": "C", "filters": None,
    }
    _write_foreign_array(tmp_path / "a", meta, {"0": b"\x00" * 16})
    arr = zarrlite.Array(zarrlite.DirectoryStore(tmp_path), "a")
    with pytest.raises(RuntimeError, match="blosc"):
        arr[:]


# ---------------------------------------------------------------------------
# ZipStore (reference predict.py:100-115 persists results to a zarr zip)
# ---------------------------------------------------------------------------

def test_zipstore_roundtrip(tmp_path):
    p = tmp_path / "out.zip"
    root = zarrlite.open(p, mode="w")
    data = np.arange(8, dtype=np.float32).reshape(2, 4)
    a = root.create_dataset("prediction/s0", data=data, chunks=(1, 4))
    a.attrs["affine"] = np.eye(4).tolist()
    root.close()

    assert zipfile.is_zipfile(p)
    with zipfile.ZipFile(p) as zf:
        assert "prediction/s0/.zarray" in zf.namelist()

    re = zarrlite.open(p, mode="r")
    arr = re["prediction/s0"]
    np.testing.assert_array_equal(arr[:], data)
    assert np.asarray(arr.attrs["affine"]).shape == (4, 4)
    assert list(re["prediction"]) == ["s0"]
    re.close()


def test_zipstore_is_read_only_in_r_mode(tmp_path):
    p = tmp_path / "out.zip"
    zarrlite.open(p, mode="w").create_dataset("x", data=np.zeros(1, np.float32))
    re = zarrlite.open(p, mode="r")
    with pytest.raises(OSError):
        re.create_dataset("y", data=np.zeros(1, np.float32))
    re.close()


# ---------------------------------------------------------------------------
# regressions (code-review findings, round 3)
# ---------------------------------------------------------------------------

def test_write_to_fortran_order_array_roundtrips(tmp_path):
    """Writes must serialize in the array's declared order — a C-order dump
    into an 'F' array (as real zarr can write) scrambles the next read."""
    data = np.arange(12, dtype=np.float64).reshape(3, 4)
    meta = {
        "zarr_format": 2, "shape": [3, 4], "chunks": [3, 4],
        "dtype": "<f8", "compressor": None, "fill_value": 0,
        "order": "F", "filters": None,
    }
    _write_foreign_array(tmp_path / "a", meta, {"0.0": data.tobytes(order="F")})
    arr = zarrlite.Array(zarrlite.DirectoryStore(tmp_path), "a")
    arr[0, 0] = 99.0
    expect = data.copy()
    expect[0, 0] = 99.0
    # a FRESH read (no cache) must see exactly the assignment
    fresh = zarrlite.Array(zarrlite.DirectoryStore(tmp_path), "a")
    np.testing.assert_array_equal(fresh[:], expect)


def test_overwrite_deletes_stale_chunks(tmp_path):
    """overwrite=True must not resurrect the old array's chunk bytes."""
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    root.create_dataset("x", data=np.arange(8, dtype=np.int64), chunks=(2,))
    # overwrite with a smaller, shape-only float array: no chunks written
    arr = root.create_dataset("x", shape=(4,), dtype=np.float64, chunks=(2,),
                              fill_value=0, overwrite=True)
    np.testing.assert_array_equal(arr[:], np.zeros(4))
    fresh = zarrlite.open(tmp_path / "s.zarr")["x"]
    np.testing.assert_array_equal(fresh[:], np.zeros(4))
    # ...and the old int64 chunk files are actually gone from disk
    names = sorted(p.name for p in (tmp_path / "s.zarr" / "x").iterdir())
    assert names == [".zarray"]


def test_zipstore_overwrite_requires_data(tmp_path):
    """A ZipStore cannot delete, so shape-only overwrite must refuse
    (stale chunks would be read back as garbage); with data it is safe
    (every chunk key is shadowed, last member wins)."""
    p = tmp_path / "out.zip"
    root = zarrlite.open(p, mode="w")
    root.create_dataset("x", data=np.arange(8, dtype=np.int64), chunks=(2,))
    with pytest.raises(ValueError, match="overwrite"):
        root.create_dataset("x", shape=(8,), dtype=np.float64, chunks=(2,),
                            overwrite=True)
    root.create_dataset("x", data=np.ones(8, np.float64), chunks=(2,),
                        overwrite=True)
    root.close()
    re = zarrlite.open(p, mode="r")
    np.testing.assert_array_equal(re["x"][:], np.ones(8))
    re.close()


def test_read_only_directory_store_blocks_attr_writes(tmp_path):
    """Attribute writes must honor mode='r' like array/dataset writes do."""
    root = zarrlite.open(tmp_path / "s.zarr", mode="w")
    root.create_dataset("x", data=np.zeros(2, np.float32))
    ro = zarrlite.open(tmp_path / "s.zarr", mode="r")
    with pytest.raises(OSError):
        ro["x"].attrs["foo"] = 1
    with pytest.raises(OSError):
        ro.attrs["bar"] = 2
    assert "foo" not in zarrlite.open(tmp_path / "s.zarr")["x"].attrs


def test_store_property_and_close_releases_zip_handle(tmp_path):
    """Group/Array expose .store (real-zarr v2 compat) and closing it
    actually releases the zip handle (reader/export close paths)."""
    p = tmp_path / "out.zip"
    root = zarrlite.open(p, mode="w")
    root.create_dataset("x", data=np.zeros(2, np.float32))
    assert root.store is not None
    root.store.close()
    re = zarrlite.open(p, mode="r")
    assert re["x"].store is re.store
    re.store.close()
    with pytest.raises(ValueError):  # zipfile: archive already closed
        re.store["x/.zarray"]
