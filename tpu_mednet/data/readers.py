"""Volume readers over HDF5 / zarr / in-memory stores.

Capability parity with the reference reader layer
(`/root/reference/midasmednet/dataset.py:109-207`): uniform
``<file>/<group>/<key>`` access, bulk preload to RAM with timing +
tracemalloc telemetry, shape and attribute (``affine``) queries.

Differences from the reference (intended-semantics fixes, SURVEY.md §2.4):

- ``ZarrReader`` is actually functional (the reference's referenced
  undefined names, dataset.py:188-189,203); when the zarr package is
  absent it runs on the bundled spec-compliant v2 store (``zarrlite``).
- A ``MemoryReader`` over plain dict-of-arrays backs tests, benchmarks and
  the sliding-window result store without external deps.
"""

from __future__ import annotations

import logging
import time
import tracemalloc
from collections import deque
from pathlib import Path
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

try:  # optional dependency
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:  # optional dependency; fall back to the bundled v2 implementation
    import zarr
except ImportError:
    from tpu_mednet.data import zarrlite as zarr


def missing_subject_error(reader, group: str, key: str) -> KeyError:
    """A KeyError that names the store, group, and key instead of the
    backend's bare object-path message — the first thing a user with a
    stale keyfile entry hits (VERDICT r4 item 8)."""
    path = getattr(reader, "path_data", "<memory store>")
    try:
        groups = reader.list_groups()
        if group not in groups:
            return KeyError(
                f"group {group!r} not found in {path!s} (available groups: "
                f"{groups}) — check --image_group/--label_group/"
                f"--heatmap_group")
        avail = reader.list_keys(group)
        sample = ", ".join(list(avail)[:5])
        more = "..." if len(avail) > 5 else ""
        return KeyError(
            f"subject {key!r} not found in group {group!r} of {path!s} "
            f"({len(avail)} subjects present, e.g. {sample}{more}) — stale "
            f"keyfile entry?")
    except Exception:  # listing failed: still name the store and key
        return KeyError(f"subject {key!r} not found in group {group!r} of "
                        f"{path!s}")


class DataReader:
    """Abstract reader (reference dataset.py:109-148)."""

    def read(self, subject_keys: Sequence[str], group: str,
             dtype=np.float16, preload: bool = True) -> Iterator[np.ndarray]:
        raise NotImplementedError

    def read_data_to_memory(self, subject_keys: Sequence[str], group: str,
                            dtype=np.float16, preload: bool = True) -> deque:
        """Bulk-read a group into a deque, logging wall time and memory.

        Mirrors the telemetry of the reference (dataset.py:114-139).
        """
        logger.info("loading group [%s]...", group)
        t = time.perf_counter()
        tracemalloc.start()
        it = self.read(subject_keys, group, dtype, preload)
        try:  # tqdm progress on bulk loads (reference dataset.py:158)
            from tqdm import tqdm

            it = tqdm(it, total=len(subject_keys), desc=f"load {group}",
                      disable=None)  # disable=None: off for non-TTY runs
        except ImportError:  # pragma: no cover
            pass
        data = deque(it)
        current, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        logger.debug(
            "finished: %.3f s, current memory usage %.2fGB, peak memory usage %.2fGB",
            time.perf_counter() - t, current / 1e9, peak / 1e9,
        )
        return data

    def get_data_shape(self, subject_keys: Sequence[str], group: str) -> Dict[str, tuple]:
        raise NotImplementedError

    def get_data_attribute(self, subject_keys: Sequence[str], group: str,
                           attribute: str) -> Dict[str, object]:
        raise NotImplementedError

    def list_keys(self, group: str) -> list:
        """Enumerate the subject keys stored under ``group`` (sorted)."""
        raise NotImplementedError

    def list_groups(self) -> list:
        """Enumerate the top-level groups of the store (sorted)."""
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class HDF5Reader(DataReader):
    """HDF5-backed reader (reference ``DataReaderHDF5``, dataset.py:150-177)."""

    def __init__(self, path_data):
        if h5py is None:  # pragma: no cover
            raise ImportError("h5py is required for HDF5Reader")
        self.path_data = path_data
        self.hf = h5py.File(str(path_data), "r")

    def _node(self, group, k):
        try:
            return self.hf[f"{group}/{k}"]
        except KeyError:
            raise missing_subject_error(self, group, k) from None

    def read(self, subject_keys, group, dtype=np.float16, preload=True):
        for k in subject_keys:
            data = self._node(group, k)
            if preload:
                data = np.asarray(data[:], dtype=dtype)
            yield data

    def get_data_shape(self, subject_keys, group):
        return {k: self._node(group, k).shape for k in subject_keys}

    def get_data_attribute(self, subject_keys, group, attribute):
        return {k: self._node(group, k).attrs[attribute] for k in subject_keys}

    def list_keys(self, group):
        return sorted(self.hf[group].keys())

    def list_groups(self):
        return sorted(self.hf.keys())

    def close(self):
        self.hf.close()


class ZarrReader(DataReader):
    """zarr-backed reader — working equivalent of the reference's broken
    ``DataReaderZarr`` (dataset.py:179-207)."""

    def __init__(self, path_data):
        self.path_data = path_data
        self.zf = zarr.open(str(path_data), mode="r")

    def _node(self, group, k):
        try:
            return self.zf[f"{group}/{k}"]
        except KeyError:
            raise missing_subject_error(self, group, k) from None

    def read(self, subject_keys, group, dtype=np.float16, preload=True):
        for k in subject_keys:
            data = self._node(group, k)
            if preload:
                data = np.asarray(data[:], dtype=dtype)
            yield data

    def get_data_shape(self, subject_keys, group):
        return {k: self._node(group, k).shape for k in subject_keys}

    def get_data_attribute(self, subject_keys, group, attribute):
        return {k: self._node(group, k).attrs[attribute] for k in subject_keys}

    def list_keys(self, group):
        return sorted(self.zf[group].keys())

    def list_groups(self):
        return sorted(self.zf.keys())

    def close(self):
        # directory stores hold no handle, but a ZipStore keeps the zip
        # file open — release it (real zarr and zarrlite both expose the
        # backing store as ``.store``)
        store = getattr(self.zf, "store", None)
        if store is not None and hasattr(store, "close"):
            store.close()


class NiftiReader(DataReader):
    """Reader over a directory of per-subject NIfTI volumes.

    Beyond-reference capability (the reference reads HDF5/zarr containers
    only, dataset.py:150-207): medical datasets commonly ship as loose
    ``.nii.gz`` files, and repacking them just to train is friction.  The
    expected layout mirrors the container group structure::

        <root>/<group>/<key>.nii[.gz]      e.g.  data/images/s0.nii.gz
                                                 data/labels/s0.nii.gz

    Volumes follow the framework's channels-first storage convention
    (C, X, Y, Z): a 3D NIfTI yields a leading singleton channel, a 4D one
    maps its trailing (t/channel) axis to the channel axis.  Shape queries
    parse headers only (no voxel payload decompression); per-volume RAS
    affines are exposed via ``get_data_attribute(..., "affine")``.  The
    parser is the bundled dependency-free NIfTI-1 implementation
    (``tpu_mednet.utils.nifti``).
    """

    def __init__(self, path_data):
        self.path_data = Path(str(path_data))
        if not self.path_data.is_dir():
            raise FileNotFoundError(
                f"NiftiReader expects a directory of <group>/<key>.nii[.gz] "
                f"volumes, got {path_data!r}"
            )

    def _path(self, group: str, key: str) -> Path:
        for suffix in (".nii.gz", ".nii"):
            p = self.path_data / group / f"{key}{suffix}"
            if p.exists():
                return p
        raise KeyError(
            f"no NIfTI volume {group}/{key}(.nii|.nii.gz) under "
            f"{self.path_data}"
        )

    @staticmethod
    def _to_channels_first_shape(shape: tuple) -> tuple:
        if len(shape) == 3:
            return (1, *shape)
        if len(shape) == 4:
            return (shape[3], *shape[:3])
        raise ValueError(
            f"NIfTI volumes must be 3D or 4D, got {len(shape)}D {shape}"
        )

    def _load(self, group: str, key: str):
        from tpu_mednet.utils.nifti import load_nifti

        data, affine = load_nifti(self._path(group, key))
        if data.ndim == 3:
            data = data[None]
        elif data.ndim == 4:
            data = np.moveaxis(data, -1, 0)  # (X, Y, Z, C) -> (C, X, Y, Z)
        else:
            raise ValueError(
                f"NIfTI volumes must be 3D or 4D, got {data.ndim}D "
                f"({group}/{key})"
            )
        return data, affine

    def read(self, subject_keys, group, dtype=np.float16, preload=True):
        # the whole file decompresses either way (NIfTI has no chunk
        # story); preload=False just skips the dtype cast, mirroring the
        # raw-handle semantics of the container readers
        for k in subject_keys:
            data, _ = self._load(group, k)
            yield np.asarray(data, dtype=dtype) if preload else data

    def get_data_shape(self, subject_keys, group):
        from tpu_mednet.utils.nifti import read_nifti_header

        return {
            k: self._to_channels_first_shape(
                read_nifti_header(self._path(group, k))[0]
            )
            for k in subject_keys
        }

    def get_data_attribute(self, subject_keys, group, attribute):
        if attribute != "affine":
            raise KeyError(
                f"NIfTI volumes carry only the 'affine' attribute, "
                f"not {attribute!r}"
            )
        from tpu_mednet.utils.nifti import read_nifti_header

        return {
            k: read_nifti_header(self._path(group, k))[2]
            for k in subject_keys
        }

    def list_keys(self, group):
        keys = set()
        for p in (self.path_data / group).glob("*.nii*"):
            name = p.name
            for suffix in (".nii.gz", ".nii"):
                if name.endswith(suffix):
                    keys.add(name[: -len(suffix)])
                    break
        return sorted(keys)

    def list_groups(self):
        return sorted(
            d.name for d in self.path_data.iterdir()
            if d.is_dir() and next(d.glob("*.nii*"), None) is not None
        )


class MemoryReader(DataReader):
    """Reader over an in-memory ``{group: {key: array}}`` mapping.

    Backs unit tests, synthetic fixtures and benchmarks without touching
    disk.  Attributes live in ``attrs[group][key][name]``.
    """

    def __init__(self, store: Dict[str, Dict[str, np.ndarray]],
                 attrs: Optional[Dict[str, Dict[str, Dict[str, object]]]] = None):
        self.store = store
        self.attrs = attrs or {}

    def _node(self, group, k):
        try:
            return self.store[group][k]
        except KeyError:
            raise missing_subject_error(self, group, k) from None

    def read(self, subject_keys, group, dtype=np.float16, preload=True):
        for k in subject_keys:
            data = self._node(group, k)
            if preload:
                data = np.asarray(data, dtype=dtype)
            yield data

    def get_data_shape(self, subject_keys, group):
        return {k: self._node(group, k).shape for k in subject_keys}

    def get_data_attribute(self, subject_keys, group, attribute):
        default = np.eye(4)
        return {
            k: self.attrs.get(group, {}).get(k, {}).get(attribute, default)
            for k in subject_keys
        }

    def list_keys(self, group):
        return sorted(self.store[group].keys())

    def list_groups(self):
        return sorted(self.store.keys())


# Backwards-compatible aliases matching the reference class names.
DataReaderHDF5 = HDF5Reader
DataReaderZarr = ZarrReader
DataReaderNifti = NiftiReader


def read_single_volume(reader: DataReader, key: str, group: str) -> np.ndarray:
    """One subject's volume in its stored dtype (no preload cast).

    The shared idiom of the host-side ops CLIs (evaluate/visualize);
    raises the reader's ``KeyError`` for a missing key or group.
    """
    return np.asarray(next(iter(
        reader.read([key], group, dtype=None, preload=False))))


def open_reader(path, reader_cls=None) -> DataReader:
    """Pick a reader by file suffix unless an explicit class is given."""
    if reader_cls is not None:
        return reader_cls(path)
    p = Path(str(path))
    if p.suffix in (".h5", ".hdf5", ".hdf"):
        return HDF5Reader(p)
    if p.suffix in (".zarr", ".zip"):
        return ZarrReader(p)
    if p.is_dir():
        # a directory can be a zarr store or a folder of NIfTI volumes:
        # zarr markers win; .nii files anywhere one level into a group dir
        # select NIfTI; marker-less directories keep the historic zarr
        # interpretation (foreign-layout stores carry no root markers)
        if (p / ".zgroup").exists() or (p / ".zarray").exists():
            return ZarrReader(p)
        if next(p.glob("*/*.nii*"), None) is not None:
            return NiftiReader(p)
        if next(p.glob("*.nii*"), None) is not None:
            raise ValueError(
                f"{path!s} holds loose .nii files at the top level; the "
                f"NIfTI reader expects <root>/<group>/<key>.nii[.gz] — "
                f"nest them in group directories (e.g. images/)"
            )
        return ZarrReader(p)
    raise ValueError(f"cannot infer reader for {path!r}")
