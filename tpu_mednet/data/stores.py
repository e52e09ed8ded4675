"""In-memory volume group store for assembled inference results.

The reference stitches sliding-window results into an in-memory zarr group
(`/root/reference/midasmednet/dataset.py:433,468-474`) and persists it to
HDF5 or a zarr ZipStore (`examples/predict.py:100-115`).  The result
container is a small dict-backed group with per-dataset attrs and
HDF5/zarr export; zarr export uses the real package when installed and
the bundled spec-compliant v2 implementation (``zarrlite``) otherwise.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    import zarr
except ImportError:
    from tpu_mednet.data import zarrlite as zarr


class VolumeDataset:
    """A named array plus an attrs dict (zarr/h5py-dataset-alike)."""

    def __init__(self, array: np.ndarray):
        self.array = array
        self.attrs: Dict[str, object] = {}

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.array.shape

    @property
    def dtype(self):
        return self.array.dtype

    def __getitem__(self, idx):
        return self.array[idx]

    def __setitem__(self, idx, value):
        self.array[idx] = value

    def __array__(self, dtype=None):
        return np.asarray(self.array, dtype=dtype)


class VolumeGroup:
    """Dict-backed group of named volumes with attrs.

    API subset of a zarr group sufficient for the stitching pipeline:
    ``require_dataset``, item access, iteration, and export.
    """

    def __init__(self):
        self._datasets: Dict[str, VolumeDataset] = {}

    def require_dataset(self, key: str, shape: Tuple[int, ...], dtype) -> VolumeDataset:
        ds = self._datasets.get(key)
        if ds is None:
            ds = VolumeDataset(np.zeros(shape, dtype=dtype))
            self._datasets[key] = ds
        elif ds.shape != tuple(shape) or ds.dtype != np.dtype(dtype):
            raise ValueError(
                f"dataset {key!r} exists with shape={ds.shape} dtype={ds.dtype}, "
                f"requested shape={tuple(shape)} dtype={np.dtype(dtype)}"
            )
        return ds

    def __getitem__(self, key: str) -> VolumeDataset:
        return self._datasets[key]

    def __contains__(self, key: str) -> bool:
        return key in self._datasets

    def __iter__(self) -> Iterator[str]:
        return iter(self._datasets)

    def keys(self):
        return self._datasets.keys()

    def items(self):
        return self._datasets.items()

    def __len__(self) -> int:
        return len(self._datasets)

    # -- persistence ------------------------------------------------------

    def to_hdf5(self, path, group: Optional[str] = None, mode: str = "a") -> None:
        """Persist all datasets (with attrs) into an HDF5 file/group."""
        if h5py is None:  # pragma: no cover
            raise ImportError("h5py is required for to_hdf5")
        with h5py.File(str(path), mode) as hf:
            target = hf.require_group(group) if group else hf
            for key, ds in self._datasets.items():
                if key in target:
                    del target[key]
                out = target.create_dataset(key, data=ds.array)
                for name, value in ds.attrs.items():
                    out.attrs[name] = value

    def to_zarr(self, path, group: Optional[str] = None) -> None:
        """Persist into a zarr store (zarr package, or bundled zarrlite)."""
        root = zarr.open(str(path), mode="a")
        try:
            target = root.require_group(group) if group else root
            for key, ds in self._datasets.items():
                arr = target.create_dataset(
                    key, data=ds.array, shape=ds.shape, dtype=ds.dtype,
                    overwrite=True
                )
                for name, value in ds.attrs.items():
                    arr.attrs[name] = value
        finally:
            # a ZipStore writes its central directory only on close() — a
            # store left to GC finalization can truncate the archive
            store = getattr(root, "store", None)
            if store is not None and hasattr(store, "close"):
                store.close()

    def save(self, path, group: Optional[str] = None) -> None:
        """Persist to ``.h5``/``.hdf5`` or zarr based on the path suffix.

        This is the intended behavior of the reference's save branch
        (predict.py:100-115), whose suffix test was buggy (``.stem`` vs
        ``.suffix``, SURVEY.md §2.4).
        """
        suffix = Path(str(path)).suffix
        if suffix in (".h5", ".hdf5", ".hdf"):
            self.to_hdf5(path, group)
        else:
            self.to_zarr(path, group)
