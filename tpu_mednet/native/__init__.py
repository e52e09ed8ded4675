"""Native (C++) runtime layer: build-on-demand + ctypes bindings.

The reference leans on torch's native data-loader machinery (C++ worker
pool behind ``DataLoader(num_workers=...)``,
`/root/reference/midasmednet/segmentation.py:122-131`); this package
is the tpu-mednet equivalent: the per-batch hot path (crop + f16->f32 +
channels-last transpose) compiled from ``patchloader.cpp``, driven from a
Python prefetch thread (`tpu_mednet/data/native_loader.py`).  ctypes drops
the GIL for the duration of each call, so native assembly overlaps TPU
dispatch even single-core.

The library is compiled once on first use (g++ -O3, ~1 s) and cached next
to the source; everything degrades gracefully — ``available()`` is False
when no compiler is present and callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "patchloader.cpp"
_LIB = _HERE / "_patchloader.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> bool:
    """Compile patchloader.cpp -> _patchloader.so if stale or missing."""
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           str(_SRC), "-o", str(_LIB)]
    tmp_path = None
    try:
        # build into a temp file then rename: another process may race us
        with tempfile.NamedTemporaryFile(
                dir=_HERE, suffix=".so.tmp", delete=False) as tmp:
            tmp_path = tmp.name
        cmd[-1] = tmp_path
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, _LIB)
        logger.info("built native patchloader: %s", _LIB)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native patchloader build failed (%s); "
                       "falling back to numpy pipeline", e)
        if tmp_path is not None:
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("TPU_MEDNET_NO_NATIVE"):
        return None
    if not _build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    i64 = ctypes.c_int64
    pp = ctypes.POINTER(ctypes.c_void_p)
    pi64 = ctypes.POINTER(i64)
    lib.assemble_batch.restype = None
    lib.assemble_batch.argtypes = [
        i64,                                     # n
        pp, pi64,                                # img ptrs, dims
        pp, pi64,                                # lbl ptrs, dims
        pp, pi64,                                # hm ptrs, dims (nullable)
        pi64,                                    # corners
        i64, i64, i64,                           # patch dims
        ctypes.POINTER(ctypes.c_float),          # out_data
        ctypes.POINTER(ctypes.c_uint8),          # out_label
    ]
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native assembly core is built and loadable."""
    return _load() is not None


def _ptr_array(vols, dtype) -> "ctypes.Array":
    arr = (ctypes.c_void_p * len(vols))()
    for i, v in enumerate(vols):
        if v is None:
            arr[i] = None
            continue
        if v.dtype != dtype or not v.flags.c_contiguous:
            raise ValueError(f"volume {i}: need C-contiguous {dtype}")
        arr[i] = v.ctypes.data
    return arr


def _dims_array(vols) -> np.ndarray:
    dims = np.zeros((len(vols), 4), dtype=np.int64)
    for i, v in enumerate(vols):
        if v is not None:
            dims[i] = v.shape
    return dims


def assemble_batch(
    images,            # list[np.ndarray (C,X,Y,Z) f16], one per sample
    labels,            # list[np.ndarray (Cl,X,Y,Z) u8]
    heatmaps,          # list[np.ndarray (Ch,X,Y,Z) u8] or None
    corners: np.ndarray,        # (n, 3) int64 patch corners
    patch_size,                 # (px, py, pz)
    out_data: np.ndarray,       # (n, px,py,pz, C) float32, preallocated
    out_label: np.ndarray,      # (n, px,py,pz, Ch+Cl) uint8, preallocated
) -> None:
    """One fused native pass: crop + f16->f32 + channels-last transpose.

    Output layout matches ``PatchSampler.batches(channels_last=True)``
    exactly (heatmap channels first, class map last); equivalence is
    pinned by tests/test_native_loader.py.
    """
    lib = _load()
    if lib is None:  # pragma: no cover - exercised via fallback tests
        raise RuntimeError("native patchloader unavailable")
    n = len(images)
    px, py, pz = (int(p) for p in patch_size)
    c_img = int(images[0].shape[0])
    c_out = int(labels[0].shape[0]) + (
        int(heatmaps[0].shape[0]) if heatmaps is not None else 0)
    if (out_data.shape != (n, px, py, pz, c_img)
            or out_data.dtype != np.float32 or not out_data.flags.c_contiguous):
        raise ValueError("out_data must be C-contiguous "
                         f"({n},{px},{py},{pz},{c_img}) float32")
    if (out_label.shape != (n, px, py, pz, c_out)
            or out_label.dtype != np.uint8 or not out_label.flags.c_contiguous):
        raise ValueError("out_label must be C-contiguous "
                         f"({n},{px},{py},{pz},{c_out}) uint8")
    corners = np.ascontiguousarray(corners, dtype=np.int64)
    img_dims = _dims_array(images)
    lbl_dims = _dims_array(labels)
    hm_list = heatmaps if heatmaps is not None else [None] * n
    hm_dims = _dims_array(hm_list)
    hm_ptrs = (_ptr_array(hm_list, np.uint8) if any(h is not None for h in hm_list)
               else (ctypes.c_void_p * n)())
    lib.assemble_batch(
        n,
        _ptr_array(images, np.float16),
        img_dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr_array(labels, np.uint8),
        lbl_dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hm_ptrs,
        hm_dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        corners.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        px, py, pz,
        out_data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_label.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
