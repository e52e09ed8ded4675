"""Prefetching native batch pipeline over a ``PatchSampler``.

The tpu-native counterpart of the reference's
``DataLoader(dataset, num_workers=..., pin_memory=True)``
(`/root/reference/midasmednet/segmentation.py:122-131`): index
drawing (class-balanced, seeded) stays in Python — it is cheap and must
match ``PatchSampler`` exactly — while the per-batch heavy lifting (crop,
f16->f32, channels-last transpose) runs in one fused native pass
(`tpu_mednet/native/patchloader.cpp`) on a background thread.  ctypes
releases the GIL during assembly, so building batch N+1 overlaps the TPU
step of batch N; a refcount-gated buffer pool (bounded by the downstream
queue depth) keeps memory at a few batches without ever overwriting an
array a consumer still holds.

Falls back to ``PatchSampler.batches`` (pure numpy, identical output) when
the native library is unavailable or a ``transform`` hook is installed
(transforms are host-side numpy code operating on the reference layout).
Batch-for-batch equivalence with the numpy path is pinned by
tests/test_native_loader.py.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from tpu_mednet import native
from tpu_mednet.data.patch_sampler import PatchSampler
from tpu_mednet.data.sampling import get_labeled_position, get_random_patch_indices

logger = logging.getLogger(__name__)


class NativeBatchPipeline:
    """Iterate epochs of channels-last batches with native assembly.

    Wraps (does not subclass) a ``PatchSampler``: consumes its preloaded
    volumes, rng, class probabilities and any-masks so the drawn patch
    sequence is IDENTICAL to ``sampler.batches(...)`` under the same seed.
    """

    # stands in for a host sampler in the Trainer (which reads these)
    device_resident = False

    def __init__(self, sampler: PatchSampler, prefetch: bool = True):
        self.sampler = sampler
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.sampler)

    @property
    def patch_size(self) -> np.ndarray:
        return self.sampler.patch_size

    def usable(self) -> bool:
        """Native path applies: library built, no host transform hook, and
        volumes preloaded as numpy (a lazy ``preload=False`` sampler holds
        live h5py/zarr window handles — the C++ assembly needs contiguous
        host buffers, and ``np.asarray`` on a handle would silently read
        the WHOLE volume per batch; the numpy fallback path slices only
        the requested windows)."""
        return (native.available() and self.sampler.transform is None
                and isinstance(self.sampler.images[0], np.ndarray))

    # -- index drawing (mirrors PatchSampler.sample minus the array work) --

    class _EpochAbandoned(BaseException):
        """Internal: the consumer abandoned the epoch; the prefetch worker
        unwinds without touching the sampler rng again."""

    def _draw(self, idx: int):
        s = self.sampler
        idx = idx % len(s.images)
        selected_class = 0
        pos = None
        if s.class_probabilities is not None:
            selected_class = int(
                s.rng.choice(len(s.class_probabilities), p=s.class_probabilities)
            )
            if selected_class > 0:
                pos = get_labeled_position(
                    np.asarray(s.labels[idx][-1]), selected_class,
                    label_any=s._label_ax2_any[idx][selected_class],
                    rng=s.rng,
                )
        ini, _ = get_random_patch_indices(
            s.patch_size, s.images[idx].shape[1:], pos=pos, rng=s.rng
        )
        return idx, ini, selected_class

    def _assemble(self, chunk, out_data, out_label, should_stop=None):
        s = self.sampler
        n = len(chunk)
        draws = []
        for i in chunk:
            # the sampler rng is shared with the caller's next-epoch shuffle
            # and is NOT thread-safe: stop drawing the moment the consumer
            # abandons the epoch (teardown then joins before touching rng)
            if should_stop is not None and should_stop():
                raise self._EpochAbandoned
            draws.append(self._draw(int(i)))
        corners = np.stack([d[1] for d in draws]).astype(np.int64)
        subj = [d[0] for d in draws]
        native.assemble_batch(
            [s.images[i] for i in subj],
            [s.labels[i] for i in subj],
            [s.heatmaps[i] for i in subj] if s.heatmaps is not None else None,
            corners,
            s.patch_size,
            out_data[:n],
            out_label[:n],
        )
        return {
            "data": out_data[:n],
            "label": out_label[:n],
            "subject_key": [s.subject_keys[i] for i in subj],
            "selected_class": np.asarray([d[2] for d in draws]),
        }

    # -- epoch iteration ---------------------------------------------------

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch; same order/draw semantics as ``PatchSampler.batches``."""
        s = self.sampler
        if not self.usable():
            yield from s.batches(batch_size, shuffle=shuffle,
                                 drop_last=drop_last)
            return

        order = np.arange(len(s))
        if shuffle:
            s.rng.shuffle(order)
        if 0 < len(order) < batch_size:
            # same tiny-epoch pad as PatchSampler.batches (one-time warning
            # lives there via _pad_warned): a drop_last epoch must not
            # silently yield nothing
            if not s._pad_warned:
                logger.warning(
                    "epoch has %d items (< batch_size %d): padding the "
                    "batch by re-drawing %d samples with replacement",
                    len(order), batch_size, batch_size - len(order),
                )
                s._pad_warned = True
            extra = s.rng.choice(order, size=batch_size - len(order),
                                 replace=True)
            order = np.concatenate([order, extra])
        chunks = []
        for start in range(0, len(order), batch_size):
            chunk = order[start:start + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            chunks.append(chunk)
        if not chunks:
            return

        px, py, pz = (int(p) for p in s.patch_size)
        c_img = int(s.images[0].shape[0])
        c_lbl = int(s.labels[0].shape[0]) + (
            int(s.heatmaps[0].shape[0]) if s.heatmaps is not None else 0)
        # refcount-gated buffer pool: a slot is reused only when nothing
        # outside the pool still references it (the yielded dict holds a
        # VIEW, so the base refcount tracks consumers — including a
        # zero-copy jax.device_put, which pins the source ndarray).  The
        # pool grows only while consumers hold batches, so its size is
        # bounded by the downstream queue depth (2-3 in the train loop).
        import sys

        pool: list = []

        def get_pair():
            for d, l in pool:
                # refs while free: pool tuple + loop locals + getrefcount arg
                if sys.getrefcount(d) <= 3 and sys.getrefcount(l) <= 3:
                    return d, l
            d = np.empty((batch_size, px, py, pz, c_img), np.float32)
            l = np.empty((batch_size, px, py, pz, c_lbl), np.uint8)
            pool.append((d, l))
            return d, l

        if not self.prefetch:
            for chunk in chunks:
                d, l = get_pair()
                yield self._assemble(chunk, d, l)
            return

        q: "queue.Queue" = queue.Queue(maxsize=1)
        stop = threading.Event()

        # rng draws happen on the worker in the SAME sequence (chunks are
        # processed in order), keeping parity with the sequential path
        def worker():
            try:
                for chunk in chunks:
                    if stop.is_set():
                        return
                    d, l = get_pair()
                    q.put(("ok", self._assemble(chunk, d, l,
                                                should_stop=stop.is_set)))
            except self._EpochAbandoned:
                return
            except BaseException as e:  # surface on the consumer side
                q.put(("err", e))
            else:
                q.put(("done", None))

        t = threading.Thread(target=worker, daemon=True,
                             name="tpu-mednet-native-loader")
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    break
                if kind == "err":
                    raise payload
                yield payload
        finally:
            # consumer may abandon the epoch early (break / GeneratorExit):
            # the worker may be blocked in q.put, OR may pass its `stop`
            # check and enter q.put AFTER a one-shot drain (the race that
            # deadlocked the epoch-limited CLI drives: producer in put,
            # consumer in join, forever).  Drain and join must therefore
            # INTERLEAVE until the thread exits — each drain unblocks any
            # late put, and the worker then sees `stop` before the next
            # draw.  Full join (not abandon): the caller reuses the
            # sampler rng for the next epoch's shuffle right after this
            # returns, so the worker must be completely finished.
            stop.set()
            while t.is_alive():
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.05)


def make_batch_source(sampler: PatchSampler,
                      use_native: Optional[bool] = None):
    """Pick the batch source for a sampler.

    ``use_native=None`` auto-selects: native when the library is available
    and no transform hook is set.  Returns an object with a
    ``batches(batch_size, shuffle=..., drop_last=...)`` method.
    """
    pipe = NativeBatchPipeline(sampler)
    if use_native is None:
        use_native = pipe.usable()
    if use_native and not pipe.usable():
        raise RuntimeError(
            "native loader requested but unavailable "
            "(library missing or transform hook set)")
    if use_native:
        logger.info("using native batch pipeline (patchloader.so)")
        return pipe
    return sampler
