"""Asynchronous host->device prefetching.

TPU-native replacement for the reference's DataLoader worker processes +
pinned-memory H2D copies (`/root/reference/midasmednet/segmentation.py:122-131`):
a background thread runs the host-side patch sampling while the device
computes, and batches are ``jax.device_put`` ahead of use so the train step
never waits on PCIe/host (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import jax
import numpy as np

_SENTINEL = object()


def device_prefetch(
    host_iter: Iterator[Dict[str, np.ndarray]],
    sharding=None,
    buffer_size: int = 2,
    array_keys=("data", "label"),
) -> Iterator[Dict[str, object]]:
    """Iterate ``host_iter`` on a background thread, device-putting arrays.

    ``sharding`` (e.g. the data-axis NamedSharding) controls placement; the
    non-array entries of each batch dict pass through untouched.  Errors in
    the producer thread are re-raised at the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)

    def put(batch):
        from tpu_mednet.parallel.multihost import assemble_global_array

        out = dict(batch)
        for k in array_keys:
            if k in out:
                arr = np.ascontiguousarray(out[k])
                # multi-process: this host's rows become its shard of the
                # GLOBAL batch-sharded array (SURVEY §5.8); single-process
                # this is a plain (sharded) device_put
                out[k] = (
                    assemble_global_array(arr, sharding)
                    if sharding is not None
                    else jax.device_put(arr)
                )
        return out

    stop = threading.Event()

    def producer():
        try:
            for batch in host_iter:
                if stop.is_set():
                    return
                q.put(put(batch))
        except BaseException as e:  # surface producer errors to the consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer may abandon the epoch early (break / GeneratorExit):
        # without this the producer stays blocked in q.put forever, leaking
        # a thread + buffered device batches, and — since host_iter shares
        # the sampler's rng with the caller's next-epoch shuffle — racing
        # the rng.  Unblock it, let it see `stop`, and join to completion.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        thread.join()
