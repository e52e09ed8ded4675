"""Host<->device transfer-rate probe for tunnel-normalizing benchmarks.

The axon tunnel's transfer rate varies by session (measured H2D ~15-30
MB/s — docs/PERFORMANCE.md), which round 3-4 showed can swing a
transfer-bound inference bench by 1.5x for identical code.  Benchmarks
embed this probe's output in their JSON record so a regression can be
separated from a slow-tunnel day *from the artifact alone* (VERDICT r4
item 6).  On a real PCIe/ICI host the probe is ~free.
"""

from __future__ import annotations

import time
from typing import Dict


def probe_tunnel(mb: float = 8.0, rtt_reps: int = 5) -> Dict[str, float]:
    """Measure same-session H2D / D2H throughput and scalar-sync RTT.

    Returns ``{"h2d_mb_s", "d2h_mb_s", "rtt_ms", "probe_mb"}``.  Timings
    force host transfers (``jax.device_get`` / ``float(jnp.sum(...))``)
    because ``block_until_ready`` does not synchronize over the axon
    tunnel.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(mb * 1e6 / 2)  # f16 elements
    host = np.zeros((n,), np.float16)

    # warm the dispatch path with a tiny transfer first
    _ = float(jnp.sum(jax.device_put(np.zeros((8,), np.float16))
                      .astype(jnp.float32)))

    t0 = time.perf_counter()
    dev = jax.device_put(host)
    _ = float(jnp.sum(dev.astype(jnp.float32)))  # sync upload
    h2d = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = np.asarray(jax.device_get(dev))
    d2h = time.perf_counter() - t0

    tiny = jnp.zeros((), jnp.float32)
    _ = float(tiny)
    t0 = time.perf_counter()
    for _ in range(rtt_reps):
        _ = float(jnp.sum(tiny))
    rtt = (time.perf_counter() - t0) / rtt_reps

    nbytes = host.nbytes
    return {
        "h2d_mb_s": round(nbytes / 1e6 / h2d, 1),
        "d2h_mb_s": round(nbytes / 1e6 / d2h, 1),
        "rtt_ms": round(rtt * 1e3, 1),
        "probe_mb": round(nbytes / 1e6, 1),
    }
