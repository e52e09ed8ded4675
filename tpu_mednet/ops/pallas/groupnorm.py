"""Pallas GroupNorm statistics for packed-layout tensors.

The train-step profile (docs/PERFORMANCE.md) shows GroupNorm statistics
(`convert_reduce_fusion`: bf16 -> fp32 convert + full-tensor reduce) as the
second-hottest bucket after the convs.  This kernel computes the per-lane
first and second moments of a 5D activation in ONE bandwidth-bound pass,
accumulating in fp32 VMEM scratch across a sequential grid — the classic
Pallas revisiting-reduction.

The normalize + affine + nonlinearity epilogue deliberately stays in XLA:
it is a per-lane FMA that XLA already fuses into neighbouring elementwise
work; a separate Pallas pass would ADD a read/write.

Differentiability: ``lane_moments`` carries a custom VJP with the closed
forms d(sum x)/dx = g_s and d(sum x^2)/dx = 2 x g_q, broadcast per lane —
plain jnp, so XLA fuses it into the GN backward chain.

MEASURED OUTCOME (v5e, docs/PERFORMANCE.md round 2): the isolated kernel
beats XLA's reduce by 18% (5.5 ms vs 6.5 ms, 246 vs 208 GB/s on the
level-0 tensor) — but swapping it into the train step REGRESSES the full
step 28.1 -> 25.5 patches/s: the opaque custom call breaks the fusion
XLA builds around the stats, and the custom-VJP backward re-reads the
residual.  The kernel therefore dispatches only when
``TPU_MEDNET_PALLAS_GN=1`` is set; the default train path keeps XLA.

Equivalent reference op: GroupNorm statistics inside
`/root/reference/midasmednet/unet/components.py:52-63` (torch
``nn.GroupNorm``), here over the z-packed layout of
``tpu_mednet.ops.packed``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ~5 MB tiles measured fastest on v5e (246 GB/s; 2.4 MB tiles collapse to
# 33 GB/s from per-step overhead, larger double-buffered tiles OOM VMEM)
_TILE_BUDGET = 5 * 1024 * 1024


def _pick_tile(x_extent: int, bytes_per_x: int,
               budget: int = _TILE_BUDGET) -> int:
    """Largest divisor of ``x_extent`` whose tile stays under ``budget``."""
    tx = x_extent
    while tx > 1 and (tx * bytes_per_x > budget or x_extent % tx != 0):
        tx -= 1
    while x_extent % tx != 0:
        tx -= 1
    return max(tx, 1)


def lane_moments_pallas(x: Array, interpret: bool = False
                        ) -> Tuple[Array, Array]:
    """Per-(batch, lane) moments of a (N, X, Y, Zp, ZC) tensor.

    Returns ``(sum, sumsq)``, each (N, ZC) fp32.  ZC must be a multiple of
    128 (full TPU lanes — always true for packed-layout activations).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, xe, ye, zp, zc = x.shape
    bytes_per_x = ye * zp * zc * x.dtype.itemsize
    tx = _pick_tile(xe, bytes_per_x)
    n_tiles = xe // tx

    def kernel(x_ref, s_ref, q_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)
            q_ref[:] = jnp.zeros_like(q_ref)

        # collapse to 2D before reducing: the multi-axis 4D reduce lowers
        # ~7x slower on Mosaic than a single sublane-axis reduce
        xt = x_ref[0].reshape(-1, x_ref.shape[-1])
        s_ref[:] += jnp.sum(xt, axis=0, dtype=jnp.float32)[None, None]
        q_ref[:] += jnp.sum(
            xt.astype(jnp.float32) ** 2, axis=0, dtype=jnp.float32
        )[None, None]

    # out shape (n, 1, zc) with block (1, 1, zc): Mosaic requires the last
    # two block dims to be (8k, 128k) OR equal to the array dims — the
    # singleton middle axis satisfies the latter
    out_spec = pl.BlockSpec((1, 1, zc), lambda i, t: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    s, q = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(
            (1, tx, ye, zp, zc), lambda i, t: (i, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, zc), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, zc), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return s[:, 0], q[:, 0]


def _lane_moments_xla(x: Array) -> Tuple[Array, Array]:
    import os

    if os.environ.get("TPU_MEDNET_GN_STATS") == "bf16":
        # experimental lever (docs/PERFORMANCE.md round-2 #3): square in the
        # input dtype (bf16 multiply, half the convert work) and let the
        # reduce accumulate fp32.  Changes variance numerics slightly —
        # measured before adoption, default OFF.
        return (
            jnp.sum(x, axis=(1, 2, 3), dtype=jnp.float32),
            jnp.sum(x * x, axis=(1, 2, 3), dtype=jnp.float32),
        )
    xf = x.astype(jnp.float32)
    return (
        jnp.sum(xf, axis=(1, 2, 3)),
        jnp.sum(xf**2, axis=(1, 2, 3)),
    )


def _use_pallas(x: Array) -> bool:
    import os

    if os.environ.get("TPU_MEDNET_PALLAS_GN") != "1":
        return False
    if x.ndim != 5 or x.shape[-1] % 128 != 0:
        return False
    # a single-X-slice tile must fit the budget, else VMEM would overflow
    bytes_per_x = x.shape[2] * x.shape[3] * x.shape[4] * x.dtype.itemsize
    if bytes_per_x > _TILE_BUDGET:
        return False
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    # axon is the tunneled TPU platform in this environment
    return platform in ("tpu", "axon")


@jax.custom_vjp
def lane_moments(x: Array) -> Tuple[Array, Array]:
    """(N, X, Y, Zp, ZC) -> per-lane (sum, sumsq), each (N, ZC) fp32.

    Pallas single-pass kernel on TPU for lane-aligned inputs; XLA reduce
    elsewhere.  Identical math either way.
    """
    if _use_pallas(x):
        return lane_moments_pallas(x)
    return _lane_moments_xla(x)


def _lane_moments_fwd(x):
    return lane_moments(x), x


def _lane_moments_bwd(x, g):
    g_s, g_q = g
    shape = (x.shape[0], 1, 1, 1, x.shape[-1])
    dx = (
        g_s.reshape(shape)
        + 2.0 * x.astype(jnp.float32) * g_q.reshape(shape)
    ).astype(x.dtype)
    return (dx,)


lane_moments.defvjp(_lane_moments_fwd, _lane_moments_bwd)
