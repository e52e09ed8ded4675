"""z-packed compute mode: fold z-slices into channels to fill TPU lanes.

Measured motivation (docs/PERFORMANCE.md): with C=32 channels in the minor
(lane) dimension, every VPU op uses 32/128 lanes and level-0 convs keep the
MXU at ~13 TFLOP/s, while the same conv at C=128 runs at 130 TFLOP/s.  The
fix without custom kernels: reshape ``(..., Z, C) -> (..., Z/zb, zb*C)`` (a
FREE, contiguous reshape) and express the logical 3x3x3 convolution as a
structured 3x3x3 convolution over packed channels.  The packed weight is
built on the fly from the logical (3,3,3,Ci,Co) parameters — checkpoints
stay layout-independent — and is zero except where the packed z-offset
``zb*(kzp-1) + zi - zo`` lands in {-1,0,1}.

Measured on one v5e: 2.62x faster than the plain conv at identical logical
math (bit-exact in fp32).  GroupNorm/statistics in packed layout regroup
channels as ``(..., zb, C)`` so group statistics aggregate over the packed
z-slices exactly as they would over the equivalent spatial positions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def pack_z(x: Array, zb: int) -> Array:
    """(..., Z, C) -> (..., Z/zb, zb*C); free contiguous reshape."""
    if zb == 1:
        return x
    *lead, z, c = x.shape
    if z % zb != 0:
        raise ValueError(f"Z={z} not divisible by z_block={zb}")
    return x.reshape(*lead, z // zb, zb * c)


def unpack_z(x: Array, zb: int) -> Array:
    """(..., Z/zb, zb*C) -> (..., Z, C)."""
    if zb == 1:
        return x
    *lead, zp, zc = x.shape
    return x.reshape(*lead, zp * zb, zc // zb)


def build_packed_weights(w: Array, zb: int) -> Array:
    """(kx,ky,kz, Ci, Co) logical -> (kx,ky,3, zb*Ci, zb*Co) structured.

    Entry (kzp, zi*Ci+ci, zo*Co+co) equals w[:, :, dz+1, ci, co] when
    ``dz = zb*(kzp-1) + zi - zo`` is in {-1, 0, 1}, else zero.  Cost is a
    handful of slice-writes on a tiny tensor, traced once per step.
    """
    if zb == 1:
        return w
    kx, ky, kz, ci, co = w.shape
    if kz != 3:
        raise ValueError("packed weights support kernel size 3 on z")
    wp = jnp.zeros((kx, ky, 3, zb * ci, zb * co), dtype=w.dtype)
    for kzp in range(3):
        for zi in range(zb):
            for zo in range(zb):
                dz = zb * (kzp - 1) + zi - zo
                if -1 <= dz <= 1:
                    wp = wp.at[
                        :, :, kzp, zi * ci:(zi + 1) * ci, zo * co:(zo + 1) * co
                    ].set(w[:, :, dz + 1])
    return wp


def packed_conv3d(x_packed: Array, w_logical: Array, zb: int,
                  bias: Array = None) -> Array:
    """3^3 'SAME' conv on a z-packed (N, X, Y, Z/zb, zb*Ci) tensor.

    Equivalent (bit-exact in fp32) to unpack -> conv3d(SAME) -> pack.
    """
    wp = build_packed_weights(w_logical, zb)
    out = jax.lax.conv_general_dilated(
        x_packed, wp, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias, zb)
    return out


def build_packed_transpose_weights(w: Array, zb_in: int) -> Array:
    """(kx,ky,3, Ci, Co) logical -> (kx,ky,2, zb_in*Ci, 2*zb_in*Co).

    Structured weight for a stride-2 transposed conv consumed in packed
    layout: the z-upsample is folded into the channel mapping.  The phase
    matches torch ``ConvTranspose3d(k=3, stride=2, padding=1,
    output_padding=1)`` — the reference decoder geometry
    (components.py:259-266), i.e. flax ``ConvTranspose`` with explicit
    padding (1,2): output logical z ``i`` draws from inputs ``j`` with
    ``i = 2j + 1 - t``, so tap ``t`` contributes to packed entry
    (dk, zi, zo) when ``t = 2*(dk*zb_in + zi) - zo + 1`` lands in {0,1,2};
    ``dk`` in {0,1} is the packed-z kernel index (pack offsets 0, +1).
    """
    kx, ky, kz, ci, co = w.shape
    if kz != 3:
        raise ValueError("packed transpose weights support kernel size 3 on z")
    zb_out = 2 * zb_in
    wp = jnp.zeros((kx, ky, 2, zb_in * ci, zb_out * co), dtype=w.dtype)
    for dk in range(2):
        for zi in range(zb_in):
            for zo in range(zb_out):
                t = 2 * (dk * zb_in + zi) - zo + 1
                if 0 <= t <= 2:
                    wp = wp.at[
                        :, :, dk, zi * ci:(zi + 1) * ci, zo * co:(zo + 1) * co
                    ].set(w[:, :, t])
    return wp


def packed_conv_transpose3d(x_packed: Array, w_logical: Array, zb_in: int,
                            bias: Array = None) -> Array:
    """Stride-2 transposed conv (kernel 3) on a z-packed tensor,
    torch-phase geometry (reference components.py:259-266).

    Input is packed at ``zb_in`` over z; output is packed at ``2*zb_in``
    over ``2*z`` — the packed z extent is UNCHANGED, so the upsample needs
    no relayout: x/y upsample via ``lhs_dilation``, z upsample via the
    structured weight.  Bit-exact (fp32) to
    unpack -> flax ConvTranspose(k=3, strides=2, padding=((1,2),)*3) -> pack
    (the torch ConvTranspose3d(k3,s2,p1,op1) phase up to the kernel-flip
    reparameterization).
    """
    wp = build_packed_transpose_weights(w_logical, zb_in)
    out = jax.lax.conv_general_dilated(
        x_packed, wp,
        window_strides=(1, 1, 1),
        padding=((1, 2), (1, 2), (0, 1)),
        lhs_dilation=(2, 2, 1),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias, 2 * zb_in)
    return out


def packed_group_norm_stats(x_packed: Array, zb: int, num_groups: int
                            ) -> Tuple[Array, Array]:
    """(mean, var) per (batch, logical group) over a packed tensor.

    Statistics aggregate over all spatial positions including the packed
    z-slices — identical to GroupNorm on the unpacked tensor.  The per-lane
    moments come from a single-pass Pallas kernel on TPU
    (`ops/pallas/groupnorm.py`); the lane -> group fold is a tiny XLA op.
    """
    from tpu_mednet.ops.pallas.groupnorm import lane_moments

    n = x_packed.shape[0]
    zc = x_packed.shape[-1]
    c = zc // zb
    cg = c // num_groups
    s, q = lane_moments(x_packed)  # (n, zc) fp32 each
    spatial = x_packed.size // (n * zc)
    count = spatial * zb * cg
    sg = s.reshape(n, zb, num_groups, cg).sum(axis=(1, 3))
    qg = q.reshape(n, zb, num_groups, cg).sum(axis=(1, 3))
    mean = sg / count
    var = qg / count - mean**2
    # name the stats so remat policies can SAVE them across the backward
    # (save_only_these_names('gn_stats') in models/unet.py): storing (N, G)
    # scalars is free, recomputing them re-reads the whole activation
    from jax.ad_checkpoint import checkpoint_name

    mean = checkpoint_name(mean, "gn_stats")
    var = checkpoint_name(var, "gn_stats")
    return mean, var


def packed_group_norm(x_packed: Array, zb: int, num_groups: int,
                      scale: Array, bias: Array, epsilon: float = 1e-5) -> Array:
    """GroupNorm on a packed tensor with LOGICAL per-channel scale/bias."""
    n = x_packed.shape[0]
    zc = x_packed.shape[-1]
    c = zc // zb
    mean, var = packed_group_norm_stats(x_packed, zb, num_groups)
    # broadcast (n, G) stats to (n, 1, 1, 1, zb*C)
    per_ch_mean = jnp.repeat(mean, c // num_groups, axis=-1)  # (n, C)
    per_ch_var = jnp.repeat(var, c // num_groups, axis=-1)
    tiled_mean = jnp.tile(per_ch_mean, zb).reshape(n, 1, 1, 1, zc)
    tiled_var = jnp.tile(per_ch_var, zb).reshape(n, 1, 1, 1, zc)
    inv = jax.lax.rsqrt(tiled_var + epsilon)
    xn = (x_packed.astype(jnp.float32) - tiled_mean) * inv
    sc = jnp.tile(scale.astype(jnp.float32), zb)
    bi = jnp.tile(bias.astype(jnp.float32), zb)
    return (xn * sc + bi).astype(x_packed.dtype)


def packed_pool2(x_packed: Array, zb: int, pool_type: str = "max") -> Array:
    """2x2x2 stride-2 pooling directly on a z-packed tensor.

    X/Y pool via ``reduce_window``; the z-pair reduction happens INSIDE the
    lane dimension (z-slices zi and zi+1 of a block live at lane offsets
    zi*C and (zi+1)*C), so no unpack/repack relayout is needed.  Output is
    packed at ``zb // 2`` over the halved z extent — exactly the block size
    the next (channel-doubled) U-Net level wants.  Requires even ``zb``.
    """
    if zb % 2 != 0:
        raise ValueError(f"packed_pool2 needs an even z_block, got {zb}")
    import jax.lax as lax

    init, op = (
        (-jnp.inf, lax.max) if pool_type == "max" else (0.0, lax.add)
    )
    x32 = x_packed.astype(jnp.float32)
    pooled_xy = lax.reduce_window(
        x32, init, op,
        window_dimensions=(1, 2, 2, 1, 1),
        window_strides=(1, 2, 2, 1, 1),
        padding="VALID",
    )
    if pool_type == "avg":
        pooled_xy = pooled_xy / 4.0
    # z-pair reduction as static lane slices (zi lives at lane offset zi*C)
    c = x_packed.shape[-1] // zb
    parts = []
    for j in range(zb // 2):
        a = pooled_xy[..., (2 * j) * c:(2 * j + 1) * c]
        b = pooled_xy[..., (2 * j + 1) * c:(2 * j + 2) * c]
        parts.append(jnp.maximum(a, b) if pool_type == "max" else (a + b) / 2.0)
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return out.astype(x_packed.dtype)


def choose_z_block(channels: int, z_extent: int, max_lanes: int = 128) -> int:
    """Largest power-of-two z-block so packed channels reach ~max_lanes."""
    zb = 1
    while (
        channels * zb * 2 <= max_lanes
        and z_extent % (zb * 2) == 0
    ):
        zb *= 2
    return zb
