"""flax modules for the z-packed compute mode (see tpu_mednet.ops.packed).

Parameter trees are IDENTICAL to the plain ``nn.Conv``/``nn.GroupNorm``
modules they replace (``conv/kernel``(+``bias``), ``groupnorm/scale``/
``bias`` with logical channel shapes), so checkpoints are interchangeable
between packed and unpacked execution.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_mednet.ops.packed import (
    build_packed_weights,
    packed_conv_transpose3d,
    packed_group_norm,
)

Dtype = Any


class PackedConv(nn.Module):
    """3^3 SAME conv on a z-packed tensor; params in logical shape."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    z_block: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x_packed: jax.Array) -> jax.Array:
        zb = self.z_block
        k = self.kernel_size
        in_ch = x_packed.shape[-1] // zb
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, k, in_ch, self.features),
            self.param_dtype,
        )
        w = kernel.astype(self.dtype)
        if k == 1:
            # 1x1x1: block-diagonal over packed z-slices
            wp = jnp.zeros((1, 1, 1, zb * in_ch, zb * self.features), self.dtype)
            for zi in range(zb):
                wp = wp.at[
                    :, :, 0, zi * in_ch:(zi + 1) * in_ch,
                    zi * self.features:(zi + 1) * self.features,
                ].set(w[:, :, 0])
        else:
            wp = build_packed_weights(w, zb)
        out = jax.lax.conv_general_dilated(
            x_packed.astype(self.dtype), wp, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            out = out + jnp.tile(bias.astype(self.dtype), zb)
        return out


class PackedConvTranspose(nn.Module):
    """Stride-2 SAME transposed conv on a z-packed tensor.

    Input packed at ``z_block_in``, output packed at ``2*z_block_in`` — the
    packed z extent is unchanged, so the decoder upsample stays in packed
    layout with zero relayout copies.  Params are in logical shape under the
    same names as ``nn.ConvTranspose`` (``kernel``/``bias``), so checkpoints
    are interchangeable with the unpacked decoder.
    """

    features: int
    kernel_size: int = 3
    z_block_in: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x_packed: jax.Array) -> jax.Array:
        k = self.kernel_size
        if k != 3:
            raise ValueError("PackedConvTranspose supports kernel size 3")
        in_ch = x_packed.shape[-1] // self.z_block_in
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, k, in_ch, self.features),
            self.param_dtype,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,),
                self.param_dtype,
            ).astype(self.dtype)
        return packed_conv_transpose3d(
            x_packed.astype(self.dtype),
            kernel.astype(self.dtype),
            self.z_block_in,
            bias=bias,
        )


class PackedGroupNorm(nn.Module):
    """GroupNorm over a z-packed tensor; logical (C,) scale/bias params."""

    num_groups: int
    z_block: int = 1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_packed: jax.Array) -> jax.Array:
        c = x_packed.shape[-1] // self.z_block
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        out = packed_group_norm(
            x_packed, self.z_block, self.num_groups, scale, bias, self.epsilon
        )
        return out.astype(self.dtype)
