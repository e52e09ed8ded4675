"""3D U-Net building blocks, TPU-first.

Capability parity with the reference block zoo
(`/root/reference/midasmednet/unet/components.py:8-316`) — the order-string
mini-DSL (`create_conv`, components.py:12-67), `SingleConv`, `DoubleConv`,
`ExtResNetBlock`, `Encoder`, `Decoder`, `FinalConv` — re-designed as
flax.linen modules over **NDHWC (channels-last)** arrays so XLA lowers the 3D
convolutions straight onto the MXU with bf16 inputs and fp32 accumulation.

Design notes (TPU-first, not a translation):

- Layout is N, D, H, W, C.  Channels-last is the native XLA TPU conv layout;
  the reference's NCDHW is a cuDNN convention and would force transposes.
- Compute dtype is configurable (bf16 by default on TPU); parameters are kept
  in fp32 (``param_dtype``).  flax GroupNorm/BatchNorm accumulate statistics
  in fp32.
- The order-string DSL is parsed once at module-construction time; the traced
  forward contains no string handling.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

VALID_ORDER_CHARS = frozenset("crlebg")


def _nonlinearity(char: str) -> Callable[[jax.Array], jax.Array]:
    """Map an order-string character to its activation.

    Mirrors the reference mapping (components.py:36-40): 'r' -> ReLU,
    'l' -> LeakyReLU(0.1), 'e' -> ELU.
    """
    if char == "r":
        return nn.relu
    if char == "l":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if char == "e":
        return nn.elu
    raise ValueError(f"unknown nonlinearity {char!r}")


def validate_order(order: str) -> None:
    """Validate an order string with the reference's rules.

    Reference: components.py:30-31 — a conv must be present, and the first op
    may not be a nonlinearity; components.py:64-65 — only 'bgrlec' allowed.
    """
    if "c" not in order:
        raise ValueError("Conv layer MUST be present in the order string")
    if order[0] in "rle":
        raise ValueError("Non-linearity cannot be the first operation in the layer")
    bad = set(order) - VALID_ORDER_CHARS
    if bad:
        raise ValueError(
            f"Unsupported layer type(s) {sorted(bad)}. MUST be one of ['b','g','r','l','e','c']"
        )


def group_count(num_channels: int, num_groups: int) -> int:
    """Clamp the group count exactly as the reference does.

    components.py:52-56: use a single group when the channel count is smaller
    than the requested group count; channel count must divide evenly.
    """
    if num_channels < num_groups:
        num_groups = 1
    if num_channels % num_groups != 0:
        raise ValueError(
            f"Expected number of channels to be divisible by num_groups. "
            f"num_channels={num_channels}, num_groups={num_groups}"
        )
    return num_groups


def _conv_init_torch(key, shape, dtype):
    """torch ``nn.Conv3d`` default init (the init the reference model
    actually trains from): kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in), fan_in = in_ch * prod(kernel).  Kernel shape here
    is flax's (k, k, k, in, out)."""
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= int(s)
    b = float(fan_in) ** -0.5
    return jax.random.uniform(key, shape, dtype, -b, b)


def _transpose_init_torch(key, shape, dtype):
    """torch ``nn.ConvTranspose3d`` default init: same kaiming_uniform but
    torch's fan_in for transposed weights (in, out, k, k, k) is
    out_ch * prod(kernel) (dim-1 convention)."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= int(s)
    fan_in = int(shape[-1]) * receptive
    b = float(fan_in) ** -0.5
    return jax.random.uniform(key, shape, dtype, -b, b)


def resolve_kernel_init(scheme: str, transpose: bool = False):
    """Map an init-scheme name to a flax kernel initializer.

    ``'torch'`` (default) matches the reference's effective initialization
    (torch layer defaults); ``'lecun'`` is flax's lecun_normal default.
    """
    if scheme == "lecun":
        return nn.initializers.lecun_normal()
    if scheme == "torch":
        return _transpose_init_torch if transpose else _conv_init_torch
    raise ValueError(f"init_scheme must be 'torch' or 'lecun', got {scheme!r}")


def resolve_bias_init(scheme: str, fan_in: int):
    """Bias initializer matching the scheme's layer defaults.

    torch ``nn.Conv3d``/``nn.ConvTranspose3d`` default the bias to
    ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` with the SAME fan_in as the
    kernel (in_ch*prod(k) for conv, out_ch*prod(k) for transpose — the
    dim-1 convention); flax ('lecun') defaults to zeros.  The kernel-only
    version of the torch scheme trained from a measurably different init.
    """
    if scheme == "lecun":
        return nn.initializers.zeros_init()
    if scheme == "torch":
        b = float(fan_in) ** -0.5

        def init(key, shape, dtype):
            return jax.random.uniform(key, shape, dtype, -b, b)

        return init
    raise ValueError(f"init_scheme must be 'torch' or 'lecun', got {scheme!r}")


class ConvLayer(nn.Module):
    """One conv 'layer' described by an order string (e.g. ``'crg'``).

    Equivalent of the reference's ``SingleConv`` /``create_conv``
    (components.py:12-90): a 3D convolution composed, in user-specified
    order, with an optional GroupNorm/BatchNorm and a nonlinearity.  The conv
    carries a bias only when no normalization is present
    (components.py:43).  Norm layers placed before the conv normalize the
    input channel count, after the conv the output channel count — this falls
    out naturally here because ops are applied in order to the running
    activation (components.py:46-50,59-63).
    """

    out_channels: int
    kernel_size: int = 3
    order: str = "crg"
    num_groups: int = 8
    padding: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    init_scheme: str = "torch"
    # z-packed compute mode (tpu_mednet.ops.packed): operate on
    # (..., Z/zb, zb*C) tensors with identical logical math and params
    z_block: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        validate_order(self.order)
        use_bias = not ("g" in self.order or "b" in self.order)
        k = self.kernel_size
        zb = self.z_block
        if zb > 1 and "b" in self.order:
            raise ValueError("packed mode does not support BatchNorm orders")
        for char in self.order:
            if char == "c":
                bias_init = resolve_bias_init(
                    self.init_scheme, (x.shape[-1] // zb) * k**3
                )
                if zb > 1:
                    from tpu_mednet.models.packed_layers import PackedConv

                    x = PackedConv(
                        features=self.out_channels,
                        kernel_size=k,
                        use_bias=use_bias,
                        z_block=zb,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=resolve_kernel_init(self.init_scheme),
                        bias_init=bias_init,
                        name="conv",
                    )(x)
                else:
                    x = nn.Conv(
                        features=self.out_channels,
                        kernel_size=(k, k, k),
                        padding=self.padding,
                        use_bias=use_bias,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=resolve_kernel_init(self.init_scheme),
                        bias_init=bias_init,
                        name="conv",
                    )(x)
            elif char in "rle":
                x = _nonlinearity(char)(x)
            elif char == "g":
                logical_c = x.shape[-1] // zb
                if zb > 1:
                    from tpu_mednet.models.packed_layers import PackedGroupNorm

                    x = PackedGroupNorm(
                        num_groups=group_count(logical_c, self.num_groups),
                        z_block=zb,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="groupnorm",
                    )(x)
                else:
                    x = nn.GroupNorm(
                        num_groups=group_count(logical_c, self.num_groups),
                        epsilon=1e-5,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="groupnorm",
                    )(x)
            elif char == "b":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="batchnorm",
                )(x)
        return x


class DoubleConv(nn.Module):
    """Two consecutive ConvLayers.

    Reference semantics (components.py:93-133): on the encoder path the first
    conv goes to ``max(out_channels // 2, in_channels)`` features; on the
    decoder path both convs output ``out_channels``.
    """

    out_channels: int
    encoder: bool
    kernel_size: int = 3
    order: str = "crg"
    num_groups: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    init_scheme: str = "torch"
    z_block: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        in_channels = x.shape[-1] // self.z_block
        if self.encoder:
            mid = max(self.out_channels // 2, in_channels)
        else:
            mid = self.out_channels
        common = dict(
            kernel_size=self.kernel_size,
            order=self.order,
            num_groups=self.num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            z_block=self.z_block,
        )
        x = ConvLayer(out_channels=mid, name="conv1", **common)(x, train=train)
        x = ConvLayer(out_channels=self.out_channels, name="conv2", **common)(x, train=train)
        return x


def _strip_nonlinearity(order: str) -> str:
    out = order
    for c in "rel":
        out = out.replace(c, "")
    return out


class ExtResNetBlock(nn.Module):
    """SingleConv + residual conv pair + post-residual nonlinearity.

    Reference semantics (components.py:136-180): conv1 adapts channel count
    and its output is the residual; conv2 keeps the full order; conv3 has the
    nonlinearity stripped (it is applied after the residual add); the final
    nonlinearity is LeakyReLU if 'l' in order, ELU if 'e', else ReLU.
    The ``encoder`` flag exists only for call-signature parity with
    DoubleConv; it does not change behavior (components.py:146 ``**kwargs``).
    """

    out_channels: int
    encoder: bool = True
    kernel_size: int = 3
    order: str = "cge"
    num_groups: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    init_scheme: str = "torch"
    z_block: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        common = dict(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            num_groups=self.num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            z_block=self.z_block,
        )
        out = ConvLayer(order=self.order, name="conv1", **common)(x, train=train)
        residual = out
        out = ConvLayer(order=self.order, name="conv2", **common)(out, train=train)
        out = ConvLayer(
            order=_strip_nonlinearity(self.order), name="conv3", **common
        )(out, train=train)
        out = out + residual
        if "l" in self.order:
            out = nn.leaky_relu(out, negative_slope=0.1)
        elif "e" in self.order:
            out = nn.elu(out)
        else:
            out = nn.relu(out)
        return out


BLOCKS = {"double": DoubleConv, "residual": ExtResNetBlock}


def pool3d(x: jax.Array, window: Tuple[int, int, int], pool_type: str) -> jax.Array:
    """2x (or custom-window) downsampling via reduce_window.

    Equivalent of the reference's MaxPool3d/AvgPool3d (components.py:207-214);
    lowers to a single XLA reduce-window on TPU.
    """
    if pool_type == "max":
        return nn.max_pool(x, window_shape=window, strides=window)
    if pool_type == "avg":
        return nn.avg_pool(x, window_shape=window, strides=window)
    raise ValueError(f"pool_type must be 'max' or 'avg', got {pool_type!r}")


class EncoderStage(nn.Module):
    """Optional pooling followed by the basic block.

    Reference: ``Encoder`` (components.py:183-226).
    """

    out_channels: int
    block: str = "double"  # 'double' | 'residual'
    conv_kernel_size: int = 3
    apply_pooling: bool = True
    pool_window: Tuple[int, int, int] = (2, 2, 2)
    pool_type: str = "max"
    order: str = "crg"
    num_groups: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    init_scheme: str = "torch"
    z_block: int = 1
    # packed_io: input/output stay z-packed (pooling runs in packed layout
    # via lane slices) — no per-stage relayout copies.  ``z_block_in`` is
    # the input's packing (the previous stage's z_block); pooling halves it
    # down to this stage's z_block.
    packed_io: bool = False
    z_block_in: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        from tpu_mednet.ops.packed import pack_z, packed_pool2, unpack_z

        if self.packed_io:
            if self.apply_pooling:
                if max(self.z_block_in // 2, 1) != self.z_block:
                    raise ValueError(
                        f"packed_io pooling needs z_block == z_block_in//2 "
                        f"(got in={self.z_block_in}, block={self.z_block})"
                    )
                if self.z_block_in > 1:
                    x = packed_pool2(x, self.z_block_in, self.pool_type)
                else:
                    x = pool3d(x, self.pool_window, self.pool_type)
        else:
            if self.apply_pooling:
                x = pool3d(x, self.pool_window, self.pool_type)
            x = pack_z(x, self.z_block)
        x = BLOCKS[self.block](
            out_channels=self.out_channels,
            encoder=True,
            kernel_size=self.conv_kernel_size,
            order=self.order,
            num_groups=self.num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            z_block=self.z_block,
            name="block",
        )(x, train=train)
        return x if self.packed_io else unpack_z(x, self.z_block)


def resize_nearest(x: jax.Array, spatial: Sequence[int]) -> jax.Array:
    """Nearest-neighbor resize of the three spatial dims of an NDHWC array.

    Equivalent of ``F.interpolate(mode='nearest')`` (components.py:277-278).
    """
    n, _, _, _, c = x.shape
    return jax.image.resize(x, (n, *spatial, c), method="nearest")


class DecoderStage(nn.Module):
    """Upsample + join + basic block.

    Two joining modes, matching the reference ``Decoder``
    (components.py:229-287):

    - ``'double'`` block: nearest-neighbor resize to the encoder feature's
      spatial size, then channel **concatenation** (components.py:275-280).
    - ``'residual'`` block: learned transposed conv (kernel 3, stride = scale
      factor; torch geometry padding=1/output_padding=1, i.e. output size =
      2x input — realized here as a stride-2 ConvTranspose with explicit
      per-axis (1, 2) padding so the output phase matches torch's; flax
      'SAME' is shifted +1 and would misalign the skip-sum), then
      **summation** join (components.py:259-266,281-284).
    """

    out_channels: int
    block: str = "double"
    kernel_size: int = 3
    scale_factor: Tuple[int, int, int] = (2, 2, 2)
    order: str = "crg"
    num_groups: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    init_scheme: str = "torch"
    z_block: int = 1
    # packed_io (residual join only): encoder_features and the output are
    # packed at z_block; x (the deeper decoder output) is packed at
    # max(z_block // 2, 1)
    packed_io: bool = False

    @nn.compact
    def __call__(
        self, encoder_features: jax.Array, x: jax.Array, *, train: bool = True
    ) -> jax.Array:
        from tpu_mednet.ops.packed import pack_z, unpack_z

        if self.packed_io and self.block != "residual":
            raise ValueError("packed_io decoder requires the residual join")
        if self.block == "double":
            x = resize_nearest(x, encoder_features.shape[1:4])
            x = jnp.concatenate([encoder_features, x], axis=-1)
        else:
            k = self.kernel_size
            if self.packed_io and self.z_block > 1:
                # stay in packed layout through the upsample: input packed
                # at z_block//2, output at z_block — no relayout copies
                if self.scale_factor != (2, 2, 2):
                    raise ValueError(
                        "packed_io decoder supports scale_factor (2,2,2)"
                    )
                from tpu_mednet.models.packed_layers import PackedConvTranspose

                x = PackedConvTranspose(
                    features=self.out_channels,
                    kernel_size=k,
                    z_block_in=max(self.z_block // 2, 1),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    kernel_init=resolve_kernel_init(
                        self.init_scheme, transpose=True
                    ),
                    bias_init=resolve_bias_init(
                        self.init_scheme, self.out_channels * k**3
                    ),
                    name="upsample",
                )(x)
            else:
                # torch-phase upsample: ConvTranspose3d(k=3, s=2, p=1,
                # op=1) places an input voxel's taps at output [2j-1, 2j+1]
                # — flax 'SAME' is shifted +1, misaligning the upsample
                # with the skip-sum (verified vs torch; see
                # tests/test_blocks.py torch-geometry golden test)
                if k == 3 and tuple(self.scale_factor) == (2, 2, 2):
                    pad = ((1, 2), (1, 2), (1, 2))
                else:
                    pad = "SAME"
                x = nn.ConvTranspose(
                    features=self.out_channels,
                    kernel_size=(k, k, k),
                    strides=self.scale_factor,
                    padding=pad,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    kernel_init=resolve_kernel_init(
                        self.init_scheme, transpose=True
                    ),
                    bias_init=resolve_bias_init(
                        self.init_scheme, self.out_channels * k**3
                    ),
                    name="upsample",
                )(x)
            x = x + encoder_features
        if not self.packed_io:
            x = pack_z(x, self.z_block)
        x = BLOCKS[self.block](
            out_channels=self.out_channels,
            encoder=False,
            kernel_size=self.kernel_size,
            order=self.order,
            num_groups=self.num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            z_block=self.z_block,
            name="block",
        )(x, train=train)
        return x if self.packed_io else unpack_z(x, self.z_block)


class FinalConv(nn.Module):
    """ConvLayer + 1x1x1 projection head.

    Reference: ``FinalConv`` (components.py:290-316) — defined for parity;
    the two stock U-Nets use a bare 1x1x1 conv instead.
    """

    out_channels: int
    kernel_size: int = 3
    order: str = "crg"
    num_groups: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    init_scheme: str = "torch"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        x = ConvLayer(
            out_channels=x.shape[-1],
            kernel_size=self.kernel_size,
            order=self.order,
            num_groups=self.num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            name="conv",
        )(x, train=train)
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(1, 1, 1),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=resolve_kernel_init(self.init_scheme),
            bias_init=resolve_bias_init(self.init_scheme, x.shape[-1]),
            name="final_conv",
        )(x)
        return x
