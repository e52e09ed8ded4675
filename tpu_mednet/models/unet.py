"""Configurable 3D U-Net family (vanilla and residual), TPU-first.

One parameterized model family covering both reference networks
(`/root/reference/midasmednet/unet/model.py:11-213`):

- ``UNet3D``       — 4 levels from 64 feature maps, DoubleConv blocks,
                     nearest-resize + concat decoder (model.py:11-110).
- ``ResidualUNet3D`` — 5 levels from 32 feature maps, ExtResNetBlock blocks,
                     transposed-conv + summation decoder (model.py:113-213);
                     the model actually used by both reference tasks.

TPU-first choices: NDHWC layout, bf16 compute / fp32 params, logits cast to
fp32 at the head for loss stability, and the final sigmoid/softmax applied
only in ``testing`` mode exactly like the reference (model.py:107-108,
211-212).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_mednet.models.blocks import DecoderStage, EncoderStage
from tpu_mednet.ops.packed import choose_z_block, pack_z, unpack_z

logger = logging.getLogger(__name__)

Dtype = Any


def create_feature_maps(init_channels: int, num_levels: int) -> Tuple[int, ...]:
    """Geometric x2 progression of per-level feature maps (model.py:7-8)."""
    return tuple(init_channels * 2**k for k in range(num_levels))


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static configuration of a 3D U-Net.

    ``f_maps`` may be an int (expanded geometrically over ``num_levels``
    levels, model.py:44-46,148-150) or an explicit per-level tuple.
    """

    in_channels: int
    out_channels: int
    f_maps: Union[int, Sequence[int]] = 32
    num_levels: int = 5
    block: str = "residual"  # 'double' | 'residual'
    layer_order: str = "cge"
    num_groups: int = 8
    final_sigmoid: bool = False
    skip_final_activation: bool = False
    pool_type: str = "max"
    dtype: Any = jnp.bfloat16
    # weight init: 'torch' matches the reference's effective initialization
    # (torch layer defaults, what the reference model actually trains
    # from); 'lecun' is the flax default
    init_scheme: str = "torch"
    # rematerialize encoder/decoder stages in the backward pass: trades
    # recompute FLOPs for activation HBM, raising the max trainable batch
    # (jax.checkpoint / XLA remat).
    #   False      — store everything
    #   True       — remat every stage
    #   int k >= 1 — remat only the k highest-resolution stages on each
    #                side (where the activations actually live); deeper,
    #                cheap-to-store stages keep their activations
    remat: Union[bool, int] = False
    # z-packed compute mode: fold z-slices into channels at shallow levels
    # so TPU lanes are full (2.6x faster level-0 convs, 4x faster VPU ops;
    # identical logical math and checkpoint-compatible params — see
    # tpu_mednet.ops.packed and docs/PERFORMANCE.md)
    packed: bool = False

    @property
    def feature_maps(self) -> Tuple[int, ...]:
        if isinstance(self.f_maps, int):
            return create_feature_maps(self.f_maps, self.num_levels)
        return tuple(self.f_maps)


class UNet3DBase(nn.Module):
    """Generic 3D U-Net over NDHWC volumes.

    Encoder stack collects per-level features; the decoder consumes them in
    reverse, skipping the deepest (model.py:189-205).  A 1x1x1 conv head
    produces per-voxel logits (model.py:207); sigmoid/softmax is applied only
    when ``testing=True`` (model.py:211-212).
    """

    config: UNetConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = True, testing: bool = False
    ) -> jax.Array:
        cfg = self.config
        f_maps = cfg.feature_maps
        # the residual family's sum-join requires every pooled extent to
        # double back exactly through the stride-2 transposed conv (the
        # torch reference has the same latent constraint but fails deep in
        # a broadcast); fail fast with an actionable message instead
        if cfg.block == "residual":
            div = 2 ** (len(f_maps) - 1)
            bad = [int(s) for s in x.shape[1:4] if int(s) % div]
            if bad:
                raise ValueError(
                    f"spatial extents {tuple(map(int, x.shape[1:4]))} must "
                    f"be divisible by {div} (= 2^(num_levels-1)) for the "
                    f"{len(f_maps)}-level residual U-Net's sum join; "
                    "use a larger patch or fewer levels"
                )
        common = dict(
            block=cfg.block,
            order=cfg.layer_order,
            num_groups=cfg.num_groups,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            init_scheme=cfg.init_scheme,
        )

        # optional per-stage rematerialization: the backward pass recomputes
        # selected stages' activations instead of holding them in HBM
        n_levels = len(f_maps)
        if cfg.remat is True:
            remat_k = n_levels
        elif cfg.remat is False:
            remat_k = 0
        else:
            remat_k = int(cfg.remat)
        run_enc = lambda mdl, x: mdl(x, train=train)
        run_dec = lambda mdl, enc, x: mdl(enc, x, train=train)
        if remat_k > 0:
            # keep the GroupNorm statistics (tiny (N, groups) arrays, tagged
            # with checkpoint_name in ops/packed.py) across the backward:
            # recomputing a stage then re-reduces its GN stats — a full HBM
            # re-read of the activation for a handful of scalars
            policy = jax.checkpoint_policies.save_only_these_names("gn_stats")
            run_enc_remat = nn.remat(
                lambda mdl, x: mdl(x, train=train), policy=policy
            )
            run_dec_remat = nn.remat(
                lambda mdl, enc, x: mdl(enc, x, train=train), policy=policy
            )
        else:
            run_enc_remat, run_dec_remat = run_enc, run_dec

        x = x.astype(cfg.dtype)
        z_extent = x.shape[3]
        # packed_io pipeline (residual nets): the volume is packed ONCE at
        # entry; pooling, skips and joins all stay in packed layout, and
        # per-level block sizes halve with each pool so channels x z_block
        # stays at full lanes.  The 'double' family keeps per-stage packing
        # (its concat join interleaves channels).
        packed_io = cfg.packed and cfg.block == "residual"
        zb0 = choose_z_block(f_maps[0], z_extent) if cfg.packed else 1
        zbs = [max(zb0 >> i, 1) for i in range(n_levels)]
        if packed_io:
            x = pack_z(x, zb0)
        features = []
        for i, out_ch in enumerate(f_maps):
            z_i = z_extent // (2**i)
            if packed_io:
                zb = zbs[i]
            else:
                zb = choose_z_block(out_ch, z_i) if cfg.packed else 1
            stage = EncoderStage(
                out_channels=out_ch,
                apply_pooling=i > 0,
                pool_type=cfg.pool_type,
                z_block=zb,
                packed_io=packed_io,
                z_block_in=zbs[i - 1] if (packed_io and i > 0) else zb,
                name=f"encoder{i}",
                **common,
            )
            # encoder stage i runs at spatial /2^i — remat the shallow ones
            run = run_enc_remat if i < remat_k else run_enc
            x = run(stage, x)
            features.append(x)

        # decoder consumes encoder features deepest-first, skipping the last
        skip_features = features[:-1][::-1]
        n_dec = len(skip_features)
        for i, enc in enumerate(skip_features):
            level = n_dec - 1 - i  # spatial level of this stage's output
            if packed_io:
                zb = zbs[level]
                enc_ch = enc.shape[-1] // zb
            else:
                zb = choose_z_block(enc.shape[-1], enc.shape[3]) if cfg.packed else 1
                enc_ch = enc.shape[-1]
            stage = DecoderStage(
                out_channels=enc_ch,
                z_block=zb,
                packed_io=packed_io,
                name=f"decoder{i}",
                **common,
            )
            # decoder stage i outputs at spatial /2^(n_dec-1-i): the last
            # remat_k stages are the high-resolution ones
            run = run_dec_remat if (n_dec - 1 - i) < remat_k else run_dec
            x = run(stage, enc, x)

        from tpu_mednet.models.blocks import resolve_bias_init, resolve_kernel_init

        if packed_io:
            from tpu_mednet.models.packed_layers import PackedConv

            x = PackedConv(
                features=cfg.out_channels,
                kernel_size=1,
                use_bias=True,
                z_block=zb0,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                kernel_init=resolve_kernel_init(cfg.init_scheme),
                bias_init=resolve_bias_init(
                    cfg.init_scheme, x.shape[-1] // zb0
                ),
                name="final_conv",
            )(x)
            x = unpack_z(x, zb0)
        else:
            x = nn.Conv(
                features=cfg.out_channels,
                kernel_size=(1, 1, 1),
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                kernel_init=resolve_kernel_init(cfg.init_scheme),
                bias_init=resolve_bias_init(cfg.init_scheme, x.shape[-1]),
                name="final_conv",
            )(x)
        # fp32 logits: cheap (tiny channel dim) and stabilizes softmax/Dice.
        x = x.astype(jnp.float32)

        if testing and not cfg.skip_final_activation:
            if cfg.final_sigmoid:
                x = jax.nn.sigmoid(x)
            else:
                x = jax.nn.softmax(x, axis=-1)
        return x


# construction-time kwargs the reference models accept but that are
# call-time concerns here: 'testing' toggles the final activation at
# apply() time (reference model.py:32,74 reads it from **kwargs)
_COMPAT_KWARGS = frozenset({"testing"})


def _check_compat_kwargs(name: str, kwargs: dict) -> None:
    """Warn-ignore known reference-compat kwargs; raise on anything else
    so a typoed or unsupported argument cannot silently train defaults."""
    unknown = set(kwargs) - _COMPAT_KWARGS
    if unknown:
        raise TypeError(
            f"{name}: unknown keyword arguments {sorted(unknown)} "
            f"(known reference-compat kwargs: {sorted(_COMPAT_KWARGS)})"
        )
    if kwargs:
        logger.warning(
            "%s: ignoring reference-compat construction kwargs %s "
            "('testing' is an apply()-time argument here)",
            name, sorted(kwargs),
        )


def UNet3D(
    in_channels: int,
    out_channels: int,
    final_sigmoid: bool = False,
    f_maps: Union[int, Sequence[int]] = 64,
    layer_order: str = "gcr",
    num_groups: int = 8,
    dtype: Any = jnp.bfloat16,
    num_levels: int = 4,
    **kwargs,
) -> UNet3DBase:
    """Vanilla 4-level 3D U-Net (reference model.py:11-110)."""
    _check_compat_kwargs("UNet3D", kwargs)
    cfg = UNetConfig(
        in_channels=in_channels,
        out_channels=out_channels,
        f_maps=f_maps,
        num_levels=num_levels,
        block="double",
        layer_order=layer_order,
        num_groups=num_groups,
        final_sigmoid=final_sigmoid,
        dtype=dtype,
    )
    return UNet3DBase(config=cfg)


def ResidualUNet3D(
    in_channels: int,
    out_channels: int,
    final_sigmoid: bool = False,
    f_maps: Union[int, Sequence[int]] = 32,
    conv_layer_order: str = "cge",
    num_groups: int = 8,
    skip_final_activation: bool = False,
    dtype: Any = jnp.bfloat16,
    remat=False,
    packed: bool = False,
    num_levels: int = 5,
    **kwargs,
) -> UNet3DBase:
    """Residual 5-level 3D U-Net (reference model.py:113-213)."""
    _check_compat_kwargs("ResidualUNet3D", kwargs)
    cfg = UNetConfig(
        in_channels=in_channels,
        out_channels=out_channels,
        f_maps=f_maps,
        num_levels=num_levels,
        block="residual",
        layer_order=conv_layer_order,
        num_groups=num_groups,
        final_sigmoid=final_sigmoid,
        skip_final_activation=skip_final_activation,
        dtype=dtype,
        remat=remat,
        packed=packed,
    )
    return UNet3DBase(config=cfg)
