"""On-device data augmentation, keyed by ``jax.random``.

TPU-native replacement for the reference's CPU-side batchgenerators
pipeline (`/root/reference/examples/train_seg.py:82-86`):

    Compose([BrightnessTransform(mu=0.0, sigma=0.3),
             GammaTransform(gamma_range=(0.7, 1.3)),
             ContrastAugmentationTransform(contrast_range=(0.3, 1.7))])

Instead of mutating numpy arrays in DataLoader workers, these transforms run
*inside the jit'd train step* on the already-device-resident batch — they
fuse with the first conv's input pipeline and cost ~zero HBM round-trips.

All functions take ``x`` of shape (N, X, Y, Z, C) and draw independent
parameters per sample (and per channel where noted).  Semantics follow
batchgenerators' defaults for the three transforms the reference composes,
plus mirror flips (the standard spatial augmentation the north-star names).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def brightness(x: Array, key: Array, mu: float = 0.0, sigma: float = 0.3) -> Array:
    """Additive per-sample, per-channel brightness offset ~ N(mu, sigma)."""
    n, c = x.shape[0], x.shape[-1]
    offs = mu + sigma * jax.random.normal(key, (n, 1, 1, 1, c), dtype=x.dtype)
    return x + offs


def gamma(x: Array, key: Array, gamma_range: Tuple[float, float] = (0.7, 1.3),
          epsilon: float = 1e-7) -> Array:
    """Per-sample gamma warp on the min-max-normalized intensity range."""
    n = x.shape[0]
    g = jax.random.uniform(
        key, (n, 1, 1, 1, 1), dtype=jnp.float32,
        minval=gamma_range[0], maxval=gamma_range[1],
    ).astype(x.dtype)
    reduce_axes = tuple(range(1, x.ndim))
    mn = jnp.min(x, axis=reduce_axes, keepdims=True)
    rng_ = jnp.max(x, axis=reduce_axes, keepdims=True) - mn
    xn = (x - mn) / (rng_ + epsilon)
    return jnp.power(jnp.clip(xn, epsilon, 1.0), g) * rng_ + mn


def contrast(x: Array, key: Array,
             contrast_range: Tuple[float, float] = (0.3, 1.7),
             preserve_range: bool = True,
             per_channel: bool = True) -> Array:
    """Contrast scale about the mean: ``(x - m) * f + m``.

    Matches batchgenerators' ``augment_contrast`` defaults as composed by
    the reference (train_seg.py:86): ``per_channel=True`` draws an
    independent factor per (sample, channel) and takes the mean per
    channel; ``preserve_range=True`` clamps the result back to the
    original [min, max] of the same region, so factors > 1 never push
    intensities outside the input range.
    """
    n, c = x.shape[0], x.shape[-1]
    fshape = (n, 1, 1, 1, c) if per_channel else (n, 1, 1, 1, 1)
    f = jax.random.uniform(
        key, fshape, dtype=jnp.float32,
        minval=contrast_range[0], maxval=contrast_range[1],
    ).astype(x.dtype)
    reduce_axes = (1, 2, 3) if per_channel else tuple(range(1, x.ndim))
    m = jnp.mean(x, axis=reduce_axes, keepdims=True)
    y = (x - m) * f + m
    if preserve_range:
        mn = jnp.min(x, axis=reduce_axes, keepdims=True)
        mx = jnp.max(x, axis=reduce_axes, keepdims=True)
        y = jnp.clip(y, mn, mx)
    return y


def mirror(x: Array, key: Array, label: Optional[Array] = None,
           axes: Sequence[int] = (1, 2, 3), p: float = 0.5):
    """Random per-sample mirror flips along spatial axes.

    Flipping must be applied consistently to image and label; pass ``label``
    to get both back.  Implemented with ``jnp.where`` over flipped copies so
    the batch stays a single fused elementwise op (no per-sample control
    flow under jit).
    """
    n = x.shape[0]
    keys = jax.random.split(key, len(axes))
    y = x
    lbl = label
    for ax, k in zip(axes, keys):
        flip = jax.random.bernoulli(k, p, (n,) + (1,) * (x.ndim - 1))
        y = jnp.where(flip, jnp.flip(y, axis=ax), y)
        if lbl is not None:
            lflip = flip.reshape((n,) + (1,) * (lbl.ndim - 1))
            lbl = jnp.where(lflip, jnp.flip(lbl, axis=ax), lbl)
    if label is not None:
        return y, lbl
    return y


def gaussian_noise(x: Array, key: Array, sigma: float = 0.1) -> Array:
    """Additive voxel-wise gaussian noise."""
    return x + sigma * jax.random.normal(key, x.shape, dtype=x.dtype)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Which augmentations to apply inside the train step.

    Defaults reproduce the reference Compose (train_seg.py:84-86); mirror
    and noise are off by default for parity.
    """

    brightness_mu: float = 0.0
    brightness_sigma: float = 0.3
    gamma_range: Tuple[float, float] = (0.7, 1.3)
    contrast_range: Tuple[float, float] = (0.3, 1.7)
    mirror_axes: Tuple[int, ...] = ()
    noise_sigma: float = 0.0


def apply_augmentations(
    x: Array,
    key: Array,
    config: AugmentConfig,
    label: Optional[Array] = None,
):
    """Compose the configured augmentations (brightness -> gamma -> contrast
    -> mirror -> noise), matching the reference's transform order."""
    k_b, k_g, k_c, k_m, k_n = jax.random.split(key, 5)
    if config.brightness_sigma > 0:
        x = brightness(x, k_b, config.brightness_mu, config.brightness_sigma)
    if config.gamma_range is not None:
        x = gamma(x, k_g, config.gamma_range)
    if config.contrast_range is not None:
        x = contrast(x, k_c, config.contrast_range)
    if config.mirror_axes:
        if label is not None:
            x, label = mirror(x, k_m, label=label, axes=config.mirror_axes)
        else:
            x = mirror(x, k_m, axes=config.mirror_axes)
    if config.noise_sigma > 0:
        x = gaussian_noise(x, k_n, config.noise_sigma)
    if label is not None:
        return x, label
    return x
