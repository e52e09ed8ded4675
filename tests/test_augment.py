"""Tests for on-device augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mednet.ops.augment import (
    AugmentConfig,
    apply_augmentations,
    brightness,
    contrast,
    gamma,
    mirror,
)


def test_brightness_per_sample_offset():
    x = jnp.zeros((4, 2, 2, 2, 1))
    y = brightness(x, jax.random.PRNGKey(0), mu=0.0, sigma=1.0)
    # constant offset within each sample, different across samples
    per_sample = np.asarray(y).reshape(4, -1)
    for row in per_sample:
        assert np.allclose(row, row[0])
    assert len(np.unique(per_sample[:, 0])) == 4


def test_gamma_preserves_range():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 10, (2, 4, 4, 4, 1)))
    y = gamma(x, jax.random.PRNGKey(1), (0.7, 1.3))
    assert np.asarray(y).min() >= np.asarray(x).min() - 1e-3
    assert np.asarray(y).max() <= np.asarray(x).max() + 1e-3


def test_contrast_preserves_mean():
    # exact mean preservation holds without the range clamp
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4, 4, 4, 1)))
    y = contrast(x, jax.random.PRNGKey(2), (0.3, 1.7), preserve_range=False)
    np.testing.assert_allclose(
        np.asarray(y).reshape(3, -1).mean(axis=1),
        np.asarray(x).reshape(3, -1).mean(axis=1),
        atol=1e-5,
    )


def test_contrast_preserve_range_clamps():
    # factors > 1 overshoot the input range; batchgenerators' default
    # preserve_range=True clips back to the original per-channel [min, max]
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 4, 4, 4, 2)))
    key = jax.random.PRNGKey(5)
    unclamped = contrast(x, key, (1.5, 1.7), preserve_range=False)
    clamped = contrast(x, key, (1.5, 1.7), preserve_range=True)
    xm = np.asarray(x)
    for s in range(2):
        for ch in range(2):
            lo, hi = xm[s, ..., ch].min(), xm[s, ..., ch].max()
            assert np.asarray(unclamped)[s, ..., ch].max() > hi  # would overshoot
            got = np.asarray(clamped)[s, ..., ch]
            assert got.min() >= lo - 1e-6 and got.max() <= hi + 1e-6


def test_contrast_per_channel_factors():
    # per_channel=True (the reference default) draws an independent factor
    # per (sample, channel): recover the implied factor from an unclamped
    # transform and check channels differ
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 4, 4, 4, 3)))
    y = contrast(x, jax.random.PRNGKey(8), (0.3, 1.7), preserve_range=False)
    xm, ym = np.asarray(x), np.asarray(y)
    factors = []
    for ch in range(3):
        xc, yc = xm[0, ..., ch], ym[0, ..., ch]
        m = xc.mean()
        f = (yc - m).ravel() / (xc - m).ravel()
        np.testing.assert_allclose(f, f[0], rtol=1e-4)  # constant within channel
        factors.append(f[0])
    assert len(np.unique(np.round(factors, 6))) == 3


def test_mirror_consistent_with_label():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32))
    lbl = (np.asarray(x) > 0).astype(np.uint8)
    y, ylbl = mirror(x, jax.random.PRNGKey(3), label=jnp.asarray(lbl))
    # wherever image was flipped, the label must be flipped identically
    np.testing.assert_array_equal(np.asarray(ylbl), (np.asarray(y) > 0).astype(np.uint8))


def test_apply_augmentations_jits():
    cfg = AugmentConfig(mirror_axes=(1, 2, 3), noise_sigma=0.05)
    x = jnp.ones((2, 4, 4, 4, 1))
    lbl = jnp.zeros((2, 4, 4, 4, 2), jnp.uint8)
    f = jax.jit(lambda x, l, k: apply_augmentations(x, k, cfg, label=l))
    y, yl = f(x, lbl, jax.random.PRNGKey(0))
    assert y.shape == x.shape and yl.shape == lbl.shape


def test_augmentations_deterministic_per_key():
    cfg = AugmentConfig()
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 4, 4, 1)))
    a = apply_augmentations(x, jax.random.PRNGKey(7), cfg)
    b = apply_augmentations(x, jax.random.PRNGKey(7), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
