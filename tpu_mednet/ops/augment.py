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


# -- spatial transform (elastic + rotation + scaling) -------------------------


def trilinear_sample(vol: Array, coords: Array) -> Array:
    """Sample ``vol`` (X, Y, Z, C) at float ``coords`` (X, Y, Z, 3).

    Trilinear interpolation with edge clamping (border mode 'nearest').
    Eight XLA gathers + fused lerps — the TPU-native equivalent of
    ``scipy.ndimage.map_coordinates(order=1, mode='nearest')``.
    """
    dims = jnp.asarray(vol.shape[:3], jnp.float32) - 1.0
    c = jnp.clip(coords, 0.0, dims)
    lo = jnp.floor(c)
    t = (c - lo).astype(vol.dtype)[..., None, :]           # (X,Y,Z,1,3)
    lo = lo.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, dims.astype(jnp.int32))

    def gather(ix, iy, iz):
        return vol[ix, iy, iz]                              # (X,Y,Z,C)

    c000 = gather(lo[..., 0], lo[..., 1], lo[..., 2])
    c100 = gather(hi[..., 0], lo[..., 1], lo[..., 2])
    c010 = gather(lo[..., 0], hi[..., 1], lo[..., 2])
    c110 = gather(hi[..., 0], hi[..., 1], lo[..., 2])
    c001 = gather(lo[..., 0], lo[..., 1], hi[..., 2])
    c101 = gather(hi[..., 0], lo[..., 1], hi[..., 2])
    c011 = gather(lo[..., 0], hi[..., 1], hi[..., 2])
    c111 = gather(hi[..., 0], hi[..., 1], hi[..., 2])

    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]            # (X,Y,Z,1)
    c00 = c000 * (1 - tx) + c100 * tx
    c10 = c010 * (1 - tx) + c110 * tx
    c01 = c001 * (1 - tx) + c101 * tx
    c11 = c011 * (1 - tx) + c111 * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


def nearest_sample(vol: Array, coords: Array) -> Array:
    """Sample ``vol`` (X, Y, Z, C) at ``coords`` with nearest-neighbor.

    For label maps: values stay members of the original label set
    (``map_coordinates(order=0)``).
    """
    dims = jnp.asarray(vol.shape[:3], jnp.float32) - 1.0
    idx = jnp.clip(jnp.round(coords), 0.0, dims).astype(jnp.int32)
    return vol[idx[..., 0], idx[..., 1], idx[..., 2]]


def _rotation_matrix(angles: Array) -> Array:
    """R = Rx(a) @ Ry(b) @ Rz(c) for ``angles`` (3,) in radians
    (batchgenerators' rotate_coords_3d composition)."""
    ca, cb, cc = jnp.cos(angles[0]), jnp.cos(angles[1]), jnp.cos(angles[2])
    sa, sb, sc = jnp.sin(angles[0]), jnp.sin(angles[1]), jnp.sin(angles[2])
    rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = jnp.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    return rx @ ry @ rz


def _sample_coords(key: Array, shape: Tuple[int, int, int],
                   elastic_sigma: float, elastic_grid: int,
                   rotate_deg: float, scale_range) -> Array:
    """Random deformed sample positions (X, Y, Z, 3) for ONE sample.

    coords = R @ (base - center) * scale + center + displacement, i.e. the
    composition batchgenerators' SpatialTransform applies (elastic +
    rotation + scaling) resolved into ONE resample pass.  The elastic field
    is a coarse ``elastic_grid``³ gaussian grid (sigma in voxels) upsampled
    trilinearly — the modern coarse-grid variant of batchgenerators'
    filtered-noise field, chosen because the upsample is one fused XLA op.
    """
    kd, kr, ks = jax.random.split(key, 3)
    base = jnp.stack(jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in shape], indexing="ij",
    ), axis=-1)                                             # (X,Y,Z,3)
    coords = base
    if rotate_deg or scale_range is not None:
        center = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
        rel = coords - center
        if scale_range is not None:
            sc = jax.random.uniform(ks, (), minval=scale_range[0],
                                    maxval=scale_range[1])
            # scale > 1 samples FARTHER from center: zooms out
            rel = rel * sc
        if rotate_deg:
            ang = jax.random.uniform(
                kr, (3,), minval=-rotate_deg, maxval=rotate_deg,
            ) * (jnp.pi / 180.0)
            rel = rel @ _rotation_matrix(ang).T
        coords = rel + center
    if elastic_sigma:
        g = elastic_grid
        disp = elastic_sigma * jax.random.normal(kd, (g, g, g, 3))
        disp = jax.image.resize(disp, (*shape, 3), method="linear")
        coords = coords + disp
    return coords


def _axis_band(shape, axis: int, elastic_sigma: float, rotate_deg: float,
               scale_range) -> int:
    """Static bound on |displacement| along ``axis`` (voxels).

    Elastic gaussian displacements are clipped to 2.5 sigma (part of the
    transform definition); the affine part is bounded numerically over the
    patch corners at the extreme scale/angles.
    """
    import numpy as np

    band = 2.5 * float(elastic_sigma) if elastic_sigma else 0.0
    if rotate_deg or scale_range is not None:
        half = (np.asarray(shape, np.float64) - 1.0) / 2.0
        # the displacement R*s - I is linear in s at fixed angles, so its
        # max over the scale interval is attained at an ENDPOINT — both
        # must be checked (zoom-in ranges like (0.7, 1.0) displace most at
        # the small end; bounding only max|s| would clip the field to ~0)
        scales = ((float(scale_range[0]), float(scale_range[1]))
                  if scale_range is not None else (1.0,))
        a = np.deg2rad(float(rotate_deg))
        worst = 0.0
        # extreme scales x extreme angle combinations x extreme corners
        # (pure numpy: this runs at TRACE time and must stay static)
        for s in scales:
            for sx in (-a, a):
                for sy in (-a, a):
                    for sz in (-a, a):
                        ca, cb, cc = np.cos([sx, sy, sz])
                        sa, sb, sc2 = np.sin([sx, sy, sz])
                        rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
                        ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
                        rz = np.array([[cc, -sc2, 0], [sc2, cc, 0], [0, 0, 1]])
                        m = (rx @ ry @ rz) * s - np.eye(3)
                        # max over corners of |(m @ corner)[axis]|
                        worst = max(worst, float(np.abs(m[axis]) @ half))
        band += worst
    return int(np.ceil(band)) + 1


def resample_axis(vol: Array, offset: Array, axis: int, band: int,
                  nearest: bool = False, unroll_limit: int = 8) -> Array:
    """1D resample of ``vol`` along a spatial ``axis`` (0..2 of X,Y,Z).

    ``out[p] = vol_interp[p_axis + offset[p]]`` with linear-tent (or
    nearest-box) weights and clamp-to-edge borders.  GATHER-FREE: realized
    as a banded sum of ``2*band + 2`` shifted copies,
    ``sum_k w_k * shift(vol, k)`` — fused multiply-adds the TPU VPU
    streams at bandwidth, where an XLA gather of 4-byte elements runs
    ~1000x below it (measured, docs/PERFORMANCE.md round 3).  ``offset``
    must satisfy ``|offset| <= band`` (the callers clip).

    Up to ``unroll_limit`` the taps are unrolled statically so XLA fuses
    the whole band into one pass; above it they run in a
    ``lax.fori_loop`` carrying only the accumulator — a 15° rotation of
    a 96³ batch-32 patch has band ≈ 49 (~100 taps), and the unrolled
    form keeps every shifted volume live at once (measured 9 GB past
    HBM at the flagship shape), where the loop form is O(1) temps.
    """
    s = vol.shape[axis]
    base = jnp.arange(s, dtype=jnp.float32).reshape(
        [s if i == axis else 1 for i in range(3)] + [1])
    # clamp the SOURCE coordinate to the volume (border mode 'nearest');
    # |src - base| stays <= band because clamping only shrinks it
    src = jnp.clip(base + offset, 0.0, float(s - 1))

    def tap(k, acc):
        d = src - (base + k)                      # distance to this tap
        shifted = jnp.roll(vol, -k, axis=axis)
        if nearest:
            w = (jnp.abs(d) <= 0.5) & (d > -0.5)  # round-half-up one-hot
            return jnp.where(w, shifted, acc)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(vol.dtype)
        return acc + w * shifted

    # init: for nearest, exactly one tap overwrites every voxel (the
    # clamped |src - base| <= band guarantees a hit), so `vol` never
    # survives; for linear, start from zero and accumulate
    init = vol if nearest else jnp.zeros_like(vol)
    if band <= unroll_limit:
        acc = init
        for k in range(-band, band + 2):
            acc = tap(k, acc)
        return acc
    return jax.lax.fori_loop(0, 2 * band + 2,
                             lambda i, acc: tap(i - band, acc), init)


def _separable_warp(vol: Array, disp: Array, bands, nearest: bool) -> Array:
    """Sequential x/y/z 1D resamples approximating the 3D warp ``disp``.

    Exact when the displacement has a single nonzero axis component (pure
    translation, axis-aligned elastic); O(theta^2) cross-term error for
    composed rotations — indistinguishable in augmentation use, and image
    and label always receive the IDENTICAL transform.  method='exact'
    (gather-based ``trilinear_sample``) remains for exact geometry.
    """
    out = vol
    for axis in range(3):
        if bands[axis] > 0:
            out = resample_axis(out, disp[..., axis:axis + 1], axis,
                                bands[axis], nearest=nearest)
    return out


def _warp_label(lbl: Array, warp_linear, warp_nearest,
                trilinear_channels: int) -> Array:
    """Warp a label tensor (X, Y, Z, C): the leading
    ``trilinear_channels`` (continuous heatmap targets, landmark layout:
    heatmaps first / class map last) get the image's linear warp in fp32
    — integer dtypes round back in-range, convex combinations never
    leave [min, max] — while the remaining class channels stay
    nearest-neighbor so label values remain members of the original set.
    """
    c = lbl.shape[-1]
    k = min(trilinear_channels, c)
    if k <= 0:
        return warp_nearest(lbl)
    hm = warp_linear(lbl[..., :k].astype(jnp.float32))
    if jnp.issubdtype(lbl.dtype, jnp.integer):
        hm = jnp.round(hm)
    hm = hm.astype(lbl.dtype)
    if k == c:
        return hm
    return jnp.concatenate([hm, warp_nearest(lbl[..., k:])], axis=-1)


def spatial_3d(
    x: Array,
    key: Array,
    label: Optional[Array] = None,
    elastic_sigma: float = 0.0,
    elastic_grid: int = 4,
    rotate_deg: float = 0.0,
    scale_range: Optional[Tuple[float, float]] = None,
    p: float = 1.0,
    method: str = "separable",
    label_trilinear_channels: int = 0,
):
    """Random per-sample spatial transform of (N, X, Y, Z, C) batches.

    Elastic deformation + rotation + isotropic scaling composed into a
    trilinear resample of the image (and a nearest-neighbor resample of the
    label, so class values stay in-set).  Border mode is clamp-to-edge.
    Each sample draws independent parameters and is transformed with
    probability ``p``.

    ``label_trilinear_channels=k`` marks the label's first ``k`` channels
    as continuous regression targets (landmark heatmaps: heatmaps first /
    class map last) that warp with the image's linear interpolation
    instead of nearest — a nearest-warped Gaussian heatmap keeps its peak
    value but staircases its shape, biasing the MSE target off the true
    sub-voxel landmark position.  The Trainer sets this automatically
    from ``task.num_heatmaps``.

    ``method='separable'`` (default) runs three banded 1D passes — the
    gather-free formulation the TPU executes ~40x faster (see
    ``resample_axis``); elastic displacements are clipped to 2.5 sigma to
    bound the band.  ``method='exact'`` uses one true trilinear gather.
    """
    if method not in ("separable", "exact"):
        raise ValueError(f"unknown spatial method {method!r}")
    n, shape = x.shape[0], x.shape[1:4]
    k_par, k_p = jax.random.split(key)
    keys = jax.random.split(k_par, n)
    apply = jax.random.bernoulli(k_p, p, (n,))
    bands = tuple(
        _axis_band(shape, ax, elastic_sigma, rotate_deg, scale_range)
        if (elastic_sigma or rotate_deg or scale_range is not None) else 0
        for ax in range(3)
    )
    base = jnp.stack(jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in shape], indexing="ij",
    ), axis=-1)

    def per_sample(k, do, vol, lbl):
        coords = _sample_coords(k, shape, elastic_sigma, elastic_grid,
                                rotate_deg, scale_range)
        if method == "separable":
            disp = coords - base
            clip = jnp.asarray(bands, jnp.float32)
            disp = jnp.clip(disp, -clip, clip)
            warped = _separable_warp(vol, disp, bands, nearest=False)
            out = jnp.where(do, warped, vol)
            lout = None
            if lbl is not None:
                lwarp = _warp_label(
                    lbl,
                    lambda t: _separable_warp(t, disp, bands, nearest=False),
                    lambda t: _separable_warp(t, disp, bands, nearest=True),
                    label_trilinear_channels,
                )
                lout = jnp.where(do, lwarp, lbl)
        else:
            out = jnp.where(do, trilinear_sample(vol, coords), vol)
            lout = None
            if lbl is not None:
                lwarp = _warp_label(
                    lbl,
                    lambda t: trilinear_sample(t, coords),
                    lambda t: nearest_sample(t, coords),
                    label_trilinear_channels,
                )
                lout = jnp.where(do, lwarp, lbl)
        return out, lout

    if label is not None:
        y, lab = jax.vmap(per_sample)(keys, apply, x, label)
        return y, lab
    y, _ = jax.vmap(lambda k, d, v: per_sample(k, d, v, None))(keys, apply, x)
    return y


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
    # spatial transform (off by default for reference parity): elastic
    # coarse-grid sigma in voxels, max rotation in degrees, isotropic
    # scale range, applied per sample with spatial_prob
    elastic_sigma: float = 0.0
    elastic_grid: int = 4
    rotate_deg: float = 0.0
    scale_range: Optional[Tuple[float, float]] = None
    spatial_prob: float = 1.0
    # leading label channels that are continuous regression targets
    # (landmark heatmaps): warped with the image's linear interpolation
    # instead of nearest.  The Trainer fills this from task.num_heatmaps.
    label_trilinear_channels: int = 0

    def wants_spatial(self) -> bool:
        return bool(self.elastic_sigma or self.rotate_deg
                    or self.scale_range is not None)


def apply_augmentations(
    x: Array,
    key: Array,
    config: AugmentConfig,
    label: Optional[Array] = None,
):
    """Compose the configured augmentations (spatial -> brightness -> gamma
    -> contrast -> mirror -> noise): the intensity chain keeps the
    reference's transform order; the (additive) spatial transform runs
    first, like batchgenerators pipelines compose SpatialTransform."""
    k_b, k_g, k_c, k_m, k_n, k_s = jax.random.split(key, 6)
    if config.wants_spatial():
        if label is not None:
            x, label = spatial_3d(
                x, k_s, label=label, elastic_sigma=config.elastic_sigma,
                elastic_grid=config.elastic_grid,
                rotate_deg=config.rotate_deg,
                scale_range=config.scale_range, p=config.spatial_prob,
                label_trilinear_channels=config.label_trilinear_channels,
            )
        else:
            x = spatial_3d(
                x, k_s, elastic_sigma=config.elastic_sigma,
                elastic_grid=config.elastic_grid,
                rotate_deg=config.rotate_deg,
                scale_range=config.scale_range, p=config.spatial_prob,
            )
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
