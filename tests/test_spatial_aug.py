"""On-device spatial augmentation (ops/augment.py spatial_3d).

Elastic deformation + rotation + isotropic scaling composed into one
trilinear resample inside the jit'd train step — additive capability over
the reference's CPU-side intensity-only Compose
(`/root/reference/examples/train_seg.py:82-86`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.ops.augment import (

    AugmentConfig,
    apply_augmentations,
    nearest_sample,
    spatial_3d,
    trilinear_sample,
)


# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow

def vol(shape=(12, 12, 12), c=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(*shape, c)), jnp.float32)


def test_trilinear_matches_scipy_map_coordinates():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    v = vol()
    rng = np.random.default_rng(1)
    coords = jnp.asarray(
        rng.uniform(-1.0, 12.5, size=(5, 6, 7, 3)), jnp.float32)
    got = np.asarray(trilinear_sample(v, coords))
    pts = np.moveaxis(np.asarray(coords), -1, 0)  # (3, 5, 6, 7)
    for ch in range(v.shape[-1]):
        want = scipy_nd.map_coordinates(
            np.asarray(v[..., ch]), pts, order=1, mode="nearest")
        np.testing.assert_allclose(got[..., ch], want, rtol=1e-5, atol=1e-5)


def test_trilinear_identity_at_integer_coords():
    v = vol()
    base = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                    for s in v.shape[:3]], indexing="ij"),
                     axis=-1)
    np.testing.assert_array_equal(np.asarray(trilinear_sample(v, base)),
                                  np.asarray(v))


def test_nearest_sample_keeps_label_set():
    rng = np.random.default_rng(2)
    lbl = jnp.asarray(rng.integers(0, 4, size=(10, 10, 10, 1)), jnp.uint8)
    coords = jnp.asarray(rng.uniform(0, 9, size=(10, 10, 10, 3)), jnp.float32)
    out = np.asarray(nearest_sample(lbl, coords))
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= set(np.unique(np.asarray(lbl)))


def test_spatial_3d_identity_when_disabled_params():
    x = vol()[None]
    y = spatial_3d(x, jax.random.PRNGKey(0), elastic_sigma=0.0,
                   rotate_deg=0.0, scale_range=None)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_spatial_3d_probability_zero_is_identity():
    x = vol()[None]
    lbl = jnp.asarray((np.asarray(x[..., :1]) > 0), jnp.uint8)
    y, l2 = spatial_3d(x, jax.random.PRNGKey(0), label=lbl,
                       elastic_sigma=4.0, rotate_deg=20.0,
                       scale_range=(0.8, 1.2), p=0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(lbl))


def test_rotation_90deg_matches_rot90_on_odd_volume():
    # odd extent: the center is a grid point, so a 90-degree rotation about
    # one axis maps the grid onto itself exactly
    v = vol(shape=(9, 9, 9), c=1, seed=3)[None]

    def coords_for(angles):
        from tpu_mednet.ops.augment import _rotation_matrix
        shape = v.shape[1:4]
        base = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                        for s in shape], indexing="ij"),
                         axis=-1)
        center = (jnp.asarray(shape, jnp.float32) - 1) / 2
        rel = (base - center) @ _rotation_matrix(jnp.asarray(angles)).T
        return rel + center

    got = trilinear_sample(v[0], coords_for([np.pi / 2, 0.0, 0.0]))
    # Rx(90): out[x, y, z] samples in[x, N-1-z, y] — rot90(k=3) in the
    # (y, z) plane (the output grid PULLS from rotated positions, so the
    # image rotates by the inverse)
    want = np.rot90(np.asarray(v[0]), k=3, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_integer_translation_field_shifts_volume():
    # a constant +2-voxel displacement along x samples from x+2: the output
    # equals the input shifted by -2 (with clamped border)
    v = vol(shape=(8, 8, 8), c=1, seed=4)
    base = jnp.stack(jnp.meshgrid(*[jnp.arange(8, dtype=jnp.float32)] * 3,
                                  indexing="ij"), axis=-1)
    coords = base.at[..., 0].add(2.0)
    out = np.asarray(trilinear_sample(v, coords))
    np.testing.assert_array_equal(out[:6], np.asarray(v)[2:])
    np.testing.assert_array_equal(out[6], np.asarray(v)[7])  # clamped edge


def test_per_sample_independence_and_label_consistency():
    rng = np.random.default_rng(5)
    img = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    img[:, 4:12, 4:12, 4:12] += 4.0
    lbl = (img > 2.0).astype(np.uint8)
    x, l = jnp.asarray(img), jnp.asarray(lbl)
    y, l2 = spatial_3d(x, jax.random.PRNGKey(1), label=l,
                       elastic_sigma=2.0, rotate_deg=15.0,
                       scale_range=(0.9, 1.1))
    y, l2 = np.asarray(y), np.asarray(l2)
    # both samples transformed, and differently (independent params)
    assert (y[0] != img[0]).any() and (y[1] != img[1]).any()
    assert (y[0] - img[0]).std() != pytest.approx((y[1] - img[1]).std())
    # label moved WITH the image: thresholding the warped image overlaps
    # the warped label well, and far better than the unmoved original
    warped_fg = y > 2.0

    def iou(a, b):
        return (a & b).sum() / (a | b).sum()

    assert iou(warped_fg, l2 > 0) > 0.7
    assert iou(warped_fg, l2 > 0) > iou(warped_fg, lbl > 0)


def test_resample_axis_matches_exact_for_single_axis_warp():
    from tpu_mednet.ops.augment import resample_axis

    v = vol(shape=(10, 10, 10), c=2, seed=7)
    rng = np.random.default_rng(8)
    # smooth per-voxel offset along z only, |offset| <= 3
    off = jnp.asarray(rng.uniform(-3, 3, size=(10, 10, 10, 1)), jnp.float32)
    got = resample_axis(v, off, axis=2, band=3)
    base = jnp.stack(jnp.meshgrid(*[jnp.arange(10, dtype=jnp.float32)] * 3,
                                  indexing="ij"), axis=-1)
    coords = base.at[..., 2].add(off[..., 0])
    want = trilinear_sample(v, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # nearest variant equals nearest_sample
    lbl = jnp.asarray((np.asarray(v[..., :1]) > 0), jnp.uint8)
    gotn = resample_axis(lbl, off, axis=2, band=3, nearest=True)
    wantn = nearest_sample(lbl, coords)
    assert gotn.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(gotn), np.asarray(wantn))


def test_resample_axis_loop_path_matches_unrolled():
    # band > unroll_limit switches to the lax.fori_loop accumulator (the
    # O(1)-temps path large rotations need); numerics must be identical
    from tpu_mednet.ops.augment import resample_axis

    v = vol(shape=(24, 8, 8), c=2, seed=9)
    rng = np.random.default_rng(10)
    off = jnp.asarray(rng.uniform(-10, 10, size=(24, 8, 8, 1)), jnp.float32)
    unrolled = resample_axis(v, off, axis=0, band=10, unroll_limit=99)
    looped = resample_axis(v, off, axis=0, band=10, unroll_limit=2)
    np.testing.assert_allclose(np.asarray(looped), np.asarray(unrolled),
                               rtol=1e-6, atol=1e-6)
    lbl = jnp.asarray((np.asarray(v[..., :1]) > 0), jnp.uint8)
    un = resample_axis(lbl, off, axis=0, band=10, nearest=True,
                       unroll_limit=99)
    lo = resample_axis(lbl, off, axis=0, band=10, nearest=True,
                       unroll_limit=2)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(un))


def test_separable_close_to_exact_for_small_deformations():
    # small elastic field on a SMOOTH image: the sequential xyz
    # decomposition sits within a few percent of the exact gather warp
    # (white noise would be unfair — any half-voxel sampling difference
    # decorrelates adjacent noise voxels)
    g = np.stack(np.meshgrid(*[np.arange(16)] * 3, indexing="ij"),
                 -1).astype(np.float32)
    x = jnp.asarray(np.sin(g[..., 0] * 0.4) + np.cos(g[..., 1] * 0.3)
                    + np.sin(g[..., 2] * 0.5))[None, ..., None]
    key = jax.random.PRNGKey(3)
    ysep = np.asarray(spatial_3d(x, key, elastic_sigma=1.5,
                                 method="separable"))
    yex = np.asarray(spatial_3d(x, key, elastic_sigma=1.5, method="exact"))
    assert (ysep != np.asarray(x)).any()
    rng_ = np.asarray(x).max() - np.asarray(x).min()
    assert np.abs(ysep - yex).mean() < 0.05 * rng_
    assert np.corrcoef(ysep.ravel(), yex.ravel())[0, 1] > 0.97


def test_spatial_3d_rejects_unknown_method():
    with pytest.raises(ValueError, match="method"):
        spatial_3d(vol()[None], jax.random.PRNGKey(0), elastic_sigma=1.0,
                   method="bogus")


def test_apply_augmentations_with_spatial_config():
    cfg = AugmentConfig(elastic_sigma=2.0, rotate_deg=10.0,
                        scale_range=(0.9, 1.1))
    assert cfg.wants_spatial()
    x = vol(shape=(12, 12, 12), c=1)[None]
    lbl = jnp.zeros((1, 12, 12, 12, 1), jnp.uint8)
    y, l2 = apply_augmentations(x, jax.random.PRNGKey(0), cfg, label=lbl)
    assert y.shape == x.shape and l2.shape == lbl.shape
    assert not AugmentConfig().wants_spatial()


def test_train_step_with_spatial_augment_compiles_and_learns():
    from tests.test_ema import make_reader, tiny_model
    from tpu_mednet.data import PatchSampler
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import Trainer

    sampler = PatchSampler(None, ["s"], samples_per_subject=8,
                           patch_size=[16, 16, 16], reader=make_reader(),
                           seed=0)
    task = SegmentationTask(model=tiny_model(2), loss="DICE")
    trainer = Trainer(
        task, sampler, batch_size=2, max_epochs=3, learning_rate=1e-2,
        augment=AugmentConfig(elastic_sigma=1.5, rotate_deg=10.0,
                              scale_range=(0.9, 1.1),
                              mirror_axes=(1, 2, 3)),
    )
    state = trainer.fit()
    assert int(state.step) == 12


def test_spatial_aug_under_spatial_sharding_matches_single_device():
    """dp×sp train step WITH the spatial transform == 1-device numerics.

    The separable warp's banded shifts along the sharded patch-X axis
    become collective permutes under GSPMD; the numerics must not change.
    """
    from tpu_mednet.models import UNet3DBase, UNetConfig
    from tpu_mednet.parallel import make_mesh, replicated
    from tpu_mednet.parallel.mesh import train_batch_sharding
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import create_train_state, make_train_step

    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        block="residual", layer_order="cge", num_groups=2,
        dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    rng = np.random.default_rng(6)
    batch_np = {
        "data": rng.normal(size=(4, 16, 8, 8, 1)).astype(np.float32),
        "label": rng.integers(0, 2, size=(4, 16, 8, 8, 1)).astype(np.uint8),
    }
    augment = AugmentConfig(mirror_axes=(1, 2, 3), elastic_sigma=1.5,
                            rotate_deg=10.0, scale_range=(0.9, 1.1))

    def run(mesh):
        state = create_train_state(task.model, (4, 16, 8, 8, 1), 1e-2, seed=0)
        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(task, augment=augment, donate=False)
        sharding = train_batch_sharding(mesh)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch_np)
        losses = []
        for _ in range(2):
            state, m = step(state, batch)
            losses.append(float(m["train_loss"]))
        return losses

    losses_sp = run(make_mesh(n_data=2, n_space=4))
    losses_1 = run(make_mesh(n_data=1, n_space=1,
                             devices=jax.devices()[:1]))
    np.testing.assert_allclose(losses_sp, losses_1, rtol=2e-4)


def test_cli_aug_flags_build_config():
    import argparse

    from tpu_mednet.config import add_common_train_args, augment_config_from_hparams

    p = argparse.ArgumentParser()
    add_common_train_args(p)
    # parse flags from across the whole surface so a structural break in
    # add_common_train_args (e.g. a flag block accidentally orphaned from
    # the function) fails here, not first in a live CLI run
    hp = p.parse_args(["--aug_elastic_sigma", "3", "--aug_rotate_deg", "15",
                       "--aug_scale", "0.85", "1.25", "--aug_mirror",
                       "--max_epochs", "3", "--gpus", "2",
                       "--optimizer", "adamw", "--check_val_every_n_epoch",
                       "2", "--remat", "1"])
    assert hp.max_epochs == 3 and hp.gpus == 2 and hp.optimizer == "adamw"
    cfg = augment_config_from_hparams(hp)
    assert cfg.elastic_sigma == 3 and cfg.rotate_deg == 15
    assert cfg.scale_range == (0.85, 1.25)
    assert cfg.mirror_axes == (1, 2, 3)
    # no flags -> no augmentation
    assert augment_config_from_hparams(p.parse_args([])) is None
    # --data_augmentation alone -> reference intensity chain only
    ref = augment_config_from_hparams(p.parse_args(["--data_augmentation"]))
    assert ref is not None and not ref.wants_spatial()


def test_label_trilinear_channels_warp_like_image():
    # landmark layout: 2 continuous heatmap channels first, class map last.
    # With label_trilinear_channels=2 the heatmap channels must equal the
    # IMAGE warp of their float values (rounded back to uint8), while the
    # class channel stays nearest-warped (in-set).
    rng = np.random.default_rng(7)
    shape = (16, 16, 16)
    img = rng.normal(size=(2, *shape, 1)).astype(np.float32)
    hm = np.zeros((2, *shape, 2), dtype=np.float64)
    for b in range(2):
        for c, center in [(0, (5, 6, 7)), (1, (10, 9, 8))]:
            g = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                                     indexing="ij"), axis=-1)
            d2 = ((g - np.array(center)) ** 2).sum(-1)
            hm[b, ..., c] = 255.0 * np.exp(-d2 / (2 * 2.0 ** 2))
    hm = hm.astype(np.uint8)
    cls = rng.integers(0, 3, size=(2, *shape, 1)).astype(np.uint8)
    lbl = np.concatenate([hm, cls], axis=-1)

    for method in ("separable", "exact"):
        key = jax.random.PRNGKey(3)
        kwargs = dict(elastic_sigma=1.5, rotate_deg=10.0,
                      scale_range=(0.9, 1.1), method=method)
        _, l2 = spatial_3d(jnp.asarray(img), key, label=jnp.asarray(lbl),
                           label_trilinear_channels=2, **kwargs)
        # oracle: warp the float heatmaps through the IMAGE path with the
        # same key (coords depend only on key+shape, not content)
        hm_as_img, cls_only = spatial_3d(
            jnp.asarray(hm.astype(np.float32)), key,
            label=jnp.asarray(cls), **kwargs)
        l2 = np.asarray(l2)
        want_hm = np.round(np.asarray(hm_as_img)).astype(np.uint8)
        np.testing.assert_array_equal(l2[..., :2], want_hm)
        np.testing.assert_array_equal(l2[..., 2:], np.asarray(cls_only))
        # class values stay members of the original set
        assert set(np.unique(l2[..., 2])) <= set(np.unique(cls))
        # the warped heatmap is smoother than a nearest warp: it grows new
        # intermediate values instead of only permuting existing ones
        _, l_near = spatial_3d(jnp.asarray(img), key,
                               label=jnp.asarray(lbl), **kwargs)
        l_near = np.asarray(l_near)
        assert len(np.unique(l2[..., :2])) >= len(np.unique(l_near[..., :2]))


def test_label_trilinear_all_channels_and_float_dtype():
    # k >= C warps every channel linearly; float labels skip the rounding
    rng = np.random.default_rng(8)
    img = rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)
    lbl = rng.normal(size=(1, 8, 8, 8, 2)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    _, l2 = spatial_3d(jnp.asarray(img), key, label=jnp.asarray(lbl),
                       elastic_sigma=1.0, label_trilinear_channels=5)
    x2 = spatial_3d(jnp.asarray(np.concatenate([lbl], -1)), key,
                    elastic_sigma=1.0)
    assert np.asarray(l2).dtype == np.float32
    np.testing.assert_allclose(np.asarray(l2), np.asarray(x2),
                               rtol=1e-5, atol=1e-5)


def test_trainer_auto_sets_heatmap_trilinear_channels(tmp_path):
    from tests.test_train import make_reader, tiny_model
    from tpu_mednet.data import PatchSampler
    from tpu_mednet.ops.augment import AugmentConfig
    from tpu_mednet.tasks import LandmarkTask, SegmentationTask
    from tpu_mednet.train import Trainer

    reader = make_reader(with_heatmaps=True)
    sampler = PatchSampler(None, ["s"], samples_per_subject=2,
                           patch_size=[16, 16, 16],
                           heatmap_group="heatmaps", reader=reader, seed=0)
    aug = AugmentConfig(elastic_sigma=2.0)
    t = Trainer(LandmarkTask(model=tiny_model(4),
                             loss_regression_weight=[0.01, 0.01]),
                sampler, batch_size=2, max_epochs=1, augment=aug)
    assert t.augment.label_trilinear_channels == 2
    # an explicit user value wins
    t2 = Trainer(LandmarkTask(model=tiny_model(4),
                              loss_regression_weight=[0.01, 0.01]),
                 sampler, batch_size=2, max_epochs=1,
                 augment=AugmentConfig(elastic_sigma=2.0,
                                       label_trilinear_channels=1))
    assert t2.augment.label_trilinear_channels == 1
    # segmentation tasks stay nearest-only
    t3 = Trainer(SegmentationTask(model=tiny_model(2), loss="CE"),
                 sampler, batch_size=2, max_epochs=1, augment=aug)
    assert t3.augment.label_trilinear_channels == 0


def test_axis_band_covers_zoom_in_scale_end():
    # regression: the affine displacement bound was evaluated only at
    # max|s| of the scale range, so a zoom-in-dominant range like
    # (0.7, 1.0) got band~1 and the per-axis clip silently flattened the
    # warp to near-identity; the bound is linear in s, so both endpoints
    # must be checked
    from tpu_mednet.ops.augment import _axis_band

    band = _axis_band((96, 96, 96), 0, 0.0, 0.0, (0.7, 1.0))
    assert band >= 15  # 0.3 * 47.5 = 14.25 voxels of corner displacement
    # zoom-out-dominant ranges keep working
    assert _axis_band((96, 96, 96), 0, 0.0, 0.0, (1.0, 1.3)) >= 15


def test_separable_zoom_in_matches_exact_gather():
    # a pure diagonal (scale-only) warp factorizes exactly over the three
    # 1D trilinear passes; before the band fix the separable result was a
    # clipped near-identity instead of the zoom
    x = vol((24, 24, 24), c=1, seed=5)[None]
    key = jax.random.PRNGKey(3)
    ysep = np.asarray(spatial_3d(x, key, scale_range=(0.7, 0.7), p=1.0,
                                 method="separable"))
    yex = np.asarray(spatial_3d(x, key, scale_range=(0.7, 0.7), p=1.0,
                                method="exact"))
    np.testing.assert_allclose(ysep, yex, rtol=1e-4, atol=1e-4)
    assert np.abs(ysep - np.asarray(x)).max() > 0.1  # the zoom applied
