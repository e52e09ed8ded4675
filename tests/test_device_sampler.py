"""Tests for the HBM-resident patch sampler and weighted inference."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.data import MemoryReader
from tpu_mednet.data.device_sampler import DevicePatchSampler
from tpu_mednet.inference.weighted import gaussian_window, predict_volumes_weighted
from tpu_mednet.models import UNet3DBase, UNetConfig
from tpu_mednet.tasks import SegmentationTask
from tpu_mednet.train import Trainer, create_train_state


def make_reader(shapes=((24, 24, 24), (28, 20, 24))):
    rng = np.random.default_rng(0)
    store = {"images": {}, "labels": {}}
    attrs = {"images": {}}
    for i, shape in enumerate(shapes):
        key = f"s{i}"
        img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
        lbl = np.zeros((1, *shape), dtype=np.uint8)
        lbl[0, 4:12, 4:12, 4:12] = 1
        img[0, 4:12, 4:12, 4:12] += 2.0
        store["images"][key] = img
        store["labels"][key] = lbl
        attrs["images"][key] = {"affine": np.eye(4)}
    return MemoryReader(store, attrs)


def test_device_sampler_batches():
    ds = DevicePatchSampler(
        None, ["s0", "s1"], samples_per_subject=4, patch_size=[8, 8, 8],
        reader=make_reader(), image_dtype=jnp.float32, seed=0,
    )
    batches = list(ds.batches(4))
    assert len(batches) == 2
    b = batches[0]
    assert b["data"].shape == (4, 8, 8, 8, 1)
    assert b["label"].shape == (4, 8, 8, 8, 1)
    assert ds.device_resident


def test_device_sampler_patches_match_host_volumes():
    """Gathered patches must equal the host crop at the same corner."""
    reader = make_reader()
    ds = DevicePatchSampler(
        None, ["s0", "s1"], samples_per_subject=4, patch_size=[8, 8, 8],
        reader=reader, image_dtype=jnp.float32, seed=3,
    )
    subj, corners = ds.sample_indices(6)
    out = ds._gather(ds.images, ds.labels, ds.landmarks_dev, subj, corners)
    imgs = list(reader.read(["s0", "s1"], "images", dtype=np.float32))
    for i in range(6):
        s = int(subj[i])
        x, y, z = (int(v) for v in corners[i])
        expect = np.moveaxis(imgs[s][:, x:x+8, y:y+8, z:z+8], 0, -1)
        np.testing.assert_allclose(np.asarray(out["data"][i]), expect, atol=1e-6)


def test_device_sampler_class_balanced():
    ds = DevicePatchSampler(
        None, ["s0"], samples_per_subject=16, patch_size=[8, 8, 8],
        reader=make_reader(), class_probabilities=[0.0, 1.0],
        image_dtype=jnp.float32, seed=1,
    )
    for b in ds.batches(8):
        lbl = np.asarray(b["label"])
        for i in range(lbl.shape[0]):
            assert np.any(lbl[i] == 1)


def test_device_sampler_corners_respect_true_shape():
    ds = DevicePatchSampler(
        None, ["s0", "s1"], samples_per_subject=32, patch_size=[16, 16, 16],
        reader=make_reader(), image_dtype=jnp.float32, seed=2,
    )
    subj, corners = ds.sample_indices(64)
    for s, c in zip(np.asarray(subj), np.asarray(corners)):
        assert np.all(c + 16 <= ds.shapes[s]), (s, c, ds.shapes[s])


@pytest.mark.slow  # heavy jit/fit (measured r5)
def test_trainer_with_device_sampler():
    ds = DevicePatchSampler(
        None, ["s0", "s1"], samples_per_subject=4, patch_size=[8, 8, 8],
        reader=make_reader(), image_dtype=jnp.float32,
    )
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    trainer = Trainer(task, ds, batch_size=4, max_epochs=2)
    state = trainer.fit()
    assert int(state.step) == 4


def test_gaussian_window_properties():
    w = gaussian_window([8, 8, 8])
    assert w.shape == (8, 8, 8)
    assert abs(w[3, 3, 3] - w.max()) < 1e-6  # peak at center (n-1)/2 rounded
    assert w.min() >= 1e-3


def test_weighted_inference_matches_geometry():
    reader = make_reader(shapes=((24, 24, 24),))
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    state = create_train_state(model, (2, 8, 8, 8, 1), 1e-3)
    variables = {"params": state.params}
    results = predict_volumes_weighted(
        task, variables, None, ["s0"], patch_size=[8, 8, 8],
        patch_overlap=[2, 2, 2], batch_size=4, reader=reader,
    )
    vol = np.asarray(results["s0"])
    assert vol.shape == (1, 24, 24, 24)
    assert vol.dtype == np.uint8
    assert set(np.unique(vol)) <= {0, 1}


def test_device_sampler_landmark_synthesis():
    """Heatmaps synthesized on device from coords match patch geometry."""
    reader = make_reader(shapes=((24, 24, 24),))
    # two landmarks: one at (8,8,8), one missing (sentinel -9999)
    reader.store["landmarks"] = {"s0": np.asarray(
        [[8.0, 8.0, 8.0], [-9999.0, -9999.0, -9999.0]], dtype=np.float32)}
    ds = DevicePatchSampler(
        None, ["s0"], samples_per_subject=4, patch_size=[16, 16, 16],
        landmark_group="landmarks", heatmap_sigma=2.0,
        reader=reader, image_dtype=jnp.float32, seed=0,
    )
    subj = jnp.zeros((2,), jnp.int32)
    corners = jnp.asarray([[0, 0, 0], [8, 8, 8]], jnp.int32)
    out = ds._gather(ds.images, ds.labels, ds.landmarks_dev, subj, corners)
    label = np.asarray(out["label"])
    assert label.shape == (2, 16, 16, 16, 3)  # 2 heatmaps + class map last
    # patch at corner 0: landmark 0 at local (8,8,8) -> peak 255
    assert label[0, 8, 8, 8, 0] == 255
    # patch at corner (8,8,8): landmark 0 at local (0,0,0) -> peak at origin
    assert label[1, 0, 0, 0, 0] == 255
    # absent landmark channel all zero
    assert label[..., 1].max() == 0
    # class map still last channel
    assert set(np.unique(label[..., -1])) <= {0, 1}


def test_device_sampler_rejects_both_heatmap_sources():
    reader = make_reader(shapes=((24, 24, 24),))
    with pytest.raises(ValueError):
        DevicePatchSampler(
            None, ["s0"], 1, [8, 8, 8], heatmap_group="h",
            landmark_group="l", reader=reader,
        )


@pytest.mark.slow  # heavy jit/fit (measured r5)
def test_on_device_inference_matches_host_stitched():
    from tpu_mednet.inference.device_sliding import predict_volumes_on_device
    from tpu_mednet.inference.sliding_window import predict_volumes

    reader_store = make_reader(shapes=((24, 24, 24), (17, 19, 23)))
    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    state = create_train_state(model, (2, 8, 8, 8, 1), 1e-3)
    variables = {"params": state.params}
    kw = dict(patch_size=[8, 8, 8], patch_overlap=[2, 2, 2], batch_size=4)
    ref = predict_volumes(task, variables, None, ["s0", "s1"],
                          reader=make_reader(shapes=((24, 24, 24), (17, 19, 23))),
                          pad_mode="constant", **kw)
    dev = predict_volumes_on_device(task, variables, None, ["s0", "s1"],
                                    reader=make_reader(shapes=((24, 24, 24), (17, 19, 23))),
                                    **kw)
    for k in ["s0", "s1"]:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(dev[k]))
        assert np.asarray(dev[k].attrs["affine"]).shape == (4, 4)


def test_on_device_weighted_matches_host_weighted():
    """stitch=gaussian on device == the host accumulation, incl. odd shapes
    and a tail batch whose padding corners must NOT double-accumulate."""
    from tpu_mednet.inference.weighted import (
        predict_volumes_weighted_on_device,
    )

    model = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        num_groups=2, dtype=jnp.float32,
    ))
    task = SegmentationTask(model=model, loss="DICE")
    state = create_train_state(model, (2, 8, 8, 8, 1), 1e-3)
    variables = {"params": state.params}
    kw = dict(patch_size=[8, 8, 8], patch_overlap=[2, 2, 2], batch_size=4)
    shapes = ((24, 24, 24), (17, 19, 23))
    ref = predict_volumes_weighted(
        task, variables, None, ["s0", "s1"],
        reader=make_reader(shapes=shapes), pad_mode="constant", **kw,
    )
    dev = predict_volumes_weighted_on_device(
        task, variables, None, ["s0", "s1"],
        reader=make_reader(shapes=shapes), **kw,
    )
    for k in ["s0", "s1"]:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(dev[k]))
        assert np.asarray(dev[k].attrs["affine"]).shape == (4, 4)


def test_device_sampler_epoch_semantics():
    """One epoch draws each subject exactly samples_per_subject times
    (reference dataset.py:282-283), honoring shuffle and drop_last."""
    ds = DevicePatchSampler(
        None, ["s0", "s1"], samples_per_subject=4, patch_size=[8, 8, 8],
        reader=make_reader(), image_dtype=jnp.float32, seed=0,
    )
    # instrument: record the subject indices actually gathered
    seen = []
    orig = ds.sample_indices

    def spy(batch_size, subj=None):
        seen.extend(np.asarray(subj).tolist())
        return orig(batch_size, subj=subj)

    ds.sample_indices = spy
    batches = list(ds.batches(4, shuffle=True, drop_last=True))
    assert len(batches) == 2
    counts = np.bincount(np.asarray(seen), minlength=2)
    assert counts.tolist() == [4, 4]

    # shuffle=False keeps subject-major order
    seen.clear()
    list(ds.batches(4, shuffle=False))
    assert seen == [0, 0, 0, 0, 1, 1, 1, 1]

    # drop_last=False yields the trailing partial batch
    n_items = [b["data"].shape[0] for b in ds.batches(3, drop_last=False)]
    assert sum(n_items) == 8 and n_items[-1] == 2

    # drop_last=True drops it
    n_items = [b["data"].shape[0] for b in ds.batches(3, drop_last=True)]
    assert sum(n_items) == 6


def test_device_sampler_oversample_warns_once(caplog):
    """When an epoch has fewer items than one batch, the with-replacement
    padding must be visible: a one-time warning naming the redraw count."""
    import logging

    ds = DevicePatchSampler(
        None, ["s0"], samples_per_subject=2, patch_size=[8, 8, 8],
        reader=make_reader(), image_dtype=jnp.float32, seed=0,
    )
    with caplog.at_level(logging.WARNING, logger="tpu_mednet.data.device_sampler"):
        batches = list(ds.batches(6))
        assert len(batches) == 1
        assert batches[0]["data"].shape[0] == 6  # full batch, padded
        warns = [r for r in caplog.records
                 if "re-drawing" in r.getMessage()]
        assert len(warns) == 1 and "4 samples" in warns[0].getMessage()
        # second epoch: no repeat warning
        list(ds.batches(6))
        warns = [r for r in caplog.records
                 if "re-drawing" in r.getMessage()]
        assert len(warns) == 1
