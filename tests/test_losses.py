"""Golden-value tests for the loss/metric zoo.

Cross-checked against torch (CPU) where the reference used torch built-ins,
and against hand-computed values for the dice machinery.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.ops import losses as L


def test_flatten_channels():
    x = np.arange(2 * 3 * 4).reshape(2, 1, 2, 2, 3).astype(np.float32)
    out = L.flatten_channels(jnp.asarray(x))
    assert out.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(out[0]), x[..., 0].reshape(-1))


def test_expand_as_one_hot():
    labels = jnp.asarray([[[[0, 1], [2, 1]]]])  # (1,1,2,2)
    oh = L.expand_as_one_hot(labels, 3)
    assert oh.shape == (1, 1, 2, 2, 3)
    np.testing.assert_array_equal(np.asarray(oh[0, 0, 0, 0]), [1, 0, 0])
    np.testing.assert_array_equal(np.asarray(oh[0, 0, 1, 0]), [0, 0, 1])


def test_expand_as_one_hot_ignore_index():
    labels = jnp.asarray([[[[0, -1]]]])
    oh = L.expand_as_one_hot(labels, 2, ignore_index=-1)
    np.testing.assert_array_equal(np.asarray(oh[0, 0, 0, 0]), [1, 0])
    np.testing.assert_array_equal(np.asarray(oh[0, 0, 0, 1]), [-1, -1])


def test_per_channel_dice_perfect():
    target = L.expand_as_one_hot(jnp.zeros((1, 2, 2, 2), jnp.int32), 2)
    dice = L.compute_per_channel_dice(target, target)
    np.testing.assert_allclose(np.asarray(dice), [1.0, 0.0], atol=1e-6)


def test_per_channel_dice_hand_computed():
    # 4 voxels, 1 channel: probs=[0.5,0.5,0.5,0.5], target=[1,1,0,0]
    probs = jnp.full((1, 1, 1, 4, 1), 0.5)
    target = jnp.asarray([1.0, 1.0, 0.0, 0.0]).reshape(1, 1, 1, 4, 1)
    dice = L.compute_per_channel_dice(probs, target)
    # 2*(0.5+0.5) / (2+2) = 0.5
    np.testing.assert_allclose(np.asarray(dice), [0.5], atol=1e-6)


def test_dice_weight_scales_intersection():
    probs = jnp.full((1, 1, 1, 4, 1), 0.5)
    target = jnp.asarray([1.0, 1.0, 0.0, 0.0]).reshape(1, 1, 1, 4, 1)
    dice = L.compute_per_channel_dice(probs, target, weight=jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(dice), [1.0], atol=1e-6)


def test_dice_loss_range():
    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 4, 4, 3)).astype(np.float32)
    )
    labels = jnp.asarray(
        np.random.default_rng(1).integers(0, 3, size=(2, 4, 4, 4))
    )
    loss = L.dice_loss(logits, labels)
    assert 0.0 <= float(loss) <= 1.0


def test_ce_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 3, 3, 3, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 3, 3, 3))
    ours = float(L.ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    # torch: NCDHW
    t_logits = torch.tensor(logits).permute(0, 4, 1, 2, 3)
    t_labels = torch.tensor(labels, dtype=torch.long)
    theirs = float(torch.nn.functional.cross_entropy(t_logits, t_labels))
    assert abs(ours - theirs) < 1e-5


def test_ce_loss_weighted_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 2, 2, 2, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 2, 2, 2))
    w = np.asarray([0.2, 1.0, 2.0], dtype=np.float32)
    ours = float(L.ce_loss(jnp.asarray(logits), jnp.asarray(labels), weight=jnp.asarray(w)))
    t_logits = torch.tensor(logits).permute(0, 4, 1, 2, 3)
    theirs = float(
        torch.nn.functional.cross_entropy(
            t_logits, torch.tensor(labels, dtype=torch.long), weight=torch.tensor(w)
        )
    )
    assert abs(ours - theirs) < 1e-5


def test_ce_loss_ignore_index():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 2, 2, 3)))
    labels = jnp.full((1, 2, 2, 2), -1)
    labels = labels.at[0, 0, 0, 0].set(1)
    loss_all_ignored_but_one = L.ce_loss(logits, labels, ignore_index=-1)
    # equals CE restricted to the single valid voxel
    single = -float(
        jnp.log(jnp.clip(jnp.exp(logits[0, 0, 0, 0, 1]) / jnp.sum(jnp.exp(logits[0, 0, 0, 0])), 1e-30, None))
    )
    assert abs(float(loss_all_ignored_but_one) - single) < 1e-4


def test_weighted_ce_runs():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(1, 4, 4, 4)))
    loss = L.weighted_ce_loss(logits, labels, target_one_hot_encoded=False)
    assert np.isfinite(float(loss))


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 2, 2, 2, 1)).astype(np.float32)
    target = rng.integers(0, 2, size=(2, 2, 2, 2, 1)).astype(np.float32)
    ours = float(L.bce_with_masking(jnp.asarray(logits), jnp.asarray(target), ignore_index=None))
    theirs = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(target)
        )
    )
    assert abs(ours - theirs) < 1e-5


def test_pixelwise_ce_uniform_weights_equals_scaled_ce():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(1, 2, 2, 2, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(1, 2, 2, 2)))
    weights = jnp.ones((1, 2, 2, 2))
    pw = float(L.pixelwise_ce_loss(logits, labels, weights))
    ce = float(L.ce_loss(logits, labels))
    # pixelwise mean averages over C as well -> CE / C
    assert abs(pw - ce / 3) < 1e-5


def test_landmark_loss_is_mse():
    a = jnp.ones((1, 2, 2, 2, 3))
    b = jnp.zeros((1, 2, 2, 2, 3))
    assert float(L.landmark_loss(a, b)) == 1.0


def test_multitask_landmark_loss_decomposition():
    rng = np.random.default_rng(5)
    out_labels = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    out_hm = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, size=(1, 4, 4, 4)))
    hm = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32))
    weights = [0.5, 1.0, 2.0]
    total, cls, reg = L.multitask_landmark_loss(
        out_labels, out_hm, labels, hm, weights, class_loss="DICE"
    )
    assert abs(float(total) - float(cls) - float(reg)) < 1e-6
    # regression term = sum_c w_c * mse_c
    expected = sum(
        w * float(L.mse_loss(out_hm[..., c], hm[..., c]))
        for c, w in enumerate(weights)
    )
    assert abs(float(reg) - expected) < 1e-5


def test_dice_metric_shape():
    logits = jnp.asarray(np.random.default_rng(6).normal(size=(2, 4, 4, 4, 3)))
    labels = jnp.asarray(np.random.default_rng(7).integers(0, 3, size=(2, 4, 4, 4)))
    dm = L.dice_metric(logits, labels)
    assert dm.shape == (3,)


def test_weight_length_mismatch_raises_clearly():
    """A per-class weight of the wrong length (e.g. the reference's 2-class
    default against a 3-class head) must raise an actionable error, not a
    broadcast failure deep inside jit."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from tpu_mednet.ops.losses import ce_loss, dice_loss

    logits = jnp.zeros((1, 4, 4, 4, 3))
    labels = jnp.zeros((1, 4, 4, 4), jnp.int32)
    w2 = jnp.asarray(np.array([0.05, 1.0], np.float32))
    for fn in (dice_loss, ce_loss):
        with pytest.raises(ValueError, match="2 entries.*3 classes"):
            fn(logits, labels, weight=w2)
