"""Tests for position/patch sampling utilities."""

import numpy as np
import pytest

from tpu_mednet.data.sampling import (
    compute_class_any_masks,
    get_labeled_position,
    get_random_patch_indices,
    one_hot_to_label,
)


def test_get_labeled_position_finds_class(rng):
    label = np.zeros((8, 8, 8), dtype=np.uint8)
    label[2, 3, 4] = 2
    label[5, 5, 5] = 2
    for _ in range(20):
        pos = get_labeled_position(label, 2, rng=rng)
        assert pos is not None
        assert label[tuple(pos)] == 2


def test_get_labeled_position_absent_class(rng):
    label = np.zeros((4, 4, 4), dtype=np.uint8)
    assert get_labeled_position(label, 3, rng=rng) is None


def test_get_labeled_position_precomputed_mask(rng):
    label = np.zeros((6, 6, 6), dtype=np.uint8)
    label[1, 2, :] = 1
    masks = compute_class_any_masks(label, 2)
    pos = get_labeled_position(label, 1, label_any=masks[1], rng=rng)
    assert pos[:2] == [1, 2]
    assert label[tuple(pos)] == 1


def test_random_patch_indices_unconstrained(rng):
    for _ in range(50):
        ini, fin = get_random_patch_indices([4, 4, 4], [10, 12, 14], rng=rng)
        assert np.all(ini >= 0)
        assert np.all(fin <= [10, 12, 14])
        assert np.all(fin - ini == 4)


def test_random_patch_indices_contains_position(rng):
    pos = [7, 3, 9]
    for _ in range(50):
        ini, fin = get_random_patch_indices([4, 4, 4], [16, 16, 16], pos=pos, rng=rng)
        assert np.all(ini <= pos)
        assert np.all(np.asarray(pos) < fin)
        assert np.all(fin <= 16)


def test_random_patch_indices_full_size(rng):
    ini, fin = get_random_patch_indices([8, 8, 8], [8, 8, 8], rng=rng)
    assert np.all(ini == 0)
    assert np.all(fin == 8)


def test_one_hot_to_label_with_background():
    onehot = np.zeros((2, 2, 2, 2), dtype=bool)
    onehot[0, 0, 0, 0] = True  # class 1 (after background prepend)
    onehot[1, 1, 1, 1] = True  # class 2
    out = one_hot_to_label(onehot, add_background=True)
    assert out.shape == (1, 2, 2, 2)
    assert out[0, 0, 0, 0] == 1
    assert out[0, 1, 1, 1] == 2
    assert out[0, 0, 1, 0] == 0  # background


def test_one_hot_to_label_no_background():
    onehot = np.zeros((3, 2, 2, 2), dtype=bool)
    onehot[2, 0, 0, 0] = True
    out = one_hot_to_label(onehot, add_background=False)
    assert out[0, 0, 0, 0] == 2
