"""Tests for heatmap synthesis, NIfTI IO, export CLI, plots, misc."""

import gzip
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.ops.heatmap import (
    batched_gaussian_heatmaps,
    gaussian_heatmap,
    heatmap_argmax_coords,
)
from tpu_mednet.utils.misc import log_level_string_to_int
from tpu_mednet.utils.nifti import load_nifti, save_nifti
from tpu_mednet.utils.plots import (
    make_grid,
    vis_logheatmaps,
    vis_logimages,
    vis_loglabels,
)


def test_gaussian_heatmap_peak_at_coord():
    hm = gaussian_heatmap(jnp.asarray([[4.0, 5.0, 6.0]]), (12, 12, 12), sigma=2.0)
    assert hm.shape == (12, 12, 12, 1)
    assert abs(float(hm[4, 5, 6, 0]) - 255.0) < 1e-3
    coords = heatmap_argmax_coords(hm)
    np.testing.assert_array_equal(np.asarray(coords), [[4, 5, 6]])


def test_gaussian_heatmap_sigma_controls_spread():
    narrow = gaussian_heatmap(jnp.asarray([[6.0, 6.0, 6.0]]), (13, 13, 13), 1.0)
    wide = gaussian_heatmap(jnp.asarray([[6.0, 6.0, 6.0]]), (13, 13, 13), 3.0)
    assert float(wide[6, 6, 0, 0]) > float(narrow[6, 6, 0, 0])


def test_gaussian_heatmap_missing_landmark():
    hm = gaussian_heatmap(jnp.asarray([[-9999.0, -9999.0, -9999.0]]), (4, 4, 4), 1.0)
    assert float(jnp.max(hm)) == 0.0


def test_gaussian_heatmap_out_of_volume_tail_renders():
    # a landmark just outside the crop still contributes its tail
    hm = gaussian_heatmap(jnp.asarray([[-2.0, 2.0, 2.0]]), (8, 8, 8), 3.0)
    assert float(hm[0, 2, 2, 0]) > 50.0


def test_batched_heatmaps_and_jit():
    coords = jnp.asarray([[[2.0, 2.0, 2.0], [5.0, 5.0, 5.0]],
                          [[1.0, 1.0, 1.0], [-9999.0, -9999.0, -9999.0]]])
    f = jax.jit(lambda c: batched_gaussian_heatmaps(c, (8, 8, 8), 1.5))
    hm = f(coords)
    assert hm.shape == (2, 8, 8, 8, 2)
    assert float(jnp.max(hm[1, ..., 1])) == 0.0


@pytest.mark.parametrize("dtype", [np.uint8, np.float32, np.int16])
def test_nifti_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 100, size=(7, 9, 11)).astype(dtype)
    else:
        data = rng.normal(size=(7, 9, 11)).astype(dtype)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = [-10, 5, 2]
    path = tmp_path / "vol.nii.gz"
    save_nifti(path, data, affine)
    loaded, la = load_nifti(path)
    np.testing.assert_array_equal(loaded, data)
    np.testing.assert_allclose(la, affine, atol=1e-5)


def test_nifti_uncompressed_and_4d(tmp_path):
    data = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    path = tmp_path / "vol.nii"
    save_nifti(path, data)
    loaded, affine = load_nifti(path)
    np.testing.assert_array_equal(loaded, data)
    np.testing.assert_allclose(affine, np.eye(4))


def test_nifti_magic_check(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        load_nifti(p)


def test_export_cli(tmp_path):
    h5py = pytest.importorskip("h5py")
    from click.testing import CliRunner

    from tpu_mednet.utils.export import export_to_nii

    path = tmp_path / "data.h5"
    with h5py.File(path, "w") as hf:
        ds = hf.create_dataset(
            "prediction/k1", data=np.random.default_rng(0).integers(
                0, 5, size=(3, 8, 8, 8)).astype(np.uint8)
        )
        ds.attrs["affine"] = np.eye(4)
    runner = CliRunner()
    result = runner.invoke(export_to_nii, [
        "--data_path", str(path), "--data_group", "prediction",
        "--export_dir", str(tmp_path / "out"), "--dtype", "int",
    ])
    assert result.exit_code == 0, result.output
    files = sorted((tmp_path / "out" / "data" / "prediction").glob("*.nii.gz"))
    assert len(files) == 3
    data, affine = load_nifti(files[0])
    assert data.shape == (8, 8, 8)

    # sum_channels + mask selection
    result = runner.invoke(export_to_nii, [
        "--data_path", str(path), "--data_group", "prediction",
        "--export_dir", str(tmp_path / "out2"), "--sum_channels",
        "--select_channels", "mask",
    ])
    assert result.exit_code == 0, result.output
    files = list((tmp_path / "out2" / "data" / "prediction").glob("*_mask_sum.nii.gz"))
    assert len(files) == 1


def test_make_grid_tiles():
    imgs = np.ones((3, 4, 4), dtype=np.float32)
    grid = make_grid(imgs, nrow=2, padding=1)
    assert grid.shape == (2 * 5 + 1, 2 * 5 + 1)


def test_plot_functions_return_figures():
    rng = np.random.default_rng(0)
    inputs = rng.normal(size=(2, 16, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 3, size=(16, 16, 16))
    pred = rng.integers(0, 3, size=(16, 16, 16))
    hm = rng.uniform(0, 255, size=(2, 16, 16, 16)).astype(np.float32)
    fig, _ = vis_logimages(inputs)
    assert fig is not None
    fig, _ = vis_loglabels(labels, pred, inputs=inputs[0], projection_type="max")
    assert fig is not None
    fig, _ = vis_logheatmaps(inputs[0], hm, hm)
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_log_level_string_to_int():
    import logging
    assert log_level_string_to_int("info") == logging.INFO
    with pytest.raises(Exception):
        log_level_string_to_int("bogus")
