"""mednet-evaluate: prediction scoring (utils/evaluation.py, cli/evaluate.py).

Beyond-reference ops tool — the reference never scores finished predictions
(`/root/reference/midasmednet/segmentation.py:104-109` logs val Dice during
training only).  Golden-value tests for every metric plus a CLI e2e over
HDF5 and NIfTI-directory stores.
"""

import json

import numpy as np
import pytest

from tpu_mednet.utils.evaluation import (
    aggregate,
    heatmap_peaks,
    landmark_errors,
    overlap_metrics,
    spacing_from_affine,
    surface_distances,
)


def test_overlap_metrics_golden():
    true = np.zeros((6, 6, 6), np.uint8)
    true[1:5, 1:5, 1:5] = 1  # 64 voxels
    pred = np.zeros_like(true)
    pred[2:6, 1:5, 1:5] = 1  # 64 voxels, 48 overlapping
    m = overlap_metrics(pred, true, n_classes=2)
    assert m[1]["dice"] == pytest.approx(2 * 48 / 128)
    assert m[1]["iou"] == pytest.approx(48 / 80)
    assert m[1]["precision"] == pytest.approx(48 / 64)
    assert m[1]["recall"] == pytest.approx(48 / 64)
    assert m[1]["volume_error"] == 0.0
    # background numbers are consistent too
    assert 0.0 < m[0]["dice"] < 1.0
    # perfect match
    p = overlap_metrics(true, true, 2)
    assert p[1]["dice"] == 1.0 and p[1]["iou"] == 1.0


def test_overlap_metrics_absent_class_is_nan_not_one():
    true = np.zeros((4, 4, 4), np.uint8)
    m = overlap_metrics(true, true, n_classes=3)
    assert np.isnan(m[1]["dice"]) and np.isnan(m[2]["dice"])
    # predicted-but-absent class: dice 0, volume_error inf
    pred = true.copy()
    pred[0, 0, 0] = 1
    m = overlap_metrics(pred, true, n_classes=2)
    assert m[1]["dice"] == 0.0 and m[1]["volume_error"] == float("inf")


def test_surface_distances_golden():
    scipy = pytest.importorskip("scipy")  # noqa: F841
    true = np.zeros((12, 12, 12), bool)
    true[2:8, 2:8, 2:8] = True
    # shift by 2 along x: every boundary voxel is exactly 2 away at the
    # two shifted faces, 0 elsewhere -> hd95 == 2, assd in (0, 2)
    pred = np.zeros_like(true)
    pred[4:10, 2:8, 2:8] = True
    d = surface_distances(pred.astype(np.uint8), true.astype(np.uint8), 2)
    assert d[1]["hd95"] == pytest.approx(2.0)
    assert 0.0 < d[1]["assd"] < 2.0
    # identical masks: all zeros
    d = surface_distances(true.astype(np.uint8), true.astype(np.uint8), 2)
    assert d[1]["hd95"] == 0.0 and d[1]["assd"] == 0.0
    # spacing scales physical distance
    d = surface_distances(pred.astype(np.uint8), true.astype(np.uint8), 2,
                          spacing=(3.0, 1.0, 1.0))
    assert d[1]["hd95"] == pytest.approx(6.0)
    # one-sided empty -> inf, both-empty -> nan
    d = surface_distances(np.zeros_like(true, np.uint8),
                          true.astype(np.uint8), 2)
    assert d[1]["hd95"] == float("inf")
    d = surface_distances(np.zeros((4, 4, 4), np.uint8),
                          np.zeros((4, 4, 4), np.uint8), 2)
    assert np.isnan(d[1]["hd95"])


def test_landmark_errors_golden():
    shape = (16, 16, 16)
    def hm(center, sigma=2.0):
        g = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                                 indexing="ij"), -1).astype(np.float64)
        return np.exp(-((g - center) ** 2).sum(-1) / (2 * sigma**2)) * 255

    true = np.stack([hm((8, 8, 8)), hm((4, 10, 6))])
    pred = np.stack([hm((8, 8, 11)), hm((4, 10, 6))])
    np.testing.assert_array_equal(heatmap_peaks(true),
                                  [[8, 8, 8], [4, 10, 6]])
    errs = landmark_errors(pred, true, spacing=(1.0, 1.0, 2.0))
    assert errs[0]["voxels"] == pytest.approx(3.0)
    assert errs[0]["mm"] == pytest.approx(6.0)
    assert errs[1]["voxels"] == 0.0
    # missing landmark (all-zero truth channel) -> nan
    true0 = true.copy()
    true0[1] = 0
    errs = landmark_errors(pred, true0)
    assert np.isnan(errs[1]["voxels"])
    with pytest.raises(ValueError, match="disagree"):
        landmark_errors(pred[:1], true)


def test_landmark_readout_golden():
    from tpu_mednet.utils.evaluation import landmark_readout

    vol = np.zeros((3, 8, 8, 8), np.uint8)  # 2 heatmaps + class map
    vol[0, 2, 3, 4] = 200
    vol[2, :4] = 1  # class channel must not leak into the readout
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    affine[:3, 3] = (10.0, 0.0, -5.0)
    rows = landmark_readout(vol, num_heatmaps=2, affine=affine)
    assert rows[0]["voxel"] == [2.0, 3.0, 4.0]
    assert rows[0]["peak"] == 200.0
    assert rows[0]["physical"] == [14.0, 6.0, 3.0]
    # undetected landmark: peak 0 (argmax of an all-zero channel)
    assert rows[1]["peak"] == 0.0
    # no affine -> no physical entry
    assert "physical" not in landmark_readout(vol, 2)[0]


def test_spacing_from_affine():
    aff = np.diag([2.0, 3.0, 4.0, 1.0])
    np.testing.assert_allclose(spacing_from_affine(aff), [2, 3, 4])
    # rotation preserves column norms
    c, s = np.cos(0.3), np.sin(0.3)
    rot = np.eye(4)
    rot[:2, :2] = [[c, -s], [s, c]]
    np.testing.assert_allclose(spacing_from_affine(rot @ aff), [2, 3, 4])
    np.testing.assert_allclose(spacing_from_affine(None), [1, 1, 1])


def test_aggregate_skips_nan_and_inf():
    rows = [
        [{"dice": 0.8}, {"dice": float("nan")}],
        [{"dice": 0.6}, {"dice": 0.4}],
        [{"dice": float("inf")}, {"dice": 0.6}],
    ]
    agg = aggregate(rows)
    assert agg[0]["dice"] == pytest.approx(0.7)
    assert agg[1]["dice"] == pytest.approx(0.5)
    assert aggregate([]) == []


@pytest.fixture(scope="module")
def seg_stores(tmp_path_factory):
    h5py = pytest.importorskip("h5py")
    tmp_path = tmp_path_factory.mktemp("eval")
    true = np.zeros((12, 12, 12), np.uint8)
    true[2:8, 2:8, 2:8] = 1
    pred = np.zeros_like(true)
    pred[4:10, 2:8, 2:8] = 1
    affine = np.diag([2.0, 1.0, 1.0, 1.0])
    with h5py.File(tmp_path / "truth.h5", "w") as hf:
        ds = hf.create_dataset("labels/s0", data=true[None])
        ds.attrs["affine"] = affine
    with h5py.File(tmp_path / "pred.h5", "w") as hf:
        hf.create_dataset("prediction/s0", data=pred[None])
    (tmp_path / "keys.txt").write_text("s0\n")
    return tmp_path, pred, true


def test_cli_segmentation_scoring(seg_stores, capsys):
    from tpu_mednet.cli.evaluate import main as evaluate_main

    tmp_path, pred, true = seg_stores
    rc = evaluate_main([
        "--pred", str(tmp_path / "pred.h5"),
        "--truth", str(tmp_path / "truth.h5"),
        "--surface", "--json", str(tmp_path / "scores.json"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "subjects   : 1" in out and "hd95" in out
    scores = json.loads((tmp_path / "scores.json").read_text())
    exp = overlap_metrics(pred, true, 2)
    got = scores["mean"]["segmentation"]
    assert got[1]["dice"] == pytest.approx(exp[1]["dice"])
    # hd95 uses the affine spacing (2.0 along the shifted x axis)
    assert scores["mean"]["surface"][1]["hd95"] == pytest.approx(4.0)
    assert scores["subjects"]["s0"]["spacing"] == [2.0, 1.0, 1.0]
    # explicit key file gives the same result
    rc = evaluate_main([
        "--pred", str(tmp_path / "pred.h5"),
        "--truth", str(tmp_path / "truth.h5"),
        "--subjects", str(tmp_path / "keys.txt"),
    ])
    assert rc == 0


def test_cli_class_discovered_in_later_subject(tmp_path, capsys):
    # regression: without --classes the count must grow across subjects —
    # a class first seen in subject 2 was silently never scored
    h5py = pytest.importorskip("h5py")
    from tpu_mednet.cli.evaluate import main as evaluate_main

    a = np.zeros((6, 6, 6), np.uint8)
    a[1:3, 1:3, 1:3] = 1
    b = a.copy()
    b[4:6, 4:6, 4:6] = 2  # class 2 only exists in subject s1
    with h5py.File(tmp_path / "truth.h5", "w") as hf:
        hf.create_dataset("labels/s0", data=a[None])
        hf.create_dataset("labels/s1", data=b[None])
    with h5py.File(tmp_path / "pred.h5", "w") as hf:
        hf.create_dataset("prediction/s0", data=a[None])
        hf.create_dataset("prediction/s1", data=b[None])
    rc = evaluate_main(["--pred", str(tmp_path / "pred.h5"),
                        "--truth", str(tmp_path / "truth.h5"),
                        "--json", str(tmp_path / "s.json")])
    assert rc == 0
    scores = json.loads((tmp_path / "s.json").read_text())
    assert scores["n_classes"] == 3
    seg = scores["mean"]["segmentation"]
    assert len(seg) == 3 and seg[2]["dice"] == 1.0
    # s0's padded class-2 row is nan (absent from both volumes there)
    assert scores["subjects"]["s0"]["segmentation"][2]["dice"] != seg[2]["dice"]
    capsys.readouterr()


def test_cli_missing_pred_group_and_auto_heatmap_skip(tmp_path, capsys):
    h5py = pytest.importorskip("h5py")
    from tpu_mednet.cli.evaluate import main as evaluate_main

    lbl = np.zeros((6, 6, 6), np.uint8)
    lbl[2:4, 2:4, 2:4] = 1
    with h5py.File(tmp_path / "truth.h5", "w") as hf:
        hf.create_dataset("labels/s0", data=lbl[None])
    # prediction with heatmap channels but NO heatmaps group in the truth:
    # auto landmark scoring must skip with a warning, not crash
    pred = np.concatenate([np.zeros((2, 6, 6, 6), np.uint8), lbl[None]])
    with h5py.File(tmp_path / "pred.h5", "w") as hf:
        hf.create_dataset("prediction/s0", data=pred)
    rc = evaluate_main(["--pred", str(tmp_path / "pred.h5"),
                        "--truth", str(tmp_path / "truth.h5"),
                        "--json", str(tmp_path / "s.json")])
    assert rc == 0
    scores = json.loads((tmp_path / "s.json").read_text())
    assert "landmarks" not in scores["mean"]
    capsys.readouterr()
    # but an EXPLICIT missing heatmap group fails fast
    with pytest.raises(SystemExit, match="no heatmap volume"):
        evaluate_main(["--pred", str(tmp_path / "pred.h5"),
                       "--truth", str(tmp_path / "truth.h5"),
                       "--heatmap_group", "nope"])
    # and a wrong --pred_group fails with an actionable message
    with pytest.raises(SystemExit, match="no group 'mispelled'"):
        evaluate_main(["--pred", str(tmp_path / "pred.h5"),
                       "--truth", str(tmp_path / "truth.h5"),
                       "--pred_group", "mispelled"])


def test_cli_landmark_scoring_over_nifti_dirs(tmp_path, capsys):
    from tpu_mednet.cli.evaluate import main as evaluate_main
    from tpu_mednet.utils.nifti import save_nifti

    shape = (16, 16, 16)
    def hm(center, sigma=2.0):
        g = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                                 indexing="ij"), -1).astype(np.float64)
        return (np.exp(-((g - center) ** 2).sum(-1) / (2 * sigma**2))
                * 255).astype(np.uint8)

    true_hm = np.stack([hm((8, 8, 8)), hm((4, 10, 6))], axis=-1)
    pred_hm = np.stack([hm((8, 8, 12)), hm((4, 10, 6))], axis=-1)
    label = np.zeros(shape, np.uint8)
    label[6:10, 6:10, 6:10] = 1
    # prediction: heatmaps first, class map last (4D NIfTI, trailing ch)
    pred_vol = np.concatenate([pred_hm, label[..., None]], axis=-1)

    (tmp_path / "truth" / "labels").mkdir(parents=True)
    (tmp_path / "truth" / "heatmaps").mkdir()
    (tmp_path / "pred" / "prediction").mkdir(parents=True)
    save_nifti(tmp_path / "truth" / "labels" / "s0.nii.gz", label)
    save_nifti(tmp_path / "truth" / "heatmaps" / "s0.nii.gz", true_hm)
    save_nifti(tmp_path / "pred" / "prediction" / "s0.nii.gz", pred_vol)

    rc = evaluate_main([
        "--pred", str(tmp_path / "pred"),
        "--truth", str(tmp_path / "truth"),
        "--json", str(tmp_path / "scores.json"),
    ])
    assert rc == 0
    scores = json.loads((tmp_path / "scores.json").read_text())
    ld = scores["mean"]["landmarks"]
    assert ld[0]["voxels"] == pytest.approx(4.0)
    assert ld[1]["voxels"] == 0.0
    assert scores["mean"]["segmentation"][1]["dice"] == 1.0
    assert "landmark" in capsys.readouterr().out
