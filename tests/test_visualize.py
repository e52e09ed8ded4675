"""mednet-visualize: post-hoc MIP figure rendering (cli/visualize.py).

Beyond-reference ops tool — the reference renders MIPs only as
training-time Neptune logs (`/root/reference/midasmednet/segmentation.py:67-92`)
and a manual notebook; this CLI turns the same renderers
(`tpu_mednet/utils/plots.py`) into a store-to-PNG surface.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
pytest.importorskip("matplotlib")

from tpu_mednet.cli.visualize import main as visualize_main


def _write_group(f, group, key, arr):
    ds = f.create_dataset(f"{group}/{key}", data=arr)
    ds.attrs["affine"] = np.eye(4)


@pytest.fixture()
def seg_stores(tmp_path):
    """A tiny segmentation dataset + matching prediction store."""
    rng = np.random.default_rng(0)
    data = tmp_path / "data.h5"
    pred = tmp_path / "pred.h5"
    with h5py.File(data, "w") as f:
        for key in ("s0", "s1"):
            _write_group(f, "images", key,
                         rng.normal(size=(1, 12, 12, 12)).astype(np.float16))
            lbl = np.zeros((1, 12, 12, 12), np.uint8)
            lbl[0, 3:9, 3:9, 3:9] = 1
            _write_group(f, "labels", key, lbl)
    with h5py.File(pred, "w") as f:
        for key in ("s0", "s1"):
            p = np.zeros((1, 12, 12, 12), np.uint8)
            p[0, 4:10, 3:9, 3:9] = 1
            _write_group(f, "prediction", key, p)
    return data, pred


def test_seg_overlays(seg_stores, tmp_path, capsys):
    data, pred = seg_stores
    out = tmp_path / "figs"
    rc = visualize_main(["--data", str(data), "--pred", str(pred),
                         "--out", str(out)])
    assert rc == 0
    for key in ("s0", "s1"):
        assert (out / f"{key}_images.png").stat().st_size > 0
        assert (out / f"{key}_labels.png").stat().st_size > 0
        # no heatmap channels anywhere -> no heatmap figure
        assert not (out / f"{key}_heatmaps.png").exists()
    assert "wrote 4 figures" in capsys.readouterr().out


def test_landmark_heatmaps_auto_detected(tmp_path):
    """A landmark prediction (heatmaps first, class last) plus a GT
    'heatmaps' group produces the GT-vs-pred heatmap figure without any
    --heatmap_group flag (mirrors mednet-evaluate's auto-detection)."""
    rng = np.random.default_rng(1)
    data = tmp_path / "data.h5"
    pred = tmp_path / "pred.h5"
    with h5py.File(data, "w") as f:
        _write_group(f, "images", "s0",
                     rng.normal(size=(1, 10, 10, 10)).astype(np.float16))
        _write_group(f, "labels", "s0", np.zeros((1, 10, 10, 10), np.uint8))
        hm = np.zeros((2, 10, 10, 10), np.uint8)
        hm[0, 2, 2, 2] = 255
        hm[1, 7, 7, 7] = 255
        _write_group(f, "heatmaps", "s0", hm)
    with h5py.File(pred, "w") as f:
        pvol = np.zeros((3, 10, 10, 10), np.uint8)  # 2 heatmaps + class
        pvol[0, 3, 2, 2] = 255
        pvol[1, 7, 6, 7] = 255
        _write_group(f, "prediction", "s0", pvol)
    out = tmp_path / "figs"
    rc = visualize_main(["--data", str(data), "--pred", str(pred),
                         "--out", str(out)])
    assert rc == 0
    assert (out / "s0_heatmaps.png").stat().st_size > 0
    assert (out / "s0_labels.png").exists()


def test_pred_only_and_data_only(seg_stores, tmp_path):
    data, pred = seg_stores
    # prediction alone: single-row mask MIP, no image grid
    out_p = tmp_path / "figs_pred"
    assert visualize_main(["--pred", str(pred), "--out", str(out_p)]) == 0
    assert (out_p / "s0_labels.png").exists()
    assert not (out_p / "s0_images.png").exists()
    # dataset alone: image grid + GT-only mask MIP
    out_d = tmp_path / "figs_data"
    assert visualize_main(["--data", str(data), "--out", str(out_d)]) == 0
    assert (out_d / "s0_images.png").exists()
    assert (out_d / "s0_labels.png").exists()


def test_subject_subset_and_missing_key(seg_stores, tmp_path, caplog):
    data, pred = seg_stores
    keyfile = tmp_path / "keys.txt"
    keyfile.write_text("s1\nmissing\n")
    out = tmp_path / "figs"
    rc = visualize_main(["--data", str(data), "--pred", str(pred),
                         "--subjects", str(keyfile), "--out", str(out)])
    assert rc == 0
    assert (out / "s1_labels.png").exists()
    assert not (out / "s0_labels.png").exists()
    assert not any(out.glob("missing_*"))


def test_requires_some_input(tmp_path):
    with pytest.raises(SystemExit):
        visualize_main(["--out", str(tmp_path / "figs")])


def test_seg_prediction_skips_auto_gt_heatmaps(seg_stores, tmp_path):
    """A dataset WITH a heatmaps group visualized against a segmentation
    prediction (no heatmap channels) must not emit heatmap figures — the
    auto-detection is confirmed against the prediction layout."""
    data, pred = seg_stores
    with h5py.File(data, "a") as f:
        hm = np.zeros((2, 12, 12, 12), np.uint8)
        hm[0, 3, 3, 3] = 255
        _write_group(f, "heatmaps", "s0", hm)
        _write_group(f, "heatmaps", "s1", hm)
    out = tmp_path / "figs"
    assert visualize_main(["--data", str(data), "--pred", str(pred),
                           "--out", str(out)]) == 0
    assert not list(out.glob("*_heatmaps.png"))
    # explicit --heatmap_group still renders them (GT-only, mirrored)
    out2 = tmp_path / "figs2"
    assert visualize_main(["--data", str(data), "--pred", str(pred),
                           "--heatmap_group", "heatmaps",
                           "--out", str(out2)]) == 0
    assert (out2 / "s0_heatmaps.png").exists()


def test_heatmap_channel_mismatch_renders_pred_only(tmp_path, caplog):
    rng = np.random.default_rng(2)
    data = tmp_path / "data.h5"
    pred = tmp_path / "pred.h5"
    with h5py.File(data, "w") as f:
        _write_group(f, "images", "s0",
                     rng.normal(size=(1, 10, 10, 10)).astype(np.float16))
        _write_group(f, "heatmaps", "s0",
                     np.zeros((3, 10, 10, 10), np.uint8))  # 3 GT channels
    with h5py.File(pred, "w") as f:
        # 2 predicted heatmap channels + class map -> mismatch vs 3 GT
        _write_group(f, "prediction", "s0",
                     np.zeros((3, 10, 10, 10), np.uint8))
    out = tmp_path / "figs"
    import logging

    with caplog.at_level(logging.WARNING, logger="visualize"):
        assert visualize_main(["--data", str(data), "--pred", str(pred),
                               "--label_group", "", "--out", str(out)]) == 0
    assert (out / "s0_heatmaps.png").exists()
    assert any("heatmap channels" in r.message for r in caplog.records)


def test_wrong_pred_group_fails_cleanly(seg_stores, tmp_path):
    _, pred = seg_stores
    with pytest.raises(SystemExit, match="pred_group"):
        visualize_main(["--pred", str(pred), "--pred_group", "predictions",
                        "--out", str(tmp_path / "figs")])


def test_mistyped_group_warns_after_loop(seg_stores, tmp_path, caplog):
    """--pred + a mistyped --image_group must not silently drop the image
    figures for every subject: a post-loop warning names the group."""
    import logging

    data, pred = seg_stores
    out = tmp_path / "figs"
    with caplog.at_level(logging.WARNING):
        rc = visualize_main(["--data", str(data), "--pred", str(pred),
                             "--image_group", "imagez", "--out", str(out)])
    assert rc == 0
    # label/pred figures still rendered
    assert (out / "s0_labels.png").exists()
    assert not (out / "s0_images.png").exists()
    warn = [r for r in caplog.records if "imagez" in r.message]
    assert warn and "--image_group" in warn[0].message


def test_one_sided_heatmaps_render_single_row(tmp_path, monkeypatch):
    """GT-only heatmaps render a single-row grid — NOT the same data
    mirrored into both rows of the two-row truth/prediction renderer."""
    from tpu_mednet.utils import plots as plots_mod

    def two_row_forbidden(*a, **k):
        raise AssertionError("two-row vis_logheatmaps used for one-sided data")

    monkeypatch.setattr(plots_mod, "vis_logheatmaps", two_row_forbidden)
    rng = np.random.default_rng(0)
    data = tmp_path / "data.h5"
    with h5py.File(data, "w") as f:
        _write_group(f, "images", "s0",
                     rng.normal(size=(1, 12, 12, 12)).astype(np.float16))
        hm = np.zeros((2, 12, 12, 12), np.uint8)
        hm[0, 5, 5, 5] = 255
        hm[1, 7, 7, 7] = 255
        _write_group(f, "heatmaps", "s0", hm)
    out1 = tmp_path / "one"
    rc = visualize_main(["--data", str(data), "--heatmap_group", "heatmaps",
                         "--out", str(out1)])
    assert rc == 0
    assert (out1 / "s0_heatmaps.png").stat().st_size > 0


def test_one_sided_heatmaps_keep_background_overlay(tmp_path):
    """ADVICE r4 (low): one-sided heatmaps with an available background
    image render OVER the projected anatomy (like the two-row renderer)
    rather than dropping the context — the figure must differ from the
    background-free render of the same heatmaps."""
    from tpu_mednet.cli.visualize import render_subject

    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 12, 12, 12)).astype(np.float32)
    hm = np.zeros((2, 12, 12, 12), np.uint8)
    hm[0, 5, 5, 5] = 255
    hm[1, 7, 7, 7] = 255
    with_bg = tmp_path / "bg"
    no_bg = tmp_path / "nobg"
    with_bg.mkdir()
    no_bg.mkdir()
    w1 = render_subject("s0", with_bg, img, None, hm, None)
    w2 = render_subject("s0", no_bg, None, None, hm, None)
    assert (with_bg / "s0_heatmaps.png") in w1
    assert (no_bg / "s0_heatmaps.png") in w2
    assert (with_bg / "s0_heatmaps.png").read_bytes() \
        != (no_bg / "s0_heatmaps.png").read_bytes()
