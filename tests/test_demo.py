"""mednet-demo: synthetic demo dataset generator (cli/demo.py).

Beyond-reference ops tool — the reference's only dataset entry is a
hardcoded lab-internal HDF5 path
(`/root/reference/midasmednet/dataset.py:513-523`); mednet-demo makes the
full workflow runnable out of the box.
"""

import numpy as np
import pytest

from tpu_mednet.cli.demo import main as demo_main
from tpu_mednet.data.readers import open_reader


def _generate(tmp_path, fmt="h5", extra=()):
    out = tmp_path / "demo"
    rc = demo_main(["--out", str(out), "--train", "2", "--val", "1",
                    "--test", "1", "--size", "32", "--format", fmt, *extra])
    assert rc == 0
    return out


def test_dataset_contents(tmp_path):
    pytest.importorskip("h5py")
    out = _generate(tmp_path, extra=["--spacing", "1.5"])
    reader = open_reader(out / "data.h5")
    try:
        keys = reader.list_keys("images")
        assert keys == ["s000", "s001", "s002", "s003"]
        assert reader.list_keys("labels") == keys
        assert reader.list_keys("heatmaps") == keys
        img = np.asarray(next(iter(reader.read(
            ["s000"], "images", dtype=None, preload=False))))
        lbl = np.asarray(next(iter(reader.read(
            ["s000"], "labels", dtype=None, preload=False))))
        hm = np.asarray(next(iter(reader.read(
            ["s000"], "heatmaps", dtype=None, preload=False))))
        assert img.shape == (1, 32, 32, 32) and img.dtype == np.float16
        assert lbl.shape == (1, 32, 32, 32) and lbl.dtype == np.uint8
        assert set(np.unique(lbl)) == {0, 1, 2}
        assert hm.shape == (2, 32, 32, 32) and hm.max() == 255
        # heatmap peaks sit inside their structures (sphere=1, box=2)
        for c, cls in ((0, 1), (1, 2)):
            peak = np.unravel_index(np.argmax(hm[c]), hm[c].shape)
            assert lbl[0][peak] == cls
        aff = reader.get_data_attribute(["s000"], "images", "affine")["s000"]
        assert np.allclose(np.asarray(aff)[:3, :3], np.eye(3) * 1.5)
    finally:
        reader.close()
    # keyfiles split the subjects disjointly
    train = (out / "train.txt").read_text().split()
    val = (out / "val.txt").read_text().split()
    test = (out / "test.txt").read_text().split()
    assert train == ["s000", "s001"] and val == ["s002"] and test == ["s003"]


def test_configs_parse_through_the_real_parsers(tmp_path):
    pytest.importorskip("h5py")
    out = _generate(tmp_path)
    from tpu_mednet.cli.train_seg import build_parser as seg_parser
    from tpu_mednet.cli.train_ldmks import build_parser as ldmk_parser
    from tpu_mednet.config import load_yaml_config, parse_with_config

    hp = parse_with_config(seg_parser(), ["-c", str(out / "seg.yaml")])
    assert hp.data_path == str(out / "data.h5")
    assert hp.out_channels == 3 and hp.loss == "DICE"
    assert list(hp.patch_size) == [32, 32, 32]

    hp = parse_with_config(ldmk_parser(), ["-c", str(out / "landmarks.yaml")])
    assert hp.heatmap_group == "heatmaps"
    assert list(hp.loss_regression_weight) == [0.02, 0.02]
    assert hp.out_channels == 5

    for name, model in (("predict_seg", "SegmentationNet"),
                        ("predict_ldmks", "LandmarkNet")):
        cfg = load_yaml_config(out / f"{name}.yaml")
        assert cfg["prediction"]["model"] == model
        assert cfg["prediction"]["checkpoint"].endswith(
            "model_seg" if model == "SegmentationNet" else "model_ldmks")
        assert cfg["base"]["data"] == str(out / "data.h5")
    # the landmark predict config carries the per-heatmap sigmas
    cfg = load_yaml_config(out / "predict_ldmks.yaml")
    assert cfg["base"]["sigma"] == [4.0, 4.0]


@pytest.mark.parametrize("fmt,name", (("zarr", "data.zarr"),
                                      ("nii", "data.nii")))
def test_other_store_formats(tmp_path, fmt, name):
    out = _generate(tmp_path, fmt=fmt)
    reader = open_reader(out / name)
    try:
        assert len(reader.list_keys("images")) == 4
        hm = np.asarray(next(iter(reader.read(
            ["s001"], "heatmaps", dtype=None, preload=False))))
        assert hm.shape == (2, 32, 32, 32)
    finally:
        reader.close()


def test_rerun_replaces_stale_subjects(tmp_path):
    """Re-generating into the same --out with fewer subjects must not
    leave keys from the previous (larger) run in the store."""
    pytest.importorskip("h5py")
    out = tmp_path / "demo"
    assert demo_main(["--out", str(out), "--train", "4", "--val", "1",
                      "--test", "1", "--size", "32"]) == 0
    assert demo_main(["--out", str(out), "--train", "1", "--val", "1",
                      "--test", "1", "--size", "32"]) == 0
    reader = open_reader(out / "data.h5")
    try:
        assert reader.list_keys("images") == ["s000", "s001", "s002"]
    finally:
        reader.close()


def test_structures_never_overlap_across_seeds():
    """The box redraw keeps each landmark heatmap peak inside its own
    structure for arbitrary seeds, not just the default."""
    from tpu_mednet.cli.demo import make_subject

    for seed in range(25):
        rng = np.random.default_rng(seed)
        _, lbl, hm = make_subject(rng, 32, 4.0)
        for c, cls in ((0, 1), (1, 2)):
            peak = np.unravel_index(np.argmax(hm[c]), hm[c].shape)
            assert lbl[0][peak] == cls, f"seed {seed} channel {c}"


def test_size_guard(tmp_path):
    with pytest.raises(SystemExit):
        demo_main(["--out", str(tmp_path / "d"), "--size", "16"])


def test_multimodal_multiheatmap_store(tmp_path):
    """--modalities/--heatmaps/--classes generate the BASELINE config 4/5
    store shapes: 4 image channels, 6 landmark heatmaps, 2-class labels."""
    pytest.importorskip("h5py")
    import yaml

    out = _generate(tmp_path, extra=["--modalities", "4", "--heatmaps", "6",
                                     "--classes", "2"])
    reader = open_reader(out / "data.h5")
    try:
        img = np.asarray(next(iter(reader.read(
            ["s000"], "images", dtype=None, preload=False))))
        lbl = np.asarray(next(iter(reader.read(
            ["s000"], "labels", dtype=None, preload=False))))
        hm = np.asarray(next(iter(reader.read(
            ["s000"], "heatmaps", dtype=None, preload=False))))
    finally:
        reader.close()
    assert img.shape == (4, 32, 32, 32)
    # modalities differ (per-modality contrasts), structures visible in all
    assert not np.allclose(img[0], img[1])
    assert lbl.shape == (1, 32, 32, 32)
    assert set(np.unique(lbl)) == {0, 1}  # --classes 2 merges structures
    assert hm.shape == (6, 32, 32, 32)
    # every landmark peak sits on foreground (anchors inside structures)
    for c in range(6):
        peak = np.unravel_index(np.argmax(hm[c]), hm[c].shape)
        assert hm[c][peak] == 255
        assert lbl[0][peak] == 1
    # wired configs carry the channel arithmetic
    seg = yaml.safe_load((out / "seg.yaml").read_text())
    assert seg["in_channels"] == 4 and seg["out_channels"] == 2
    ldmk = yaml.safe_load((out / "landmarks.yaml").read_text())
    assert ldmk["out_channels"] == 8  # 6 heatmaps + 2 classes
    assert len(ldmk["loss_regression_weight"]) == 6
    pred = yaml.safe_load((out / "predict_ldmks.yaml").read_text())
    assert len(pred["base"]["sigma"]) == 6


def test_rerun_resets_stale_outputs(tmp_path, caplog):
    """Re-running into an existing --out removes stale model dirs and
    prediction files (they no longer match the regenerated store)."""
    import logging

    pytest.importorskip("h5py")
    out = _generate(tmp_path)
    (out / "model_seg").mkdir()
    (out / "model_seg" / "ckpt").write_text("stale")
    (out / "pred_seg.h5").write_text("stale")
    (out / "figs").mkdir()
    with caplog.at_level(logging.WARNING):
        rc = demo_main(["--out", str(out), "--train", "2", "--val", "1",
                        "--test", "1", "--size", "32"])
    assert rc == 0
    assert not (out / "model_seg").exists()
    assert not (out / "pred_seg.h5").exists()
    assert not (out / "figs").exists()
    assert any("stale" in r.message for r in caplog.records)
