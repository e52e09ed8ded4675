"""mednet-stats: dataset statistics CLI (cli/stats.py).

Beyond-reference ops tool (the reference gives no way to derive
normalization constants or loss weights from a dataset).  Golden-value
tests on synthetic stores.
"""

import json

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from tpu_mednet.cli.stats import main as stats_main


@pytest.fixture
def dataset(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "data.h5"
    with h5py.File(path, "w") as hf:
        for i in range(2):
            img = rng.normal(5.0, 2.0, size=(1, 12, 12, 12)).astype(np.float32)
            lbl = np.zeros((1, 12, 12, 12), np.uint8)
            lbl[0, :6] = 1  # half the voxels are class 1
            if i == 1:
                lbl[0, 6:7] = 2  # class 2 only in subject 1
            hm = np.zeros((2, 12, 12, 12), np.uint8)
            hm[0, 3, 3, 3] = 200  # channel 1 stays silent
            ds = hf.create_dataset(f"images/s{i}", data=img)
            ds.attrs["affine"] = np.diag([1.0, 1.0, 2.0, 1.0])
            hf.create_dataset(f"labels/s{i}", data=lbl)
            hf.create_dataset(f"heatmaps/s{i}", data=hm)
    return path


def test_stats_golden(dataset, tmp_path, capsys):
    rc = stats_main(["--data", str(dataset), "--heatmap_group", "heatmaps",
                     "--json", str(tmp_path / "stats.json")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "--loss_weight" in out
    r = json.loads((tmp_path / "stats.json").read_text())

    im = r["images"]
    assert im["subjects"] == 2 and im["channels"] == 1
    assert im["mean"][0] == pytest.approx(5.0, abs=0.1)
    assert im["std"][0] == pytest.approx(2.0, abs=0.1)
    assert im["p0.5"][0] < im["median"][0] < im["p99.5"][0]
    assert im["spacing"]["max"] == [1.0, 1.0, 2.0]

    lb = r["labels"]
    assert lb["classes"] == 3
    total = 2 * 12**3
    assert sum(lb["voxels"]) == total
    # class 2 appears in exactly one subject, 144 voxels
    assert lb["voxels"][2] == 144 and lb["subjects_with_class"][2] == 1
    assert lb["subjects_with_class"][0] == 2
    # inverse-frequency weights: rarest class gets the largest weight,
    # normalized to mean 1 over present classes
    w = lb["suggested_weights"]
    assert w[2] > w[1] > 0 and w[2] > w[0]
    assert np.mean(w) == pytest.approx(1.0, abs=0.01)

    hm = r["heatmaps"]
    assert hm["peak_amplitude"] == [200.0, 0.0]
    assert hm["subjects_with_signal"] == [2, 0]


def test_stats_subjects_subset_and_no_labels(dataset, tmp_path, capsys):
    (tmp_path / "keys.txt").write_text("s0\n")
    rc = stats_main(["--data", str(dataset),
                     "--subjects", str(tmp_path / "keys.txt"),
                     "--label_group", "",
                     "--json", str(tmp_path / "stats.json")])
    assert rc == 0
    r = json.loads((tmp_path / "stats.json").read_text())
    assert r["images"]["subjects"] == 1
    assert "labels" not in r
    capsys.readouterr()


def test_stats_over_nifti_dir(tmp_path, capsys):
    from tpu_mednet.utils.nifti import save_nifti

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = np.full((8, 8, 8), 3.0, np.float32)
    lbl = np.zeros((8, 8, 8), np.uint8)
    lbl[:4] = 1
    save_nifti(tmp_path / "images" / "s0.nii.gz", img)
    save_nifti(tmp_path / "labels" / "s0.nii.gz", lbl)
    rc = stats_main(["--data", str(tmp_path),
                     "--json", str(tmp_path / "stats.json")])
    assert rc == 0
    r = json.loads((tmp_path / "stats.json").read_text())
    assert r["images"]["mean"][0] == pytest.approx(3.0)
    assert r["images"]["std"][0] == pytest.approx(0.0, abs=1e-6)
    assert r["labels"]["frequency"][1] == pytest.approx(0.5)
    capsys.readouterr()
