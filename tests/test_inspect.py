"""mednet-inspect: checkpoint self-description CLI (cli/inspect_ckpt.py)."""

import json

import numpy as np
import pytest

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow

h5py = pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from tpu_mednet.cli.train_seg import main as train_seg_main

    tmp_path = tmp_path_factory.mktemp("inspect")
    rng = np.random.default_rng(0)
    shape = (16, 16, 16)
    with h5py.File(tmp_path / "data.h5", "w") as hf:
        img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
        lbl = np.zeros((1, *shape), dtype=np.uint8)
        lbl[0, 4:12, 4:12, 4:12] = 1
        img[0, 4:12, 4:12, 4:12] += 2.0
        hf.create_dataset("images/s0", data=img)
        hf.create_dataset("labels/s0", data=lbl)
    (tmp_path / "train.txt").write_text("s0\n")

    rc = train_seg_main([
        "--data_path", str(tmp_path / "data.h5"),
        "--train_set", str(tmp_path / "train.txt"),
        "--val_set", str(tmp_path / "train.txt"),
        "--model_dir", str(tmp_path / "model"),
        "--patch_size", "16", "16", "16",
        "--patches_per_subject", "2",
        "--max_epochs", "2", "--batch_size", "2",
        "--fmaps", "4", "--out_channels", "2",
        "--loss", "CE", "--no_bf16",
    ])
    assert rc == 0
    return tmp_path / "model"


def test_inspect_json(trained_ckpt, capsys):
    from tpu_mednet.cli.inspect_ckpt import main as inspect_main

    rc = inspect_main(["--checkpoint", str(trained_ckpt), "--json"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["task"] == "SegmentationNet"
    assert info["steps"] and info["latest_step"] == info["steps"][-1]
    assert info["ckpt_format"] is not None
    m = info["model"]
    assert m["in_channels"] == 1 and m["out_channels"] == 2
    assert m["levels"] == len(m["f_maps"]) and m["params"] > 0
    assert info["optimizer"].get("optimizer") == "adam"
    assert info["ema"] is False
    # the val run tracked a best checkpoint
    assert info["best"]["metric"] == "val_loss"
    assert info["best"]["step"] in info["steps"] + [0]


def test_inspect_text(trained_ckpt, capsys):
    from tpu_mednet.cli.inspect_ckpt import main as inspect_main

    rc = inspect_main(["--checkpoint", str(trained_ckpt)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "task       : SegmentationNet" in out
    assert "params" in out and "best" in out
