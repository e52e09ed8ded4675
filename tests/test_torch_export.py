"""Tests for the flax -> torch checkpoint exporter.

Round-trip (torch -> flax -> torch is bit-exact) plus forward equality:
a torch model built from the reference's OWN components, strict-loaded
with the exported state_dict, reproduces the flax model's outputs.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "midasmednet")):
    pytest.skip("reference tree unavailable", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_torch_import import RefUNet  # noqa: E402
from tpu_mednet.models.unet import ResidualUNet3D, UNet3D  # noqa: E402
from tpu_mednet.utils.torch_export import flax_to_state_dict  # noqa: E402
from tpu_mednet.utils.torch_import import convert_state_dict  # noqa: E402

# Trainer-fit / CLI-e2e / sharding-equivalence integration tier: dozens of
# seconds of jit compiles per test (measured round 5) — the quick loop
# (-m 'not slow') keeps the unit surface only.
pytestmark = pytest.mark.slow


def test_round_trip_is_bit_exact_residual():
    tmodel = RefUNet(2, 3, [8, 16, 32], residual=True, order="cge")
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    back = flax_to_state_dict(convert_state_dict(sd))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_round_trip_is_bit_exact_double_batchnorm():
    tmodel = RefUNet(1, 2, [8, 16], residual=False, order="cbr")
    # move running stats off init values
    tmodel.train()
    with torch.no_grad():
        tmodel(torch.randn(2, 1, 8, 8, 8))
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    back = flax_to_state_dict(convert_state_dict(sd))
    # num_batches_tracked is bookkeeping; exported as 0
    for k in sd:
        if k.endswith("num_batches_tracked"):
            assert back[k] == 0
        else:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_exported_state_dict_loads_strict_and_matches_forward():
    """A flax-initialized model exports to a state_dict the reference
    module tree strict-loads, with torch forward == flax forward."""
    f_maps = (8, 16)
    jmodel = ResidualUNet3D(1, 2, f_maps=f_maps, num_levels=2,
                            dtype=jnp.float32)
    variables = jax.jit(jmodel.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 8, 1)), train=False)

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in flax_to_state_dict(variables).items()}
    tmodel = RefUNet(1, 2, list(f_maps), residual=True, order="cge")
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()

    x = np.random.default_rng(5).normal(0, 1, (1, 8, 8, 8, 1)).astype(
        np.float32)
    y_j = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        y_t = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    np.testing.assert_allclose(
        y_j.transpose(0, 4, 1, 2, 3), y_t, atol=2e-4, rtol=1e-3)


def test_export_cli_end_to_end(tmp_path):
    """import -> export round trip through the CLIs preserves the weights
    and the PL-checkpoint metadata."""
    import argparse

    from tpu_mednet.cli.export_torch import main as export_main
    from tpu_mednet.cli.import_torch import main as import_main

    tmodel = RefUNet(1, 2, [4, 8], residual=True, order="cge")
    torch.save(
        {
            "state_dict": tmodel.state_dict(),
            "hparams": argparse.Namespace(
                in_channels=1, out_channels=2, fmaps=4, loss="DICE",
                loss_weight=[0.1, 1.0], learning_rate=0.001),
            "global_step": 23,
        },
        tmp_path / "ref.ckpt",
    )
    assert import_main([
        "--checkpoint", str(tmp_path / "ref.ckpt"),
        "--output", str(tmp_path / "imported"),
    ]) == 0
    assert export_main([
        "--checkpoint", str(tmp_path / "imported"),
        "--output", str(tmp_path / "back.ckpt"),
    ]) == 0

    back = torch.load(tmp_path / "back.ckpt", map_location="cpu",
                      weights_only=False)
    assert back["global_step"] == 23
    assert vars(back["hparams"])["loss"] == "DICE"
    orig = tmodel.state_dict()
    assert set(back["state_dict"]) == set(orig)
    for k, v in orig.items():
        np.testing.assert_allclose(
            back["state_dict"][k].numpy(), v.numpy(), atol=1e-7,
            err_msg=k)
    # and torch strict-loads the exported dict
    tmodel.load_state_dict(back["state_dict"], strict=True)
