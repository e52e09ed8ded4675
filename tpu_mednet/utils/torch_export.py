"""Export tpu-mednet weights as a reference (torch-mednet) checkpoint.

The inverse of :mod:`tpu_mednet.utils.torch_import`: converts a flax
parameter tree back into the reference model family's ``state_dict``
(`/root/reference/midasmednet/unet/model.py:11-213`) and optionally wraps
it in a pytorch-lightning-style checkpoint dict, so models trained on TPU
load straight into the reference's torch tooling
(``Model.load_from_checkpoint`` semantics, `examples/predict.py:46-50`)
or any downstream torch pipeline via ``model.load_state_dict``.

Layout transforms are the exact inverses of the import ones (both are
value-verified round-trip in ``tests/test_torch_export.py``):

- flax ``nn.Conv`` kernel (kD, kH, kW, I, O) -> torch ``nn.Conv3d``
  (O, I, kD, kH, kW);
- flax ``nn.ConvTranspose`` kernel (kD, kH, kW, I, O) -> torch
  ``nn.ConvTranspose3d`` (I, O, kD, kH, kW) with the spatial flip undone;
- flax ``scale``/``bias`` -> torch norm ``weight``/``bias``; the
  ``batch_stats`` collection -> ``running_mean``/``running_var`` (plus the
  ``num_batches_tracked`` bookkeeping scalar torch's strict loading
  expects).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Mapping, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["flax_to_state_dict", "save_reference_checkpoint"]


def _kernel_to_conv(w: np.ndarray) -> np.ndarray:
    """flax (kD, kH, kW, I, O) -> torch Conv3d (O, I, kD, kH, kW)."""
    return np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2))


def _kernel_to_conv_transpose(w: np.ndarray) -> np.ndarray:
    """flax (kD, kH, kW, I, O) -> torch ConvTranspose3d (I, O, kD, kH, kW).

    Undoes the spatial flip the import applies (torch's transposed conv is
    the adjoint of its correlation; flax applies the kernel unflipped).
    """
    return np.ascontiguousarray(
        w.transpose(3, 4, 0, 1, 2)[:, :, ::-1, ::-1, ::-1]
    )


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _family(params: Mapping[str, Any]) -> str:
    """'residual' (ExtResNetBlock: conv1..3) or 'double' (conv1..2)."""
    block = params["encoder0"]["block"]
    return "residual" if "conv3" in block else "double"


def _emit_block(out: Dict[str, np.ndarray], prefix: str, block: Mapping,
                stats_block: Optional[Mapping], family: str) -> None:
    """Emit one basic block (ours conv{j}/...) under a torch prefix."""
    for name, layers in sorted(block.items()):
        if not name.startswith("conv"):
            raise ValueError(f"unexpected block entry {prefix}{name!r}")
        j = name[len("conv"):]
        tname = f"conv{j}" if family == "residual" else f"SingleConv{j}"
        for layer, leaves in layers.items():
            if layer == "conv":
                out[f"{prefix}{tname}.conv.weight"] = _kernel_to_conv(
                    _np(leaves["kernel"]))
                if "bias" in leaves:
                    out[f"{prefix}{tname}.conv.bias"] = _np(leaves["bias"])
            elif layer in ("groupnorm", "batchnorm"):
                out[f"{prefix}{tname}.{layer}.weight"] = _np(leaves["scale"])
                out[f"{prefix}{tname}.{layer}.bias"] = _np(leaves["bias"])
                if layer == "batchnorm":
                    st = (stats_block or {}).get(name, {}).get("batchnorm")
                    if st is None:
                        raise ValueError(
                            f"{prefix}{tname}: batchnorm params without "
                            "running statistics (batch_stats collection "
                            "missing)"
                        )
                    out[f"{prefix}{tname}.batchnorm.running_mean"] = _np(
                        st["mean"])
                    out[f"{prefix}{tname}.batchnorm.running_var"] = _np(
                        st["var"])
                    # torch strict loading expects the bookkeeping scalar
                    out[f"{prefix}{tname}.batchnorm.num_batches_tracked"] = (
                        np.asarray(0, dtype=np.int64))
            else:
                raise ValueError(f"unexpected layer {prefix}{tname}.{layer!r}")


def flax_to_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Convert tpu-mednet ``variables`` to a reference-model state_dict.

    ``variables`` is the ``{"params": ..., ["batch_stats": ...]}`` dict the
    checkpoint restores (packed and unpacked models share the same tree).
    Values come back as numpy arrays keyed exactly like the reference
    model's ``state_dict()``; wrap with :func:`save_reference_checkpoint`
    or feed tensors to ``model.load_state_dict`` directly.
    """
    params = variables["params"]
    stats = variables.get("batch_stats") or {}
    family = _family(params)
    out: Dict[str, np.ndarray] = {}
    for name in sorted(params):
        node = params[name]
        if name == "final_conv":
            out["final_conv.weight"] = _kernel_to_conv(_np(node["kernel"]))
            out["final_conv.bias"] = _np(node["bias"])
        elif name.startswith("encoder"):
            i = int(name[len("encoder"):])
            _emit_block(
                out, f"encoders.{i}.basic_module.", node["block"],
                stats.get(name, {}).get("block"), family,
            )
        elif name.startswith("decoder"):
            i = int(name[len("decoder"):])
            if "upsample" in node:
                out[f"decoders.{i}.upsample.weight"] = (
                    _kernel_to_conv_transpose(_np(node["upsample"]["kernel"])))
                out[f"decoders.{i}.upsample.bias"] = _np(
                    node["upsample"]["bias"])
            _emit_block(
                out, f"decoders.{i}.basic_module.", node["block"],
                stats.get(name, {}).get("block"), family,
            )
        else:
            raise ValueError(f"unexpected top-level param entry {name!r}")
    return out


def save_reference_checkpoint(
    path,
    variables: Mapping[str, Any],
    hparams: Optional[Dict[str, Any]] = None,
    step: int = 0,
    epoch: int = 0,
) -> None:
    """Write a pytorch-lightning-style ``.ckpt`` the reference can load.

    The dict carries ``state_dict`` (torch tensors), the hparams as an
    ``argparse.Namespace`` (what PL 0.9 restores into ``self.hparams``,
    `segmentation.py:33`), and ``global_step``/``epoch``.  tpu-only hparams
    keys (packed/remat/bf16/...) are dropped — the reference model ctor
    only reads its own names.
    """
    import argparse

    import torch

    sd = {
        # copy: arrays backed by jax buffers are non-writable views, which
        # torch.from_numpy warns about and must not alias anyway
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in flax_to_state_dict(variables).items()
    }
    drop = {"packed", "remat", "bf16", "device_sampler", "native_loader",
            "spatial_shards", "ckpt_format"}
    hp = {k: v for k, v in (hparams or {}).items() if k not in drop}
    # the reference expects int fmaps for the stock 5-level net but accepts
    # per-level tuples (model.py:148-150); keep whatever we stored
    torch.save(
        {
            "state_dict": sd,
            "hparams": argparse.Namespace(**hp),
            "global_step": int(step),
            "epoch": int(epoch),
        },
        path,
    )
    logger.info("wrote reference checkpoint (%d tensors, step %d) -> %s",
                len(sd), step, path)
