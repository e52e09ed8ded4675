"""Import reference (torch-mednet) checkpoints into tpu-mednet.

Reference users carry trained pytorch-lightning checkpoints
(`/root/reference/examples/train_seg.py:122-131` default PL checkpointing;
restored by `examples/predict.py:46-50` ``load_from_checkpoint``).  This
module converts such a checkpoint — or any bare ``state_dict`` of the
reference model family (`/root/reference/midasmednet/unet/model.py:11-213`)
— into tpu-mednet's flax parameter tree, so existing trained models run on
TPU without retraining.

Weight-layout transforms (value-verified against torch in
``tests/test_torch_import.py``):

- ``nn.Conv3d``          (O, I, kD, kH, kW)  -> flax ``nn.Conv`` kernel
  (kD, kH, kW, I, O): transpose only — both frameworks cross-correlate.
- ``nn.ConvTranspose3d`` (I, O, kD, kH, kW)  -> flax ``nn.ConvTranspose``
  kernel (kD, kH, kW, I, O): **spatial flip + transpose** — torch's
  transposed conv is the adjoint of its correlation (kernel applied
  flipped), while ``lax.conv_transpose(transpose_kernel=False)`` applies
  the kernel unflipped to the dilated input.
- ``nn.GroupNorm``/``nn.BatchNorm3d`` ``weight``/``bias`` -> flax
  ``scale``/``bias``; BatchNorm running statistics land in the
  ``batch_stats`` collection; ``num_batches_tracked`` is dropped.

Module-tree mapping (torch names from the reference constructors,
components.py:70-287 / model.py:140-187):

====================================  ====================================
torch key prefix                      flax path
====================================  ====================================
``encoders.{i}.basic_module.``        ``encoder{i}/block/``
``decoders.{i}.upsample.``            ``decoder{i}/upsample/``
``decoders.{i}.basic_module.``        ``decoder{i}/block/``
``final_conv.``                       ``final_conv/``
``conv{j}.`` (ExtResNetBlock)         ``conv{j}/``
``SingleConv{j}.`` (DoubleConv)       ``conv{j}/``
====================================  ====================================
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "convert_state_dict",
    "infer_architecture",
    "load_torch_checkpoint",
    "check_against_template",
]


_LEAF_RE = re.compile(
    r"^(?P<layer>conv|groupnorm|batchnorm)\."
    r"(?P<leaf>weight|bias|running_mean|running_var|num_batches_tracked)$"
)
_TOP_RE = re.compile(
    r"^(?:(?P<kind>encoders|decoders)\.(?P<idx>\d+)\.(?P<rest>.+)"
    r"|final_conv\.(?P<final_leaf>weight|bias))$"
)
_BLOCK_RE = re.compile(r"^(?:conv(?P<res>\d+)|SingleConv(?P<dbl>\d+))\.(?P<rest>.+)$")


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, kD, kH, kW) -> flax (kD, kH, kW, I, O)."""
    if w.ndim != 5:
        raise ValueError(f"expected a 5-D Conv3d weight, got shape {w.shape}")
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def _conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (I, O, kD, kH, kW) -> flax (kD, kH, kW, I, O).

    Spatial flip is required: torch's transposed conv applies the kernel as
    the adjoint of correlation; flax's ``ConvTranspose`` (with the default
    ``transpose_kernel=False``) applies it unflipped.
    """
    if w.ndim != 5:
        raise ValueError(
            f"expected a 5-D ConvTranspose3d weight, got shape {w.shape}"
        )
    return np.ascontiguousarray(w[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray, key: str) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate mapping for {'/'.join(path)} (from {key!r})")
    node[path[-1]] = value


def _convert_block_leaf(
    params: Dict, stats: Dict, base: Tuple[str, ...], rest: str, key: str,
    value: np.ndarray,
) -> None:
    """Map one ``conv{j}.<layer>.<leaf>`` entry under a block."""
    m = _BLOCK_RE.match(rest)
    if not m:
        raise ValueError(f"unrecognized reference state_dict key: {key!r}")
    j = m.group("res") or m.group("dbl")
    leaf_m = _LEAF_RE.match(m.group("rest"))
    if not leaf_m:
        raise ValueError(f"unrecognized reference state_dict key: {key!r}")
    layer, leaf = leaf_m.group("layer"), leaf_m.group("leaf")
    conv_path = base + (f"conv{j}", layer)
    if layer == "conv":
        if leaf == "weight":
            _set(params, conv_path + ("kernel",), _conv_kernel(value), key)
        elif leaf == "bias":
            _set(params, conv_path + ("bias",), value, key)
        else:
            raise ValueError(f"unrecognized reference state_dict key: {key!r}")
    else:  # groupnorm / batchnorm
        if leaf == "weight":
            _set(params, conv_path + ("scale",), value, key)
        elif leaf == "bias":
            _set(params, conv_path + ("bias",), value, key)
        elif leaf == "running_mean":
            _set(stats, conv_path + ("mean",), value, key)
        elif leaf == "running_var":
            _set(stats, conv_path + ("var",), value, key)
        elif leaf == "num_batches_tracked":
            pass  # torch bookkeeping; flax keeps no equivalent
        else:
            raise ValueError(f"unrecognized reference state_dict key: {key!r}")


def convert_state_dict(
    state_dict: Mapping[str, Any],
) -> Dict[str, Dict]:
    """Convert a reference-model ``state_dict`` to flax ``variables``.

    Accepts torch tensors or numpy arrays as values.  Returns
    ``{"params": tree}`` plus ``"batch_stats"`` when the source model used
    BatchNorm orders.  Raises on any key it does not recognize — a silent
    skip would import a partially-initialized model.
    """
    params: Dict = {}
    stats: Dict = {}
    for key, raw in state_dict.items():
        value = np.asarray(
            raw.detach().cpu().numpy() if hasattr(raw, "detach") else raw
        )
        m = _TOP_RE.match(key)
        if not m:
            raise ValueError(
                f"unrecognized reference state_dict key: {key!r} — expected "
                "the midasmednet UNet3D/ResidualUNet3D tree "
                "(encoders.* / decoders.* / final_conv.*)"
            )
        if m.group("final_leaf"):
            leaf = "kernel" if m.group("final_leaf") == "weight" else "bias"
            _set(
                params, ("final_conv", leaf),
                _conv_kernel(value) if leaf == "kernel" else value, key,
            )
            continue
        kind, idx, rest = m.group("kind"), int(m.group("idx")), m.group("rest")
        stage = ("encoder" if kind == "encoders" else "decoder") + str(idx)
        if kind == "decoders" and rest.startswith("upsample."):
            leaf = rest[len("upsample."):]
            if leaf == "weight":
                _set(
                    params, (stage, "upsample", "kernel"),
                    _conv_transpose_kernel(value), key,
                )
            elif leaf == "bias":
                _set(params, (stage, "upsample", "bias"), value, key)
            else:
                raise ValueError(f"unrecognized reference state_dict key: {key!r}")
            continue
        if not rest.startswith("basic_module."):
            raise ValueError(f"unrecognized reference state_dict key: {key!r}")
        _convert_block_leaf(
            params, stats, (stage, "block"),
            rest[len("basic_module."):], key, value,
        )
    variables: Dict[str, Dict] = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


def infer_architecture(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Derive the model architecture from state_dict shapes alone.

    Returns ``{family, in_channels, out_channels, f_maps, num_levels}``
    where family is 'residual' (ExtResNetBlock tree, ``conv1..3``) or
    'double' (DoubleConv tree, ``SingleConv1..2``).  Used to cross-check
    user-supplied hparams and to import bare state_dicts with none.
    """
    keys = set(state_dict)
    if "encoders.0.basic_module.conv1.conv.weight" in keys:
        family, first = "residual", "encoders.{i}.basic_module.conv1.conv.weight"
    elif "encoders.0.basic_module.SingleConv1.conv.weight" in keys:
        family, first = "double", "encoders.{i}.basic_module.SingleConv1.conv.weight"
    else:
        raise ValueError(
            "state_dict is not a midasmednet UNet3D/ResidualUNet3D: missing "
            "encoders.0.basic_module.{conv1|SingleConv1}.conv.weight"
        )
    n_levels = 0
    while first.format(i=n_levels) in keys:
        n_levels += 1
    w0 = np.asarray(state_dict[first.format(i=0)])
    in_channels = int(w0.shape[1])
    # per-level output channels: the LAST conv of each encoder block
    last = "conv3" if family == "residual" else "SingleConv2"
    f_maps = tuple(
        int(np.asarray(
            state_dict[f"encoders.{i}.basic_module.{last}.conv.weight"]
        ).shape[0])
        for i in range(n_levels)
    )
    fw = np.asarray(state_dict["final_conv.weight"])
    return {
        "family": family,
        "in_channels": in_channels,
        "out_channels": int(fw.shape[0]),
        "f_maps": f_maps,
        "num_levels": n_levels,
    }


def load_torch_checkpoint(
    path,
) -> Tuple[Dict[str, np.ndarray], Optional[Dict[str, Any]], int]:
    """Load a PL checkpoint or bare state_dict file saved by torch.

    Returns ``(state_dict_as_numpy, hparams_dict_or_None, global_step)``.
    pytorch-lightning 0.9 stores the weights under ``state_dict`` and the
    argparse hparams namespace under ``hparams`` (later PL versions use
    ``hyper_parameters``); both are handled, as is a raw
    ``torch.save(model.state_dict())`` file.

    Uses ``weights_only=False``: PL checkpoints pickle an
    ``argparse.Namespace`` — only import checkpoints you trust.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:  # older torch without the weights_only kwarg
        ckpt = torch.load(path, map_location="cpu")
    hparams: Optional[Dict[str, Any]] = None
    step = 0
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        hp = ckpt.get("hparams", ckpt.get("hyper_parameters"))
        if hp is not None:
            hparams = dict(vars(hp)) if not isinstance(hp, dict) else dict(hp)
        step = int(ckpt.get("global_step", 0) or 0)
    else:
        sd = ckpt
    out = {}
    for k, v in sd.items():
        # tasks subclass the model directly so keys carry no prefix
        # (segmentation.py:22, landmarks.py:22); strip a 'model.' prefix
        # anyway for wrapped exports
        k = k[len("model."):] if k.startswith("model.") else k
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out, hparams, step


def check_against_template(converted: Dict, template: Dict) -> None:
    """Assert the converted tree matches a freshly-initialized one.

    ``converted``/``template`` are ``variables``-style dicts.  Any missing,
    extra, or shape-mismatched leaf raises with the full path list — the
    import must be total, not best-effort.
    """
    import jax

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, (dict,)) or hasattr(v, "items"):
                out.update(flatten(v, prefix + (k,)))
            else:
                out["/".join(prefix + (k,))] = v
        return out

    for coll in ("params", "batch_stats"):
        has_c, has_t = coll in converted, coll in template and template[coll]
        if bool(has_c) != bool(has_t):
            raise ValueError(
                f"collection {coll!r}: present in "
                f"{'converted' if has_c else 'template'} only — "
                "norm-layer family mismatch between checkpoint and config"
            )
        if not has_c:
            continue
        conv = flatten(converted[coll])
        temp = flatten(jax.tree.map(lambda x: x, template[coll]))
        missing = sorted(set(temp) - set(conv))
        extra = sorted(set(conv) - set(temp))
        if missing or extra:
            raise ValueError(
                f"{coll} tree mismatch — missing from checkpoint: {missing}; "
                f"unexpected in checkpoint: {extra}"
            )
        bad = [
            f"{k}: checkpoint {tuple(conv[k].shape)} vs model {tuple(temp[k].shape)}"
            for k in temp
            if tuple(conv[k].shape) != tuple(np.shape(temp[k]))
        ]
        if bad:
            raise ValueError(f"{coll} shape mismatches — " + "; ".join(bad))
