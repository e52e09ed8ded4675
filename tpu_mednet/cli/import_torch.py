"""Import a reference (torch-mednet) checkpoint for use on TPU.

Migration entry point: converts a pytorch-lightning checkpoint trained with
the reference framework (`/root/reference/examples/train_seg.py:122-131`
default PL checkpointing) — or a bare ``torch.save(model.state_dict())``
file — into a tpu-mednet orbax checkpoint with the hparams side-car, so
``mednet-predict``, ``mednet-export-serving`` and ``--resume`` fine-tuning
work on it directly::

    mednet-import-torch --checkpoint epoch=42.ckpt --output runs/imported
    mednet-predict -c predict.yaml prediction.checkpoint=runs/imported

The conversion is value-verified (torch and flax forwards agree in fp32,
``tests/test_torch_import.py``); the architecture is cross-checked against
shapes inferred from the state_dict itself, so a wrong or missing hparams
bundle cannot silently import a mis-shaped model.  Runs entirely on CPU.
"""

from __future__ import annotations

import argparse
import logging
import sys
import types
from typing import Optional, Sequence

from tpu_mednet.config import load_dotenv, replace_env

logger = logging.getLogger("import_torch")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="reference .ckpt (pytorch-lightning) or a bare "
                             "torch state_dict file")
    parser.add_argument("--output", required=True,
                        help="output tpu-mednet checkpoint directory")
    parser.add_argument("--model", default=None,
                        choices=["SegmentationNet", "LandmarkNet"],
                        help="default: auto-detect (landmark checkpoints "
                             "carry loss_regression_weight in hparams)")
    parser.add_argument("--set", dest="overrides", nargs="*", default=[],
                        metavar="KEY=VALUE",
                        help="hparams overrides/additions, e.g. "
                             "loss_regression_weight=0.001,0.015 for a bare "
                             "state_dict with no hparams bundle")
    parser.add_argument("--log_level", type=str, default="INFO")
    return parser


def _parse_override(kv: str):
    if "=" not in kv:
        raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
    k, v = kv.split("=", 1)
    from tpu_mednet.cli.predict import _coerce

    if "," in v:
        return k, [_coerce(x) for x in v.split(",")]
    return k, _coerce(v)


def main(argv: Optional[Sequence[str]] = None) -> int:
    load_dotenv()
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)

    # host-side tool: conversion and template tracing never need the TPU
    # (and must not trigger a remote compile); orbax checkpoints written on
    # CPU restore on any platform
    import jax

    prev_platforms = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    try:
        return _run(args)
    finally:
        # restore the config value for in-process callers; note the backend
        # SELECTION is already initialized by now, so a caller wanting the
        # TPU afterwards must run in a fresh process (the CLI normally is
        # one) — jax does not re-scan platforms after first use
        jax.config.update("jax_platforms", prev_platforms)


def _run(args) -> int:
    import jax

    from tpu_mednet.cli.predict import _coerce
    from tpu_mednet.inference.serving import detect_task_name
    from tpu_mednet.tasks import LandmarkTask, SegmentationTask
    from tpu_mednet.train import create_train_state
    from tpu_mednet.train.checkpoint import CheckpointManager
    from tpu_mednet.utils.torch_import import (
        check_against_template,
        convert_state_dict,
        infer_architecture,
        load_torch_checkpoint,
    )

    ckpt_path = replace_env(args.checkpoint)
    sd, hparams, step = load_torch_checkpoint(ckpt_path)
    arch = infer_architecture(sd)
    logger.info(
        "loaded %s: %s family, in=%d out=%d f_maps=%s, global_step=%d, "
        "hparams %s", ckpt_path, arch["family"], arch["in_channels"],
        arch["out_channels"], arch["f_maps"], step,
        "present" if hparams else "absent",
    )
    if arch["family"] != "residual":
        raise SystemExit(
            "the checkpoint is a vanilla (DoubleConv) UNet3D — the reference "
            "tasks train ResidualUNet3D only (segmentation.py:22, "
            "landmarks.py:22), so there is no task to attach it to. Use "
            "tpu_mednet.utils.torch_import.convert_state_dict for "
            "programmatic access to the converted weights."
        )

    hparams = dict(hparams or {})
    for kv in args.overrides:
        k, v = _parse_override(kv)
        hparams[k] = v

    # reconcile hparams with shapes inferred from the weights themselves
    for key, inferred in (
        ("in_channels", arch["in_channels"]),
        ("out_channels", arch["out_channels"]),
    ):
        got = _coerce(hparams.get(key)) if key in hparams else None
        if got is not None and int(got) != inferred:
            raise SystemExit(
                f"hparams say {key}={got} but the weights have "
                f"{key}={inferred}; refusing to import a mis-shaped model"
            )
        hparams[key] = inferred
    if "fmaps" in hparams:
        fm = _coerce(hparams["fmaps"])
        expanded = (
            tuple(int(fm) * 2**k for k in range(arch["num_levels"]))
            if isinstance(fm, (int, float))
            else tuple(int(x) for x in fm)
        )
        if expanded != arch["f_maps"]:
            raise SystemExit(
                f"hparams fmaps={fm} expands to {expanded} but the weights "
                f"have f_maps={arch['f_maps']}; refusing to import"
            )
    # store the explicit per-level tuple: it carries num_levels too (the
    # reference hardcodes 5 levels for int fmaps, model.py:148-150; the
    # tuple form is depth-exact for any checkpoint)
    hparams["fmaps"] = list(arch["f_maps"])
    hparams.setdefault("learning_rate", 1e-3)

    ns = types.SimpleNamespace(**{k: _coerce(v) for k, v in hparams.items()})
    detected = detect_task_name(hparams)
    model_name = args.model
    if model_name is None:
        model_name = detected
        logger.info("--model not set; detected %s from hparams", model_name)
    elif model_name != detected:
        raise SystemExit(
            f"--model {model_name} but the hparams say the checkpoint was "
            f"trained as {detected} (loss_regression_weight "
            f"{'present' if detected == 'LandmarkNet' else 'absent'}); "
            "fix --model, or --set/remove loss_regression_weight"
        )
    if model_name == "LandmarkNet":
        if not getattr(ns, "loss_regression_weight", None):
            raise SystemExit(
                "LandmarkNet import needs loss_regression_weight (defines "
                "the heatmap/class channel split, landmarks.py:57); pass "
                "--set loss_regression_weight=w1,w2,..."
            )
        task = LandmarkTask.from_hparams(ns)
    else:
        task = SegmentationTask.from_hparams(ns)

    variables = convert_state_dict(sd)
    div = 2 ** (arch["num_levels"] - 1)
    template = create_train_state(
        task.model, (1, div, div, div, arch["in_channels"]),
        learning_rate=float(getattr(ns, "learning_rate", 1e-3)),
    )
    check_against_template(
        variables,
        {"params": template.params, "batch_stats": template.batch_stats},
    )
    state = template.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", template.batch_stats),
        # carry the torch run's global_step INTO the state too, so --resume
        # continues epoch accounting from it (not just the directory label)
        step=step,
    )

    mgr = CheckpointManager(replace_env(args.output))
    try:
        mgr.save(step, state, hparams=hparams)
        mgr.wait()
    finally:
        mgr.close()
    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(variables["params"])
    )
    logger.info(
        "imported %s (%s params) at step %d -> %s",
        model_name, f"{n_params:,}", step, args.output,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
