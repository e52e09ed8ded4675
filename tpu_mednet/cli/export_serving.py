"""Export a trained checkpoint to a standalone serving artifact.

The deployment complement to ``mednet-predict``: instead of a live process
rebuilding the model from Python (the reference's only option,
`/root/reference/examples/predict.py:46-50`), this lowers forward +
postprocess to versioned StableHLO with the trained weights baked in and
writes ONE file.  A serving host loads it with ``jax.export.deserialize``
and calls it — no tpu_mednet, flax, or checkpoint needed at serve time::

    mednet-export-serving --checkpoint runs/model --out model.jaxep \\
        --patch_size 96 96 96 --platforms tpu cpu

    # at serve time
    loaded = jax.export.deserialize(Path("model.jaxep").read_bytes())
    pred = loaded.call(batch)   # (N, 96, 96, 96, C) float32, any N
"""

from __future__ import annotations

import argparse
import logging
import sys
import types
from typing import Optional, Sequence

from tpu_mednet.config import load_dotenv, replace_env


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="checkpoint directory (with hparams side-car)")
    parser.add_argument("--out", required=True,
                        help="output artifact path (e.g. model.jaxep)")
    parser.add_argument("--patch_size", type=int, nargs=3,
                        default=[96, 96, 96])
    parser.add_argument("--batch_size", type=int, default=None,
                        help="pin the batch axis; default: symbolic (any N)")
    parser.add_argument("--model", default=None,
                        choices=["SegmentationNet", "LandmarkNet"],
                        help="default: auto-detect from the checkpoint "
                             "hparams (landmark runs carry "
                             "loss_regression_weight)")
    parser.add_argument("--platforms", nargs="*", default=None,
                        help="lowering platforms, e.g. tpu cpu "
                             "(default: current platform)")
    parser.add_argument("--tta", nargs="*", type=int, default=None,
                        metavar="AXIS",
                        help="bake mirror test-time augmentation into the "
                             "artifact: bare --tta flips all three spatial "
                             "axes; --tta 0 2 flips a subset (8x/4x compute "
                             "per call)")
    parser.add_argument("--no_ema", action="store_true",
                        help="bake the raw final params instead of the EMA "
                             "weights an --ema_decay checkpoint carries")
    parser.add_argument("--log_level", type=str, default="INFO")
    return parser


def main(argv: Optional[Sequence[str]] = None) -> int:
    load_dotenv()
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)
    logger = logging.getLogger("export_serving")

    from tpu_mednet.cli.predict import _coerce
    from tpu_mednet.inference.serving import (
        detect_task_name,
        export_predictor,
        save_exported,
    )
    from tpu_mednet.tasks import LandmarkTask, SegmentationTask
    from tpu_mednet.train import create_train_state, load_for_inference
    from tpu_mednet.train.checkpoint import CheckpointManager

    checkpoint_path = replace_env(args.checkpoint)
    mgr = CheckpointManager(checkpoint_path)
    try:
        hp = mgr.restore_hparams()
    finally:
        mgr.close()
    if hp is None:
        raise ValueError(
            f"checkpoint at {checkpoint_path} has no hparams side-car; "
            "export needs the training hparams to rebuild the model"
        )
    hparams = types.SimpleNamespace(**{k: _coerce(v) for k, v in hp.items()})

    detected = detect_task_name(hp)
    model_name = args.model
    if model_name is None:
        model_name = detected
        logger.info("--model not set; detected %s from the checkpoint "
                    "hparams", model_name)
    elif model_name != detected:
        raise ValueError(
            f"--model {model_name} but the checkpoint hparams say it was "
            f"trained as {detected} (loss_regression_weight "
            f"{'present' if detected == 'LandmarkNet' else 'absent'}); "
            f"exporting into the wrong task would bake the wrong "
            f"postprocess into the artifact"
        )
    if model_name == "LandmarkNet":
        task = LandmarkTask.from_hparams(hparams)
    else:
        task = SegmentationTask.from_hparams(hparams)

    in_ch = task.model.config.in_channels
    template = create_train_state(
        task.model, (1, *args.patch_size, in_ch), learning_rate=1e-3,
    )
    variables, _ = load_for_inference(checkpoint_path, template,
                                      use_ema=not args.no_ema)

    from tpu_mednet.inference.common import normalize_tta
    # bare --tta (empty list) means all three axes; absent means none
    tta_flips = () if args.tta is None else (normalize_tta(args.tta) or (0, 1, 2))

    exported = export_predictor(
        task, variables, args.patch_size, batch_size=args.batch_size,
        platforms=tuple(args.platforms) if args.platforms else None,
        tta_flips=tta_flips,
    )
    save_exported(exported, args.out)
    logger.info(
        "exported %s (%s, patch %s, batch %s, platforms %s, tta %s) -> %s",
        model_name, checkpoint_path, args.patch_size,
        args.batch_size if args.batch_size is not None else "symbolic",
        list(exported.platforms), tta_flips or "off", args.out,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
