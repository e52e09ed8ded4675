"""Export a tpu-mednet checkpoint as a reference (torch-mednet) .ckpt.

The inverse of ``mednet-import-torch`` — two-way checkpoint interop with
the reference framework.  A model trained here loads straight into the
reference's torch tooling (``load_from_checkpoint`` semantics,
`/root/reference/examples/predict.py:46-50`) or plain
``model.load_state_dict``::

    mednet-export-torch --checkpoint runs/model --output model.ckpt

Conversion is the value-verified inverse of the import transforms
(round-trip and torch-forward-equality tests in
``tests/test_torch_export.py``).  Runs entirely on CPU.
"""

from __future__ import annotations

import argparse
import logging
import sys
import types
from typing import Optional, Sequence

from tpu_mednet.config import load_dotenv, replace_env

logger = logging.getLogger("export_torch")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="tpu-mednet checkpoint directory")
    parser.add_argument("--output", required=True,
                        help="output .ckpt path (torch.save format)")
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step to export (default: latest)")
    parser.add_argument("--no_ema", action="store_true",
                        help="export the raw final params instead of the "
                             "EMA weights an --ema_decay checkpoint carries")
    parser.add_argument("--log_level", type=str, default="INFO")
    return parser


def main(argv: Optional[Sequence[str]] = None) -> int:
    load_dotenv()
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)

    # host-side tool: never needs (and must not claim) the TPU
    import jax

    prev_platforms = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    try:
        return _run(args)
    finally:
        # config restored for in-process callers; backend selection is
        # process-wide once initialized (fresh process for TPU use after)
        jax.config.update("jax_platforms", prev_platforms)


def _run(args) -> int:
    from tpu_mednet.cli.predict import _coerce
    from tpu_mednet.inference.serving import detect_task_name
    from tpu_mednet.tasks import LandmarkTask, SegmentationTask
    from tpu_mednet.train import create_train_state
    from tpu_mednet.train.checkpoint import CheckpointManager, load_for_inference
    from tpu_mednet.utils.torch_export import save_reference_checkpoint

    ckpt_dir = replace_env(args.checkpoint)
    mgr = CheckpointManager(ckpt_dir)
    try:
        hp = mgr.restore_hparams(step=args.step)
        if hp is None:
            raise SystemExit(
                f"checkpoint at {ckpt_dir} has no hparams side-car; export "
                "needs the training hparams to rebuild the model"
            )
        step = args.step if args.step is not None else mgr.latest_step
    finally:
        mgr.close()
    ns = types.SimpleNamespace(**{k: _coerce(v) for k, v in hp.items()})
    task_name = detect_task_name(hp)
    task = (LandmarkTask if task_name == "LandmarkNet"
            else SegmentationTask).from_hparams(ns)
    f_maps = task.model.config.feature_maps
    div = 2 ** (len(f_maps) - 1)
    template = create_train_state(
        task.model, (1, div, div, div, task.model.config.in_channels),
        learning_rate=float(getattr(ns, "learning_rate", 1e-3)),
    )
    # load_for_inference owns the template/EMA/optimizer-tree handling
    # (non-default optimizer configs reshape the on-disk opt_state)
    variables, _ = load_for_inference(
        ckpt_dir, template, step=args.step, use_ema=not args.no_ema,
    )
    save_reference_checkpoint(
        replace_env(args.output), variables, hparams=hp, step=step or 0,
    )
    logger.info("exported %s (step %s) -> %s", task_name, step, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
