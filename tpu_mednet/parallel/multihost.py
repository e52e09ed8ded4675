"""Multi-host (multi-process) readiness: init + global batch assembly.

The reference's parallelism is single-process (`pytorch-lightning
gpus=N`, `/root/reference/examples/train_seg.py:126`); scaling a TPU slice
beyond one host instead needs (SURVEY.md §5.8, BASELINE config 5):

1. ``jax.distributed.initialize`` before first backend use, so every
   process sees the GLOBAL device set;
2. per-host subject-key sharding (``mesh.shard_subject_keys``) so each
   host samples only its shard of the data;
3. global-batch assembly from per-host local batches
   (``jax.make_array_from_process_local_data``) — each host contributes
   its rows of the batch-sharded global array, no host ever materializes
   the full batch.

All three are no-ops / identities on a single host, so the single-chip and
multi-host code paths are one path.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Call ``jax.distributed.initialize`` when multi-process env/args ask
    for it; return whether an initialize happened.

    Triggers on explicit args, or on the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``),
    which the launcher of each host process sets.  On a managed TPU pod
    (GKE/GCE metadata present) ``jax.distributed.initialize()`` with no
    args auto-detects — opt in via ``TPU_MEDNET_DISTRIBUTED=1``.  Single
    host: returns False without touching the backend.
    """
    env = os.environ
    coordinator_address = coordinator_address or env.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])

    # fail FAST on a partially-specified multi-process environment: running
    # on as independent single-host jobs would silently train the full
    # global batch per process and race on the checkpoint directory
    partial = [coordinator_address, num_processes, process_id]
    if any(v is not None and v != "" for v in partial) and not (
        coordinator_address and num_processes is not None
        and process_id is not None
    ):
        raise ValueError(
            "incomplete multi-process environment: need ALL of "
            "JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID "
            f"(got coordinator={coordinator_address!r}, "
            f"num_processes={num_processes!r}, process_id={process_id!r})"
        )
    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
        return True
    if env.get("TPU_MEDNET_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # pod metadata auto-detection
        logger.info(
            "jax.distributed auto-initialized: process %d/%d",
            jax.process_index(), jax.process_count(),
        )
        return True
    return False


def local_batch_size(global_batch_size: int) -> int:
    """Rows of the global batch this host must produce."""
    pc = jax.process_count()
    if global_batch_size % pc != 0:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"{pc} processes"
        )
    return global_batch_size // pc


def assemble_global_array(local: np.ndarray, sharding) -> jax.Array:
    """Build the GLOBAL batch-sharded array from this host's local rows.

    On one process this degenerates to a plain sharded ``device_put``;
    multi-process, each host hands ``make_array_from_process_local_data``
    its rows and JAX stitches the global array across hosts without any
    host seeing the whole batch.
    """
    local = np.ascontiguousarray(local)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def assemble_global_batch(
    batch: Dict[str, np.ndarray], sharding,
    array_keys=("data", "label"),
) -> Dict[str, object]:
    """``assemble_global_array`` over the array entries of a batch dict."""
    out = dict(batch)
    for k in array_keys:
        if k in out:
            out[k] = assemble_global_array(np.asarray(out[k]), sharding)
    return out
