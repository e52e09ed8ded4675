"""Device mesh and sharding helpers.

The reference's only parallelism is pytorch-lightning's integer ``gpus``
flag (`/root/reference/examples/train_seg.py:126`; SURVEY.md §2.3).  Here
parallelism is a first-class component: a ``jax.sharding.Mesh`` over the
slice with

- a ``data`` axis for batch/data parallelism (gradients reduced by XLA's
  collectives over ICI — no hand-written NCCL equivalent), and
- an optional ``space`` axis for spatial partitioning of large volumes
  (the conv-net analogue of context parallelism; halo exchange lives in
  ``tpu_mednet.parallel.halo``).

Everything goes through ``jax.jit`` with ``NamedSharding`` in/out specs; XLA
inserts the collectives.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data[, space]) mesh over the available devices.

    With ``n_data=None`` all devices (divided by ``n_space``) go to the data
    axis.  A 1-device mesh is valid and lets single-chip and multi-chip code
    share one path.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_space != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_space={n_space}"
            )
        n_data = len(devices) // n_space
    needed = n_data * n_space
    if needed > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_space} needs {needed} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:needed]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis: int = 1) -> NamedSharding:
    """Shard one spatial axis of an (N, X, Y, Z, C) volume over 'space'."""
    spec = [None] * 5
    spec[0] = DATA_AXIS
    spec[axis] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def train_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharding for the train/eval step under this mesh.

    dp-only meshes shard just the leading batch axis; with a non-trivial
    'space' axis the first spatial axis (X of N,X,Y,Z,C) is sharded too —
    spatially-partitioned TRAINING, where XLA inserts the conv/GN halo
    exchanges and reductions in both the forward and backward pass.  The
    conv-net analogue of context/sequence parallelism (SURVEY §2.3(b));
    lets patches larger than one chip's HBM train across the 'space' axis.
    """
    if mesh.shape.get(SPACE_AXIS, 1) > 1:
        return spatial_sharding(mesh, axis=1)
    return batch_sharding(mesh)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded over 'data'.

    The per-host slice of a global batch in multi-host settings is the
    caller's responsibility (per-host sharded input pipelines, SURVEY §5.8).
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_subject_keys(keys: Sequence[str],
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> list:
    """Per-host subject-key assignment for multi-host input pipelines.

    Each host loads and samples only its own key shard (round-robin), so
    the global batch is assembled from per-host local batches — the
    "per-host sharded zarr patch streaming" of BASELINE config 5 and
    SURVEY §5.8.  Defaults to jax's process env (single-host => identity).

    When ``len(keys)`` does not divide evenly, the trailing remainder is
    DROPPED (with a warning) so every process gets the same share: unequal
    per-host sampler lengths would give hosts different per-epoch batch
    counts, and the host with more batches would block forever in the
    global-batch collective while the others move on.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    keys = list(keys)
    if pc > 1 and keys and len(keys) < pc:
        # a zero share would silently turn the epoch into a no-op (empty
        # samplers on every host, fit() "succeeds" having trained nothing)
        raise ValueError(
            f"{len(keys)} subject keys cannot be shared across {pc} "
            f"processes (every process would get 0); use fewer processes "
            f"or more subjects"
        )
    rem = len(keys) % pc
    if pc > 1 and rem:
        logger.warning(
            "dropping %d of %d subject keys so all %d processes get an "
            "equal share (%d each) — unequal per-host epoch lengths would "
            "deadlock the cross-host collectives",
            rem, len(keys), pc, len(keys) // pc,
        )
        keys = keys[: len(keys) - rem]
    return [k for i, k in enumerate(keys) if i % pc == pi]
