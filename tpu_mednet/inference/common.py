"""Shared plumbing for the on-device inference pipelines.

`device_sliding.py` (crop-stitch) and `weighted.py` (Gaussian-weighted
stitch) share three structural pieces that must stay in lockstep — the
per-task jit-predictor cache, the depth-1 dispatch/finalize software
pipeline over volumes, and the model-forward + postprocess activation
split.  They live here once so a postprocess or pipelining change cannot
silently apply to one stitcher and not the other.
"""

from __future__ import annotations

import weakref
from typing import Callable, Dict, Hashable, Iterable, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


def per_task_cache(cache: Dict[int, Dict], task, key: Hashable,
                   build: Callable[[], object]):
    """Get-or-build a per-task cached object (e.g. a jit'd predictor).

    Building a new jit closure per call would recompile (~25 s over the
    remote-compile path), so predictors are cached per task and evicted
    when the task is garbage-collected (weakref.finalize; tasks are
    unhashable dataclasses, so the outer key is ``id(task)``) — long-lived
    processes cycling tasks/checkpoints don't pin dead jit executables.
    ``key`` is the static config that shapes the trace.
    """
    tid = id(task)
    if tid not in cache:
        cache[tid] = {}
        weakref.finalize(task, cache.pop, tid, None)
    per_task = cache[tid]
    if key not in per_task:
        per_task[key] = build()
    return per_task[key]


def run_pipelined(items: Iterable[Tuple], dispatch: Callable,
                  finalize: Callable, depth: int = 1) -> None:
    """Software pipeline: keep up to ``depth`` dispatched items in flight.

    JAX dispatch is async, so queuing the next volume's upload + jit call
    before pulling the previous result overlaps the (slow) host-link
    transfers with device compute.  Depth 1 (the default) is enough on one
    chip: one volume in flight while one downloads.  Data-parallel
    multi-device inference passes ``depth = n_devices`` so every chip holds
    one volume in flight.
    """
    from collections import deque

    pending = deque()
    for item in items:
        pending.append(dispatch(*item))
        if len(pending) > max(int(depth), 1):
            finalize(*pending.popleft())
    while pending:
        finalize(*pending.popleft())


class RoundRobinPlacement(NamedTuple):
    """Per-device replicated variables for round-robin volume dispatch.

    Build ONCE with ``round_robin_placement`` and reuse across pipeline
    calls (e.g. the predict CLI's per-chunk loop) — re-placing the full
    parameter pytree per call re-uploads ~140 MB x n_devices of weights
    that are already resident.
    """

    devices: List
    vars_per_dev: List


def round_robin_placement(variables, devices):
    """Pre-place ``variables`` on every device for round-robin dispatch.

    ``devices`` may be a device list or an existing ``RoundRobinPlacement``
    (passed through untouched — the weights are already resident).  Returns
    ``(devs, vars_per_dev, depth)``: ``devs`` is None when no multi-device
    placement is requested (single-device fast path), else the device list
    with one replicated copy of the variables per device.  Volumes are then
    dealt round-robin — volume ``i`` runs on ``devs[i % len(devs)]`` — the
    data-parallel inference layout (reference parallelism surface: the PL
    ``gpus=N`` flag, `/root/reference/examples/train_seg.py:126`).

    Multi-process note: pass ADDRESSABLE devices (``jax.local_devices()``)
    — a single-controller process cannot commit arrays to another host's
    devices.

    Compile note: jit caches key on input placement, so the same predictor
    compiles once PER DEVICE at a given volume shape (n small compiles on
    a real host; on the axon remote-compile tunnel this serializes the
    first pass — see docs/PERFORMANCE.md).
    """
    if isinstance(devices, RoundRobinPlacement):
        return devices.devices, devices.vars_per_dev, len(devices.devices)
    devs = list(devices) if devices is not None else None
    if not devs:
        return None, None, 1
    vars_per_dev = [jax.device_put(variables, d) for d in devs]
    return devs, vars_per_dev, len(devs)


def normalize_tta(tta) -> Tuple[int, ...]:
    """Canonicalize a config ``tta`` value to a tuple of spatial axes.

    ``False``/``None``/``()`` -> no TTA; ``True`` -> all three spatial axes;
    a list of ints -> those axes (0=X, 1=Y, 2=Z in patch-size order).
    """
    if tta is True:
        return (0, 1, 2)
    if tta is False or tta is None:
        return ()
    if isinstance(tta, str):
        raise ValueError(
            f"tta must be true/false or a list of spatial axes, got {tta!r}"
        )
    # a bare int axis (note: 0 is a valid axis, so this must precede any
    # falsiness check)
    if isinstance(tta, (int, float)):
        tta = [int(tta)]
    if not tta:
        return ()
    axes = tuple(sorted({int(a) for a in tta}))
    if any(a < 0 or a > 2 for a in axes):
        raise ValueError(f"tta axes must be spatial (0..2), got {tta!r}")
    return axes


def tta_split_activations(task, variables, patches, flips: Tuple[int, ...] = ()):
    """Mirror test-time augmentation: mean activations over 2^k flips.

    For every subset of the ``flips`` spatial axes, the patch batch is
    mirrored, run through ``split_activations`` and mirrored back; the mean
    is returned.  Class channels average in PROBABILITY space (the softmax
    sits inside ``split_activations``) and heatmap channels in raw
    regression space — the standard mirror-TTA ensembling for medical
    segmentation.  ``flips=()`` is exactly ``split_activations`` (no extra
    compute).  Axes are spatial indices 0..2 over (N, X, Y, Z, C) patches.
    """
    flips = tuple(flips)
    if not flips:
        return split_activations(task, variables, patches)
    from itertools import chain, combinations

    subsets = list(chain.from_iterable(
        combinations(flips, r) for r in range(len(flips) + 1)
    ))
    acc = None
    for subset in subsets:
        dims = tuple(a + 1 for a in subset)  # batch axis leads
        x = jnp.flip(patches, dims) if dims else patches
        act = split_activations(task, variables, x)
        act = jnp.flip(act, dims) if dims else act
        acc = act if acc is None else acc + act
    return acc / len(subsets)


def postprocess_activations(task, act):
    """uint8 predict postprocess from (already softmaxed) activations.

    The activation-space twin of ``task.predict_postprocess`` (which takes
    raw logits): argmax over class PROBABILITIES — identical to argmax over
    logits when no averaging happened — and the reference's heatmap clip to
    [0, 255] uint8 (predict.py:88-94).  Used by the TTA path, where
    averaging must happen before the argmax.
    """
    num_heatmaps = getattr(task, "num_heatmaps", 0)
    if num_heatmaps:
        hm = jnp.clip(act[..., :num_heatmaps], 0.0, 255.0).astype(jnp.uint8)
        cls = jnp.argmax(act[..., num_heatmaps:], axis=-1)
        return jnp.concatenate([hm, cls[..., None].astype(jnp.uint8)], axis=-1)
    return jnp.argmax(act, axis=-1)[..., None].astype(jnp.uint8)


def split_activations(task, variables, patches):
    """Model forward + the reference's predict postprocess split.

    Heatmap channels pass through raw; class channels are softmaxed
    (reference `landmarks.py:88-94`: heatmaps taken raw from the output,
    class channels through `F.softmax`).  No stitch weighting — callers
    weight/crop the result themselves.
    """
    model = task.model
    num_heatmaps = getattr(task, "num_heatmaps", 0)
    logits = model.apply(variables, patches.astype(model.config.dtype),
                         train=False)
    if num_heatmaps:
        hm = logits[..., :num_heatmaps]
        probs = jax.nn.softmax(logits[..., num_heatmaps:], axis=-1)
        return jnp.concatenate([hm, probs], axis=-1)
    return jax.nn.softmax(logits, axis=-1)
