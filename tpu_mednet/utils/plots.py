"""MIP visualization figures for observability.

Re-implementation of the reference's matplotlib renderers
(`/root/reference/midasmednet/utils/plots.py:21-127`) — slice grids of
input channels, max-intensity-projection prediction-vs-ground-truth label
overlays (tab10), and GT-vs-predicted heatmap MIPs (inferno over bone) —
without the torch/torchvision dependency: the image grid is assembled with
a small numpy ``make_grid``.

Arrays are channels-FIRST here ((C, X, Y, Z)) matching the host-side
storage layout the figures are rendered from.
"""

from __future__ import annotations

from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile a stack of 2D images (N, H, W) into one (H', W') grid image."""
    images = np.asarray(images, dtype=np.float32)
    n, h, w = images.shape
    ncol = min(nrow, n)
    nrows = int(np.ceil(n / ncol))
    grid = np.full(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding),
        pad_value, dtype=np.float32,
    )
    for i in range(n):
        r, c = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = c * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[i]
    return grid


def vis_logimages(inputs: np.ndarray, steps: int = 5):
    """Grid of every ``num_slices//steps``-th axis-1 slice per channel
    (reference plots.py:21-42)."""
    inputs = np.asarray(inputs, dtype=np.float32)
    channels = inputs.shape[0]
    num_slices = inputs.shape[2]
    stride = max(num_slices // steps, 1)
    tiles = np.concatenate(
        [
            np.stack([inputs[c, :, idx, :] for idx in range(0, num_slices, stride)])
            for c in range(channels)
        ]
    )
    grid = make_grid(tiles, nrow=steps)
    fig, ax = plt.subplots()
    ax.imshow(grid, cmap="gray")
    ax.axis("off")
    return fig, ax


def vis_loglabels(labels: np.ndarray, pred_class: np.ndarray, mip_axis: int = 1,
                  inputs: Optional[np.ndarray] = None, alpha: float = 0.3,
                  projection_type: str = "mean"):
    """MIP of predicted vs ground-truth masks, optionally alpha-overlaid on
    the projected input with the tab10 colormap (reference plots.py:45-89)."""
    if projection_type not in ("mean", "max"):
        raise ValueError("projection_type must be 'mean' or 'max'")
    masks = np.stack([
        np.max(np.asarray(pred_class), axis=mip_axis),
        np.max(np.asarray(labels), axis=mip_axis),
    ])
    grid_mask = make_grid(masks)
    fig, ax = plt.subplots()
    if inputs is not None:
        inputs = np.asarray(inputs, dtype=np.float32)
        mip = inputs.mean(axis=mip_axis) if projection_type == "mean" \
            else inputs.max(axis=mip_axis)
        grid_bg = make_grid(np.stack(2 * [mip]))
        ax.imshow(grid_bg, cmap="gray")
        ax.imshow(
            np.ma.array(grid_mask, mask=(grid_mask == 0)),
            cmap="tab10", vmin=-0.1, vmax=9.9, alpha=alpha,
        )
    else:
        ax.imshow(grid_mask, cmap="tab10", vmin=-0.1, vmax=9.9)
    ax.axis("off")
    return fig, ax


def vis_logheatmaps(inputs: np.ndarray, output_heatmaps: np.ndarray,
                    heatmaps: np.ndarray, mip_axis: int = 1, alpha: float = 0.6,
                    projection_type: str = "mean"):
    """GT (top row) vs predicted (bottom row) heatmap MIPs in inferno
    (vmax=255) over the bone-cmap projected input (reference plots.py:92-127)."""
    if projection_type not in ("mean", "max"):
        raise ValueError("projection_type must be 'mean' or 'max'")
    inputs = np.asarray(inputs, dtype=np.float32)
    heatmaps = np.asarray(heatmaps, dtype=np.float32)
    output_heatmaps = np.asarray(output_heatmaps, dtype=np.float32)
    num_heatmaps = heatmaps.shape[0]
    mip = inputs.mean(axis=mip_axis) if projection_type == "mean" \
        else inputs.max(axis=mip_axis)
    grid_bg = make_grid(np.stack(2 * num_heatmaps * [mip]), nrow=num_heatmaps)
    fg = np.concatenate([
        heatmaps.max(axis=mip_axis + 1),
        output_heatmaps.max(axis=mip_axis + 1),
    ])
    grid_fg = make_grid(fg, nrow=num_heatmaps)
    fig, ax = plt.subplots()
    ax.imshow(grid_bg, cmap="bone", vmin=0.0, vmax=1.0)
    ax.imshow(grid_fg, cmap="inferno", vmin=0.0, vmax=255.0, alpha=alpha)
    ax.axis("off")
    plt.tight_layout()
    return fig, ax


# -- Trainer hooks ---------------------------------------------------------


def make_seg_sample_visualizer(projection_type: str = "mean"):
    """val-batch hook logging images + label MIPs
    (reference segmentation.py:67-92 ``log_samples``)."""
    import jax
    import jax.numpy as jnp

    def visualize(trainer, batch, epoch: int, batch_id: int) -> None:
        if trainer.metrics is None:
            return
        data = np.asarray(jax.device_get(batch["data"]))  # (N, X, Y, Z, C)
        label = np.asarray(jax.device_get(batch["label"]))
        model = trainer.task.model
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats is not None:
            variables["batch_stats"] = trainer.state.batch_stats
        logits = jax.device_get(
            model.apply(variables, jnp.asarray(data, model.config.dtype), train=False)
        )
        pred = np.argmax(np.asarray(logits), axis=-1)
        inputs_cf = np.moveaxis(data[0], -1, 0)  # (C, X, Y, Z)
        step = int(trainer.state.step)
        fig, _ = vis_logimages(inputs_cf)
        fig.suptitle(f"epoch {epoch} batch {batch_id}")
        trainer.metrics.log_figure("images", fig, step)
        plt.close(fig)
        fig, _ = vis_loglabels(
            label[0, ..., -1], pred[0], inputs=inputs_cf[0],
            projection_type=projection_type,
        )
        fig.suptitle(f"epoch {epoch} batch {batch_id}")
        trainer.metrics.log_figure("labels", fig, step)
        plt.close(fig)

    return visualize


def make_landmark_sample_visualizer(num_heatmaps: int,
                                    projection_type: str = "mean"):
    """val-batch hook logging images + label MIPs + heatmap MIPs
    (reference landmarks.py:85-123 ``log_samples``)."""
    import jax
    import jax.numpy as jnp

    def visualize(trainer, batch, epoch: int, batch_id: int) -> None:
        if trainer.metrics is None:
            return
        data = np.asarray(jax.device_get(batch["data"]))
        label = np.asarray(jax.device_get(batch["label"]))
        model = trainer.task.model
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats is not None:
            variables["batch_stats"] = trainer.state.batch_stats
        logits = np.asarray(jax.device_get(
            model.apply(variables, jnp.asarray(data, model.config.dtype), train=False)
        ))
        out_hm = logits[..., :num_heatmaps]
        out_cls = logits[..., num_heatmaps:]
        pred = np.argmax(out_cls, axis=-1)
        inputs_cf = np.moveaxis(data[0], -1, 0)
        gt_hm_cf = np.moveaxis(label[0, ..., :-1], -1, 0).astype(np.float32)
        out_hm_cf = np.moveaxis(out_hm[0], -1, 0)
        step = int(trainer.state.step)
        fig, _ = vis_logimages(inputs_cf)
        fig.suptitle(f"epoch {epoch} batch {batch_id}")
        trainer.metrics.log_figure("images", fig, step)
        plt.close(fig)
        fig, _ = vis_loglabels(
            label[0, ..., -1], pred[0], inputs=inputs_cf[0],
            projection_type=projection_type,
        )
        fig.suptitle(f"epoch {epoch} batch {batch_id}")
        trainer.metrics.log_figure("labels", fig, step)
        plt.close(fig)
        fig, _ = vis_logheatmaps(
            inputs_cf[0], out_hm_cf, gt_hm_cf, projection_type=projection_type,
        )
        fig.suptitle(f"epoch {epoch} batch {batch_id}")
        trainer.metrics.log_figure("heatmaps", fig, step)
        plt.close(fig)

    return visualize
