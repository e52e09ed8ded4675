"""Device-resident patch sampling: volumes live in HBM, host samples indices.

The reference's input hot loop crops patches on the CPU in DataLoader
workers (`/root/reference/midasmednet/dataset.py:285-346`), hiding its cost
behind worker processes.  This host has one core and JAX has no worker-fork
trick — so instead of making the CPU faster, remove it from the loop:

1. all subject volumes are padded to a common shape and stacked into
   device arrays once at startup (images bf16, labels+heatmaps uint8);
2. per batch, the host only draws subject indices and class-balanced
   corner positions (microseconds of integer work using the precomputed
   any-masks);
3. a jit'd gather (``lax.dynamic_slice`` over the stacked store) cuts the
   training patches out of HBM on device — zero per-step host->device
   volume traffic.

Bounds checking note: corners are sampled against each subject's TRUE
shape, so patches never read padding.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mednet.data.readers import DataReader, open_reader
from tpu_mednet.data.sampling import get_labeled_position, get_random_patch_indices

logger = logging.getLogger(__name__)


class DevicePatchSampler:
    """Drop-in alternative to ``PatchSampler`` with HBM-resident volumes.

    Same constructor surface where it matters (subject_keys,
    samples_per_subject, patch_size, groups, class_probabilities); emits
    device-resident channels-last batches.  ``device_resident = True``
    tells the Trainer to skip host->device prefetch.
    """

    device_resident = True

    def __init__(
        self,
        data_path,
        subject_keys: Sequence[str],
        samples_per_subject: int,
        patch_size: Sequence[int],
        image_group: str = "images",
        label_group: str = "labels",
        heatmap_group: Optional[str] = None,
        landmark_group: Optional[str] = None,
        heatmap_sigma: float = 4.0,
        reader_cls=None,
        reader: Optional[DataReader] = None,
        class_probabilities: Optional[Sequence[float]] = None,
        seed: int = 0,
        image_dtype=jnp.bfloat16,
        sharding=None,
    ):
        """``landmark_group`` names a group of per-subject (L, 3) landmark
        voxel coordinates; Gaussian heatmaps (sigma ``heatmap_sigma``, 0..255
        amplitude) are then SYNTHESIZED ON DEVICE inside the gather instead
        of being stored/streamed as volumes — the north-star replacement for
        the reference's precomputed ``heatmap_group`` datasets.  Mutually
        exclusive with ``heatmap_group``."""
        if heatmap_group and landmark_group:
            raise ValueError("pass either heatmap_group or landmark_group, not both")
        self.subject_keys = list(subject_keys)
        self.samples_per_subject = samples_per_subject
        self.patch_size = np.asarray(patch_size, dtype=np.int64)
        self.rng = np.random.default_rng(seed)

        self.class_probabilities = None
        if class_probabilities is not None:
            p = np.asarray(class_probabilities, dtype=np.float64)
            self.class_probabilities = p / p.sum()

        owns = reader is None
        r = reader if reader is not None else open_reader(data_path, reader_cls)
        images = list(r.read(self.subject_keys, image_group, dtype=np.float32))
        labels = list(r.read(self.subject_keys, label_group, dtype=np.uint8))
        heatmaps = None
        if heatmap_group:
            heatmaps = list(r.read(self.subject_keys, heatmap_group, dtype=np.uint8))
        landmarks = None
        if landmark_group:
            landmarks = list(r.read(self.subject_keys, landmark_group,
                                    dtype=np.float32))
        if owns:
            r.close()

        # per-subject extent agreement BEFORE the pad-and-stack: a smaller
        # label/heatmap volume would otherwise be zero-padded into silent
        # misalignment with the image (VERDICT r4 item 8)
        for i, key in enumerate(self.subject_keys):
            ext = images[i].shape[1:]
            if labels[i].shape[1:] != ext:
                raise ValueError(
                    f"subject {key!r}: label volume extent "
                    f"{labels[i].shape[1:]} ({label_group!r}) does not match "
                    f"image extent {ext} ({image_group!r})")
            if heatmaps is not None and heatmaps[i].shape[1:] != ext:
                raise ValueError(
                    f"subject {key!r}: heatmap volume extent "
                    f"{heatmaps[i].shape[1:]} ({heatmap_group!r}) does not "
                    f"match image extent {ext} ({image_group!r})")

        # heatmap channel count for CLI config-vs-store validation
        self.num_heatmap_channels = (
            int(heatmaps[0].shape[0]) if heatmaps is not None else
            int(landmarks[0].shape[0]) if landmarks is not None else None)

        # label layout: heatmap channels first, class map last (dataset.py:322-330)
        if heatmaps is not None:
            labels = [np.concatenate([h, l], axis=0) for h, l in zip(heatmaps, labels)]

        self.shapes = np.asarray([img.shape[1:] for img in images], dtype=np.int64)
        if np.any(self.shapes < self.patch_size):
            raise ValueError("a subject volume is smaller than the patch size")
        pad_shape = self.shapes.max(axis=0)

        def stack(vols, dtype):
            out = np.zeros((len(vols), vols[0].shape[0], *pad_shape), dtype=dtype)
            for i, v in enumerate(vols):
                s = v.shape
                out[i, :, : s[1], : s[2], : s[3]] = v
            # channels-last on device
            return np.moveaxis(out, 1, -1)

        img_np = stack(images, np.float32)
        lbl_np = stack(labels, np.uint8)
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
            else jax.device_put
        self.images = put(jnp.asarray(img_np, dtype=image_dtype))
        self.labels = put(jnp.asarray(lbl_np))
        hbm_gb = (self.images.size * self.images.dtype.itemsize
                  + self.labels.size) / 1e9
        logger.info(
            "device store: %d subjects padded to %s, ~%.2f GB HBM",
            len(images), pad_shape.tolist(), hbm_gb,
        )

        # host-side class-balanced sampling maps (dataset.py:272-280)
        self._class_maps: List[np.ndarray] = [lbl[-1] for lbl in labels]
        self._label_ax2_any: List[List[np.ndarray]] = []
        if self.class_probabilities is not None:
            ncls = len(self.class_probabilities)
            for cm in self._class_maps:
                # index 0 (background) is never position-sampled (cls > 0
                # guard below) — skip its full-volume scan
                self._label_ax2_any.append(
                    [None] + [np.any(cm == c, axis=2) for c in range(1, ncls)]
                )

        # landmark coords resident on device for on-the-fly heatmap synthesis
        self.landmarks_dev = None
        if landmarks is not None:
            lm = np.stack([np.asarray(l, dtype=np.float32) for l in landmarks])
            self.landmarks_dev = put(jnp.asarray(lm))  # (S, L, 3)
        self.heatmap_sigma = heatmap_sigma

        px, py, pz = (int(v) for v in self.patch_size)
        n_img_c = self.images.shape[-1]
        n_lbl_c = self.labels.shape[-1]

        def gather(images, labels, landmark_coords, subj, corners):
            from tpu_mednet.ops.heatmap import gaussian_heatmap

            def one(s, c):
                img = jax.lax.dynamic_slice(
                    images, (s, c[0], c[1], c[2], 0), (1, px, py, pz, n_img_c)
                )[0]
                lbl = jax.lax.dynamic_slice(
                    labels, (s, c[0], c[1], c[2], 0), (1, px, py, pz, n_lbl_c)
                )[0]
                if landmark_coords is not None:
                    # patch-local coordinates; landmarks outside the crop
                    # fall outside [0, patch) and render ~zero naturally,
                    # negatives are masked by gaussian_heatmap itself
                    local = landmark_coords[s] - c[None, :].astype(jnp.float32)
                    hm = gaussian_heatmap(
                        local, (px, py, pz), heatmap_sigma, amplitude=255.0
                    )
                    lbl = jnp.concatenate(
                        [hm.astype(jnp.uint8), lbl], axis=-1
                    )  # heatmaps first, class map LAST
                return img, lbl

            data, label = jax.vmap(one)(subj, corners)
            return {"data": data, "label": label}

        self._gather = jax.jit(gather, static_argnames=())
        self._oversample_warned = False

    def __len__(self) -> int:
        return len(self.subject_keys) * self.samples_per_subject

    def sample_indices(self, batch_size: int,
                       subj: Optional[np.ndarray] = None):
        """Host-side index sampling: (subject_idx, corner) per element.

        ``subj`` fixes the subject draw (epoch-permutation path); corners
        stay freshly random per call either way."""
        if subj is None:
            subj = self.rng.integers(0, len(self.subject_keys), size=batch_size)
        corners = np.zeros((batch_size, 3), dtype=np.int32)
        for i, s in enumerate(subj):
            pos = None
            if self.class_probabilities is not None:
                cls = int(self.rng.choice(
                    len(self.class_probabilities), p=self.class_probabilities
                ))
                if cls > 0:
                    pos = get_labeled_position(
                        self._class_maps[s], cls,
                        label_any=self._label_ax2_any[s][cls], rng=self.rng,
                    )
            ini, _ = get_random_patch_indices(
                self.patch_size, self.shapes[s], pos=pos, rng=self.rng
            )
            corners[i] = ini
        return jnp.asarray(subj.astype(np.int32)), jnp.asarray(corners)

    def batches(self, batch_size: int, shuffle: bool = True,
                drop_last: bool = True, channels_last: bool = True
                ) -> Iterator[Dict[str, jax.Array]]:
        """One epoch = a permutation of (subject, sample) pairs, exactly
        ``samples_per_subject`` draws per subject (reference epoch semantics,
        dataset.py:282-283).  ``shuffle=False`` keeps subject order;
        ``drop_last`` drops a trailing partial batch (a partial batch would
        also trigger a fresh XLA compile for the odd shape)."""
        del channels_last  # device batches are always channels-last
        items = np.repeat(
            np.arange(len(self.subject_keys), dtype=np.int64),
            self.samples_per_subject,
        )
        if shuffle:
            items = self.rng.permutation(items)
        n = len(items)
        stop = (n // batch_size) * batch_size if drop_last else n
        if stop == 0 and n > 0:
            # fewer items than one batch: pad by re-drawing (with
            # replacement) so the single yielded batch keeps the FULL
            # batch shape — a partial batch would recompile the jit'd
            # gather/step for the odd shape (minutes on the remote-compile
            # TPU) and silently change the effective batch size
            if not self._oversample_warned:
                logger.warning(
                    "epoch has %d items (< batch_size %d): padding the batch "
                    "by re-drawing %d samples with replacement — epoch "
                    "composition diverges from subjects x samples_per_subject",
                    n, batch_size, batch_size - n,
                )
                self._oversample_warned = True
            extra = self.rng.choice(items, size=batch_size - n, replace=True)
            items = np.concatenate([items, extra])
            stop = batch_size
        for start in range(0, stop, batch_size):
            subj = items[start:start + batch_size]
            subj_arr, corners = self.sample_indices(len(subj), subj=subj)
            yield self._gather(self.images, self.labels, self.landmarks_dev,
                               subj_arr, corners)
