"""Matched-accuracy evidence: torch reference vs tpu-mednet, same data.

The north-star is speedup *at matched Dice / landmark error*
(BASELINE.json).  This harness trains the architecture-identical torch
model (the reference's ResidualUNet3D semantics,
`/root/reference/midasmednet/unet/model.py:113-213`) and tpu-mednet on the
SAME synthetic dataset and the SAME pre-drawn patch sequence, then
evaluates both with the SAME numpy metrics:

- seg:  per-channel Dice of the argmax mask over whole val volumes
        (reference metric: `segmentation.py:104-109`);
- ldmk: mean Euclidean landmark error (voxels) from predicted-heatmap
        argmax peaks (+ class-channel Dice)
        (reference metrics: `landmarks.py:154-162`).

Run:  python benchmarks/matched_accuracy.py [--task seg|ldmk|both]
Writes benchmarks/matched_accuracy.json; results are recorded in
BASELINE.md's "matched accuracy" table.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

# defaults = the 'tiny' config; --patch/--fmaps/--size scale it up
PATCH = 32
N_CLASSES = 3  # bg, sphere, box
N_HEATMAPS = 2
SIGMA = 3.0
FMAPS = 8
LEVELS = 3
BATCH = 2
LR = 1e-3
SIZE = 48
HARD = False  # --hard: the non-saturating benchmark (see make_subject_hard)


# --------------------------------------------------------------------------
# shared synthetic dataset + patch schedule (numpy, fully seeded)
# --------------------------------------------------------------------------

def make_subject(rng, size=None):
    """One SIZE^3 subject: sphere (class 1) + box (class 2) on noise, with
    a landmark at each structure's center."""
    size = size or SIZE
    img = rng.normal(0.0, 0.1, size=(size, size, size)).astype(np.float32)
    lbl = np.zeros((size, size, size), dtype=np.uint8)

    c1 = rng.integers(12, size - 12, size=3)
    r = int(rng.integers(6, 10))
    zz, yy, xx = np.ogrid[:size, :size, :size]
    sphere = ((zz - c1[0]) ** 2 + (yy - c1[1]) ** 2 + (xx - c1[2]) ** 2) <= r * r
    lbl[sphere] = 1
    img[sphere] += 1.5

    c2 = rng.integers(10, size - 10, size=3)
    h = int(rng.integers(4, 7))
    box = (slice(c2[0] - h, c2[0] + h), slice(c2[1] - h, c2[1] + h),
           slice(c2[2] - h, c2[2] + h))
    lbl[box] = 2
    img[box] -= 1.5

    landmarks = np.stack([c1, c2]).astype(np.float32)  # (2, 3)
    heatmaps = np.zeros((N_HEATMAPS, size, size, size), dtype=np.uint8)
    grid = np.stack(np.meshgrid(*[np.arange(size)] * 3, indexing="ij"))
    for i, c in enumerate(landmarks):
        d2 = ((grid - c[:, None, None, None]) ** 2).sum(axis=0)
        heatmaps[i] = np.round(255.0 * np.exp(-d2 / (2 * SIGMA**2))).astype(np.uint8)
    return img[None], lbl[None], heatmaps, landmarks


def make_subject_hard(rng, size=None):
    """One hard subject: 5 overlapping, low-contrast, heavily imbalanced
    foreground structures on strong noise (VERDICT r4 item 1 — the easy
    task saturates at Dice ~1.0, so its metric cannot detect a real
    sub-percent quality regression).  Contrasts sit at or below the noise
    sigma, structures share borders (shell around sphere, box cutting the
    sphere), and class 4 is ~100 voxels in a 64^3 volume, so converged
    models land mid-range on per-channel Dice with headroom both ways.

    Landmarks/heatmaps mark the class-1 and class-4 centers so the ldmk
    task stays runnable in hard mode too."""
    size = size or SIZE
    img = rng.normal(0.0, 0.3, size=(size, size, size)).astype(np.float32)
    lbl = np.zeros((size, size, size), dtype=np.uint8)
    zz, yy, xx = np.ogrid[:size, :size, :size]

    # class 1: large low-contrast sphere
    c1 = rng.integers(18, size - 18, size=3)
    r1 = int(rng.integers(9, 13))
    d1 = (zz - c1[0]) ** 2 + (yy - c1[1]) ** 2 + (xx - c1[2]) ** 2
    s1 = d1 <= r1 * r1
    lbl[s1] = 1
    img[s1] += 0.35

    # class 3 first carved as the thin shell around that sphere — a 2-voxel
    # boundary class the model must separate from both sides
    shell = (d1 > r1 * r1) & (d1 <= (r1 + 2) ** 2)
    lbl[shell] = 3
    img[shell] += 0.20

    # class 2: box overlapping the sphere (cuts into classes 1 and 3)
    c2 = np.clip(c1 + rng.integers(-8, 9, size=3), 8, size - 8)
    h2 = int(rng.integers(5, 8))
    box = tuple(slice(max(int(c) - h2, 0), int(c) + h2) for c in c2)
    lbl[box] = 2
    img[box] -= 0.25

    # class 4: tiny rare sphere (heavy imbalance)
    c4 = rng.integers(6, size - 6, size=3)
    r4 = 2 + int(rng.integers(0, 2))
    s4 = ((zz - c4[0]) ** 2 + (yy - c4[1]) ** 2 + (xx - c4[2]) ** 2) <= r4 * r4
    lbl[s4] = 4
    img[s4] += 0.40

    # class 5: very low contrast ellipsoid, background-only (no overwrite)
    c5 = rng.integers(12, size - 12, size=3)
    ell = ((zz - c5[0]) ** 2 / 64.0 + (yy - c5[1]) ** 2 / 25.0
           + (xx - c5[2]) ** 2 / 16.0) <= 1.0
    ell = ell & (lbl == 0)
    lbl[ell] = 5
    img[ell] += 0.15

    landmarks = np.stack([c1, c4]).astype(np.float32)
    heatmaps = np.zeros((N_HEATMAPS, size, size, size), dtype=np.uint8)
    grid = np.stack(np.meshgrid(*[np.arange(size)] * 3, indexing="ij"))
    for i, c in enumerate(landmarks):
        d2 = ((grid - c[:, None, None, None]) ** 2).sum(axis=0)
        heatmaps[i] = np.round(
            255.0 * np.exp(-d2 / (2 * SIGMA**2))).astype(np.uint8)
    return img[None], lbl[None], heatmaps, landmarks


def make_dataset(n_train=4, n_val=2, seed=0):
    rng = np.random.default_rng(seed)
    gen = make_subject_hard if HARD else make_subject
    return ([gen(rng) for _ in range(n_train)],
            [gen(rng) for _ in range(n_val)])


def draw_patch_schedule(train, steps, seed=1):
    """Pre-draw the (subject, corner) of every training patch so both
    frameworks consume the IDENTICAL patch sequence."""
    rng = np.random.default_rng(seed)
    sched = []
    size = train[0][0].shape[1]
    for _ in range(steps * BATCH):
        s = int(rng.integers(len(train)))
        if rng.random() < 0.7:  # class-balanced: contain a labeled voxel
            cls = int(rng.integers(1, N_CLASSES))
            pos = np.argwhere(train[s][1][0] == cls)
            if len(pos):
                p = pos[rng.integers(len(pos))]
                lo = np.maximum(p - PATCH + 1, 0)
                hi = np.minimum(p, size - PATCH)
                corner = np.array([int(rng.integers(l, h + 1))
                                   for l, h in zip(lo, np.maximum(hi, lo))])
            else:  # class absent from this subject (possible in hard mode)
                corner = rng.integers(0, size - PATCH + 1, size=3)
        else:
            corner = rng.integers(0, size - PATCH + 1, size=3)
        sched.append((s, corner))
    return sched


def crop(vol, corner):
    x, y, z = corner
    return vol[:, x:x + PATCH, y:y + PATCH, z:z + PATCH]


def batches(train, sched, task):
    """Yield (data (B,1,P,P,P) f32, label (B,L,P,P,P)) in storage layout;
    label = [heatmaps...,] classmap with classmap LAST (dataset.py:322-330)."""
    for i in range(0, len(sched), BATCH):
        datas, labels = [], []
        for s, corner in sched[i:i + BATCH]:
            img, lbl, hm, _ = train[s]
            datas.append(crop(img, corner))
            parts = ([crop(hm, corner)] if task == "ldmk" else []) + [crop(lbl, corner)]
            labels.append(np.concatenate(parts, axis=0))
        yield np.stack(datas), np.stack(labels)


# --------------------------------------------------------------------------
# shared numpy metrics
# --------------------------------------------------------------------------

def dice_per_channel(pred_mask, true_mask, n_classes=None):
    # read the global at CALL time: --hard rebinds N_CLASSES after import
    n_classes = N_CLASSES if n_classes is None else n_classes
    out = []
    for c in range(n_classes):
        p, g = pred_mask == c, true_mask == c
        denom = p.sum() + g.sum()
        out.append(2.0 * np.logical_and(p, g).sum() / max(denom, 1e-5))
    return out


def landmark_error(pred_heatmaps, true_coords):
    errs = []
    for i, c in enumerate(true_coords):
        peak = np.unravel_index(np.argmax(pred_heatmaps[i]), pred_heatmaps[i].shape)
        errs.append(float(np.linalg.norm(np.asarray(peak) - c)))
    return errs


# --------------------------------------------------------------------------
# torch side (architecture-identical to the reference model)
# --------------------------------------------------------------------------

def run_torch(task, train, val, sched, steps, seed=0):
    import torch
    import torch.nn.functional as F
    from torch_baseline import TorchResidualUNet3D, dice_loss

    torch.manual_seed(seed)
    out_ch = N_CLASSES + (N_HEATMAPS if task == "ldmk" else 0)
    model = TorchResidualUNet3D(in_ch=1, out_ch=out_ch, f=FMAPS, levels=LEVELS)
    n_params = sum(p.numel() for p in model.parameters())
    opt = torch.optim.Adam(model.parameters(), lr=LR)

    t0 = time.perf_counter()
    for data, label in batches(train, sched, task):
        x = torch.from_numpy(data)
        opt.zero_grad()
        logits = model(x)
        if task == "ldmk":
            hm = torch.from_numpy(label[:, :N_HEATMAPS].astype(np.float32))
            cls = torch.from_numpy(label[:, -1].astype(np.int64))
            loss = (F.mse_loss(logits[:, :N_HEATMAPS], hm)
                    + dice_loss(logits[:, N_HEATMAPS:], cls))
        else:
            cls = torch.from_numpy(label[:, -1].astype(np.int64))
            loss = dice_loss(logits, cls)
        loss.backward()
        opt.step()
    train_s = time.perf_counter() - t0

    dices, lerrs = [], []
    with torch.no_grad():
        for img, lbl, hm, lm in val:
            logits = model(torch.from_numpy(img[None])).numpy()[0]
            mask = np.argmax(logits[-N_CLASSES:], axis=0)
            dices.append(dice_per_channel(mask, lbl[0]))
            if task == "ldmk":
                lerrs += landmark_error(logits[:N_HEATMAPS], lm)
    return summarize("torch-cpu", task, steps, train_s, dices, lerrs,
                     n_params=n_params)


# --------------------------------------------------------------------------
# tpu-mednet side (shipping config: params fp32, compute bf16)
# --------------------------------------------------------------------------

def run_jax(task, train, val, sched, steps, dtype="bfloat16", seed=0):
    import jax
    import jax.numpy as jnp
    from tpu_mednet.models import ResidualUNet3D
    from tpu_mednet.tasks import LandmarkTask, SegmentationTask
    from tpu_mednet.train import create_train_state, make_train_step

    out_ch = N_CLASSES + (N_HEATMAPS if task == "ldmk" else 0)
    model = ResidualUNet3D(in_channels=1, out_channels=out_ch,
                           f_maps=FMAPS, num_levels=LEVELS,
                           dtype=jnp.dtype(dtype))
    if task == "ldmk":
        # weights 1/H make sum_c w_c*mse_c == the overall F.mse_loss mean the
        # torch side uses — the two losses are then exactly equal
        t = LandmarkTask(model=model,
                         loss_regression_weight=[1.0 / N_HEATMAPS] * N_HEATMAPS)
    else:
        t = SegmentationTask(model=model, loss="DICE")
    step = make_train_step(t)
    state = create_train_state(model, (BATCH, PATCH, PATCH, PATCH, 1), LR,
                               seed=seed)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))

    t0 = time.perf_counter()
    for data, label in batches(train, sched, task):
        batch = {"data": jnp.asarray(np.moveaxis(data, 1, -1)),
                 "label": jnp.asarray(np.moveaxis(label, 1, -1))}
        state, metrics = step(state, batch)
    _ = float(metrics["train_loss"])  # sync
    train_s = time.perf_counter() - t0

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    dices, lerrs = [], []
    for img, lbl, hm, lm in val:
        x = jnp.asarray(np.moveaxis(img, 0, -1)[None])
        logits = np.moveaxis(np.asarray(fwd(state.params, x), np.float32)[0], -1, 0)
        mask = np.argmax(logits[-N_CLASSES:], axis=0)
        dices.append(dice_per_channel(mask, lbl[0]))
        if task == "ldmk":
            lerrs += landmark_error(logits[:N_HEATMAPS], lm)
    backend = jax.default_backend()
    return summarize(f"tpu-mednet-{backend}-{dtype}", task, steps, train_s,
                     dices, lerrs, n_params=n_params)


def summarize(framework, task, steps, train_s, dices, lerrs, n_params=None):
    d = np.mean(np.asarray(dices), axis=0)
    res = {
        "framework": framework,
        "task": task,
        "steps": steps,
        "n_params": n_params,
        "train_seconds": round(train_s, 2),
        "patches_per_sec": round(steps * BATCH / train_s, 3),
        "val_dice_per_channel": [round(float(v), 4) for v in d],
        "val_dice_mean_fg": round(float(np.mean(d[1:])), 4),
    }
    if lerrs:
        res["landmark_error_voxels"] = round(float(np.mean(lerrs)), 3)
    print(json.dumps(res))
    return res


def main():
    global PATCH, FMAPS, SIZE, LEVELS, N_CLASSES, HARD
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["seg", "ldmk", "both"], default="both")
    ap.add_argument("--hard", action="store_true",
                    help="non-saturating benchmark: 6 classes, overlapping "
                         "low-contrast structures, heavy imbalance, strong "
                         "noise (VERDICT r4 item 1)")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--skip", choices=["torch", "jax", "none"], default="none")
    ap.add_argument("--dtype", default="bfloat16",
                    help="tpu-mednet compute dtype (bfloat16 | float32)")
    ap.add_argument("--patch", type=int, default=PATCH)
    ap.add_argument("--fmaps", type=int, default=FMAPS)
    ap.add_argument("--levels", type=int, default=LEVELS)
    ap.add_argument("--size", type=int, default=SIZE,
                    help="synthetic subject volume extent")
    ap.add_argument("--seed", type=int, default=0,
                    help="training-run seed (model init + patch schedule); "
                         "the dataset stays fixed, so seeds measure RUN "
                         "noise on the same task (multi-seed accuracy "
                         "study, BASELINE.md)")
    args = ap.parse_args()
    if args.patch > args.size:
        ap.error(f"--patch {args.patch} must be <= --size {args.size}")
    if args.patch % 2 ** (args.levels - 1):
        # divisibility, not magnitude: the encoder pools (levels-1) times
        # and the decoder must round-trip the exact extents
        ap.error(f"--patch {args.patch} not divisible by "
                 f"2^{args.levels - 1} (--levels {args.levels})")
    defaults = (ap.get_default("patch"), ap.get_default("fmaps"),
                ap.get_default("size"), ap.get_default("levels"))
    non_default = (args.patch, args.fmaps, args.size, args.levels) != defaults
    PATCH, FMAPS, SIZE, LEVELS = args.patch, args.fmaps, args.size, args.levels
    if args.hard:
        HARD, N_CLASSES = True, 6

    tasks = ["seg", "ldmk"] if args.task == "both" else [args.task]
    out_path = Path(__file__).parent / "matched_accuracy.json"
    results = json.loads(out_path.read_text()) if out_path.exists() else {}
    for task in tasks:
        train, val = make_dataset()
        # --seed varies the run (init + schedule), never the dataset
        sched = draw_patch_schedule(train, args.steps, seed=1 + args.seed)
        key_name = (f"{task}_p{PATCH}f{FMAPS}s{SIZE}l{LEVELS}" if non_default
                    else task)
        if args.hard:
            key_name = "hard_" + key_name
        if args.seed:
            key_name += f"_seed{args.seed}"
        entry = results.setdefault(key_name, {})
        entry["config"] = {
            "patch": PATCH, "batch": BATCH, "steps": args.steps,
            "fmaps": FMAPS, "levels": LEVELS, "lr": LR, "size": SIZE,
            "n_classes": N_CLASSES, "n_heatmaps": N_HEATMAPS,
            "seed": args.seed, "hard": HARD,
        }
        if args.skip != "torch":
            entry["torch"] = run_torch(task, train, val, sched, args.steps,
                                       seed=args.seed)
        if args.skip != "jax":
            key = "tpu_mednet" if args.dtype == "bfloat16" \
                else f"tpu_mednet_{args.dtype}"
            entry[key] = run_jax(task, train, val, sched, args.steps,
                                 dtype=args.dtype, seed=args.seed)
        out_path.write_text(json.dumps(results, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    main()
