"""PyTorch reference-equivalent baseline measurement.

The reference publishes no numbers (BASELINE.md), so the baseline is
*measured here*: an architecture-equivalent torch ResidualUNet3D (5 levels,
f_maps=32, ExtResNet blocks with conv+groupnorm+ELU, transposed-conv +
summation decoder — the model both reference tasks train,
`/root/reference/midasmednet/unet/model.py:113-213`) driven through an
Adam+DiceLoss training step exactly like the reference tasks do.

Run:  python benchmarks/torch_baseline.py [--batch 2 --patch 96 --iters 5]
Writes benchmarks/baseline.json consumed by bench.py's ``vs_baseline``.

Only CPU torch is available in this image; the recorded baseline is
patches/sec on this host's CPU (the reference's own device story — it runs
wherever torch runs).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvGNElu(nn.Module):
    """conv3d + groupnorm + ELU ('cge' order)."""

    def __init__(self, cin, cout, num_groups=8, act=True):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, 3, padding=1, bias=False)
        g = num_groups if cout >= num_groups else 1
        self.norm = nn.GroupNorm(g, cout)
        self.act = act

    def forward(self, x):
        x = self.norm(self.conv(x))
        return F.elu(x) if self.act else x


class ResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = ConvGNElu(cin, cout)
        self.c2 = ConvGNElu(cout, cout)
        self.c3 = ConvGNElu(cout, cout, act=False)

    def forward(self, x):
        r = self.c1(x)
        out = self.c3(self.c2(r))
        return F.elu(out + r)


class TorchResidualUNet3D(nn.Module):
    def __init__(self, in_ch=1, out_ch=2, f=32, levels=5):
        super().__init__()
        fmaps = [f * 2**k for k in range(levels)]
        self.encoders = nn.ModuleList()
        prev = in_ch
        for i, c in enumerate(fmaps):
            self.encoders.append(ResBlock(prev, c))
            prev = c
        self.ups = nn.ModuleList()
        self.decoders = nn.ModuleList()
        rev = fmaps[::-1]
        for i in range(levels - 1):
            self.ups.append(
                nn.ConvTranspose3d(rev[i], rev[i + 1], 3, stride=2,
                                   padding=1, output_padding=1)
            )
            self.decoders.append(ResBlock(rev[i + 1], rev[i + 1]))
        self.head = nn.Conv3d(fmaps[0], out_ch, 1)

    def forward(self, x):
        feats = []
        for i, enc in enumerate(self.encoders):
            if i > 0:
                x = F.max_pool3d(x, 2)
            x = enc(x)
            feats.append(x)
        skips = feats[:-1][::-1]
        for up, dec, skip in zip(self.ups, self.decoders, skips):
            x = dec(up(x) + skip)
        return self.head(x)


def dice_loss(logits, labels):
    probs = torch.softmax(logits, dim=1)
    onehot = F.one_hot(labels, logits.shape[1]).permute(0, 4, 1, 2, 3).float()
    dims = (0, 2, 3, 4)
    inter = (probs * onehot).sum(dims)
    denom = (probs + onehot).sum(dims).clamp(min=1e-5)
    return (1 - 2 * inter / denom).mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    model = TorchResidualUNet3D()
    n_params = sum(p.numel() for p in model.parameters())
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(args.batch, 1, args.patch, args.patch, args.patch)
    y = torch.randint(0, 2, (args.batch, args.patch, args.patch, args.patch))

    def step():
        opt.zero_grad()
        loss = dice_loss(model(x), y)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = (time.perf_counter() - t0) / args.iters
    pps = args.batch / dt
    result = {
        "model": "ResidualUNet3D f32x5",
        "params": n_params,
        "device": "cpu",
        "torch_version": torch.__version__,
        "threads": torch.get_num_threads(),
        "batch": args.batch,
        "patch": args.patch,
        "sec_per_step": dt,
        "train_patches_per_sec": pps,
    }
    print(json.dumps(result, indent=2))
    out = Path(__file__).parent / "baseline.json"
    out.write_text(json.dumps(result, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
