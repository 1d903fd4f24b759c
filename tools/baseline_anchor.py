"""Measure what this host CAN measure about the reference baseline.

The reference repo publishes no throughput numbers (BASELINE.md), and this
environment has no CUDA GPU, so the reference pipeline's REALIZED per-GPU
throughput cannot be measured here.  What can be measured / derived:

1. The reference 2D branch's arithmetic cost (GFLOPs/scan) — a property of
   the architecture, counted exactly from an independently hand-built torch
   mirror of the dual stride-1 ResNet-34 encoder pair (the dominant cost,
   reference ``2d_net/model.py:84-142`` / ``2d_net/backbones.py:13-65``)
   at the nuScenes problem size (400x225).
2. That branch's throughput in torch ON THIS HOST (CPU) — the only torch
   measurement this host allows; a hard floor for "the reference pipeline
   without its GPU".
3. A FLOPs-roofline CEILING for the reference per-GPU forward and training
   throughput at an optimistic achieved-TFLOP/s assumption for its
   documented hardware (2x CUDA GPU, fp16 DDP — BASELINE.md).  The ceiling
   ignores the 3D SCN branch (CPU rulebook building per layer per call),
   the decoder, data loading, and DDP sync, each of which only LOWERS the
   realized number, so it is a strict upper bound.

Writes BASELINE_ANCHOR.json next to bench.py; bench.py folds the result
into its JSON output so the recorded benchmark carries the anchor evidence
alongside the longstanding 20 scans/s estimate.

Usage: python tools/baseline_anchor.py [--iters 3] [--batch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import time

# Optimistic achieved fp16 tensor-core throughput for the reference's
# V100/A100-class GPU on ResNet-scale convolutions.  Peak V100 tensor is
# 125 TF/s; well-tuned ResNet training realizes ~30-50% of peak; 45 TF/s
# is the generous end (higher assumed TF/s => HIGHER reference ceiling =>
# more conservative accounting for our margin).
ASSUMED_ACHIEVED_TFLOPS = 45.0

H, W = 225, 400  # nuScenes problem size (BASELINE.md)


def build_encoder(torch):
    """Stride-1-stem ResNet-34 trunk, shape-for-shape with the reference
    backbone (conv1 7x7 stride 1, maxpool /2, layers [3, 4, 6, 3])."""
    nn = torch.nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.down = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                              nn.BatchNorm2d(cout))
                if (stride != 1 or cin != cout) else None
            )

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + (x if self.down is None else self.down(x)))

    def layer(cin, cout, n, stride):
        mods = [Block(cin, cout, stride)]
        mods += [Block(cout, cout, 1) for _ in range(n - 1)]
        return nn.Sequential(*mods)

    return nn.Sequential(
        nn.Conv2d(3, 64, 7, stride=1, padding=3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(),
        nn.MaxPool2d(3, stride=2, padding=1),
        layer(64, 64, 3, 1),
        layer(64, 128, 4, 2),
        layer(128, 256, 6, 2),
        layer(256, 512, 3, 2),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    # dual encoder: the reference 2D net runs one ResNet-34 over RGB and a
    # second over the depth image (2d_net/model.py:84-142)
    encoders = [build_encoder(torch).eval() for _ in range(2)]

    flops = [0]

    def hook(mod, inp, out):
        # accumulates TOTAL flops across the batch; divided by the batch
        # size once, below, to get per-scan cost
        k = mod.kernel_size[0] * mod.kernel_size[1]
        flops[0] += 2 * out.numel() * inp[0].shape[1] * k

    for enc in encoders:
        for m in enc.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.register_forward_hook(hook)

    x = torch.randn(args.batch, 3, H, W)
    with torch.no_grad():
        for enc in encoders:
            enc(x)  # warm + count
    f2d_gflops = flops[0] / args.batch / 1e9

    with torch.no_grad():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            for enc in encoders:
                enc(x)
        dt = time.perf_counter() - t0
    cpu_scans_per_sec = args.batch * args.iters / dt

    ceil_fwd = ASSUMED_ACHIEVED_TFLOPS * 1e3 / f2d_gflops  # scans/s/GPU
    ceil_train = ceil_fwd / 3.0  # fwd + ~2x-fwd backward per trained scan

    out = {
        "ref_2d_encoders_gflops_per_scan": round(f2d_gflops, 1),
        "torch_cpu_this_host_scans_per_sec": round(cpu_scans_per_sec, 3),
        "torch_cpu_threads": torch.get_num_threads(),
        "assumed_gpu_achieved_tflops": ASSUMED_ACHIEVED_TFLOPS,
        "ref_fwd_ceiling_scans_per_sec_per_gpu": round(ceil_fwd, 1),
        "ref_train_ceiling_scans_per_sec_per_gpu": round(ceil_train, 1),
        "estimate_scans_per_sec_per_gpu": 20.0,
        "note": (
            "ceilings are strict upper bounds (2D encoders only, FLOPs "
            "roofline at optimistic achieved TF/s; SCN 3D branch with "
            "per-layer CPU rulebooks, decoder, dataloading and DDP sync "
            "all push the realized number below); the 20 scans/s training "
            "estimate sits inside [cpu floor, train ceiling]"
        ),
    }
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "BASELINE_ANCHOR.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
