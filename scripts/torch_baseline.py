#!/usr/bin/env python
"""Measured PyTorch NeMAR training-step baseline (VERDICT r1 item 5).

Round 1's vs_baseline divided by an ESTIMATED 30 pairs/s "A100 torch
reference". This script replaces the estimate with a measurement chain:

  1. measure a faithful torch NeMAR step (ResNet-6 G ngf64 + UNet STN +
     70x70 PatchGAN, LSGAN + L1 + smoothness, alternating D then G+R Adam,
     256x256, the exact bench.py workload) in pairs/s on THIS host's CPU;
  2. measure this host's sustained torch fp32 GEMM TFLOP/s;
  3. extrapolate: A100_pairs = cpu_pairs * (A100_sustained / cpu_sustained),
     with A100_sustained taken as 40 TFLOP/s — a deliberately GENEROUS
     figure for mixed conv/pointwise GAN training (TF32 peak is 156
     TFLOP/s dense; research-grade torch training of conv GANs typically
     sustains 15-30% of peak; we grant ~25%).

The networks below are written from the SURVEY.md architecture spec
(c7s1-64, d128, d256, R256 x6, u128, u64, c7s1-3; PatchGAN strides
2,2,2,1,1; UNet STN depth 5) — the same spec nemar_tpu implements — so the
torch and JAX steps do identical work per pair.

Output: one JSON line with cpu pairs/s, cpu TFLOP/s, derived A100 pairs/s.
"""

import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def log(m):
    print(m, file=sys.stderr, flush=True)


A100_SUSTAINED_TFLOPS = 40.0  # generous: ~25% of TF32 peak for conv GANs


# --- networks (SURVEY spec, minimal faithful torch) ------------------------


class ResnetBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
            nn.InstanceNorm2d(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
            nn.InstanceNorm2d(dim),
        )

    def forward(self, x):
        return x + self.block(x)


def resnet_g(in_nc=1, out_nc=3, ngf=64, n_blocks=6):
    layers = [
        nn.ReflectionPad2d(3), nn.Conv2d(in_nc, ngf, 7),
        nn.InstanceNorm2d(ngf), nn.ReLU(True),
        nn.Conv2d(ngf, ngf * 2, 3, 2, 1), nn.InstanceNorm2d(ngf * 2), nn.ReLU(True),
        nn.Conv2d(ngf * 2, ngf * 4, 3, 2, 1), nn.InstanceNorm2d(ngf * 4), nn.ReLU(True),
    ]
    layers += [ResnetBlock(ngf * 4) for _ in range(n_blocks)]
    layers += [
        nn.ConvTranspose2d(ngf * 4, ngf * 2, 3, 2, 1, output_padding=1),
        nn.InstanceNorm2d(ngf * 2), nn.ReLU(True),
        nn.ConvTranspose2d(ngf * 2, ngf, 3, 2, 1, output_padding=1),
        nn.InstanceNorm2d(ngf), nn.ReLU(True),
        nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_nc, 7), nn.Tanh(),
    ]
    return nn.Sequential(*layers)


def patchgan_d(in_nc=3, ndf=64):
    return nn.Sequential(
        nn.Conv2d(in_nc, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf, ndf * 2, 4, 2, 1), nn.InstanceNorm2d(ndf * 2), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1), nn.InstanceNorm2d(ndf * 4), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf * 4, ndf * 8, 4, 1, 1), nn.InstanceNorm2d(ndf * 8), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf * 8, 1, 4, 1, 1),
    )


class UnetSTN(nn.Module):
    """Depth-5 UNet -> 2ch flow, warps both orders from one field."""

    def __init__(self, in_nc=4, ngf=32, depth=5):
        super().__init__()
        self.downs = nn.ModuleList()
        ch = in_nc
        chans = []
        for i in range(depth):
            oc = min(ngf * (2 ** i), 256)
            self.downs.append(nn.Sequential(
                nn.Conv2d(ch, oc, 3, 2, 1), nn.InstanceNorm2d(oc), nn.LeakyReLU(0.2, True)
            ))
            chans.append(oc)
            ch = oc
        self.ups = nn.ModuleList()
        for i in reversed(range(depth)):
            ic = ch + (chans[i - 1] if i > 0 else 0)
            oc = max(ch // 2, ngf)
            self.ups.append(nn.Sequential(
                nn.Conv2d(ic, oc, 3, 1, 1), nn.InstanceNorm2d(oc), nn.LeakyReLU(0.2, True)
            ))
            ch = oc
        self.head = nn.Conv2d(ch, 2, 3, 1, 1)
        nn.init.zeros_(self.head.weight), nn.init.zeros_(self.head.bias)

    def forward(self, a, b):
        x = torch.cat([a, b], 1)
        skips = []
        for d in self.downs:
            x = d(x)
            skips.append(x)
        for i, u in enumerate(self.ups):
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
            s = skips[len(self.downs) - 2 - i] if i < len(self.ups) - 1 else None
            if s is not None:
                x = torch.cat([x, s], 1)
            x = u(x)
        return self.head(x)  # (N, 2, H, W) normalized flow


def warp(img, flow):
    n, _, h, w = flow.shape
    ys, xs = torch.meshgrid(
        torch.linspace(-1 + 1 / h, 1 - 1 / h, h),
        torch.linspace(-1 + 1 / w, 1 - 1 / w, w), indexing="ij")
    base = torch.stack([xs, ys], -1)[None]
    grid = base + flow.permute(0, 2, 3, 1)
    return F.grid_sample(img, grid, align_corners=False, padding_mode="border")


def measure_cpu_gemm_tflops():
    a = torch.randn(2048, 2048)
    b = torch.randn(2048, 2048)
    for _ in range(3):
        a @ b
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        a @ b
        best = min(best, time.time() - t0)
    return 2 * 2048**3 / best / 1e12


def main_stn():
    """Config-#2 denominator: UNet-STN fwd+bwd (b1 256², L1+smooth loss),
    eager torch CPU -> A100 extrapolation by the same sustained-GEMM chain
    as the step baseline (round-4 verdict item 5: BENCH config #2 carried
    a placeholder vs_baseline)."""
    torch.manual_seed(0)
    size = 256
    R = UnetSTN()
    a = torch.randn(1, 1, size, size)
    b = torch.randn(1, 3, size, size)

    def fwd_bwd():
        R.zero_grad()
        flow = R(a, b)
        wb = warp(b, flow)
        smooth = (flow[:, :, 1:].sub(flow[:, :, :-1]).abs().mean()
                  + flow[:, :, :, 1:].sub(flow[:, :, :, :-1]).abs().mean())
        loss = F.l1_loss(wb, b) + smooth
        loss.backward()
        return float(loss)

    log(f"torch {torch.__version__}, threads {torch.get_num_threads()}, stn-only")
    fwd_bwd()
    n = 5
    t0 = time.time()
    for _ in range(n):
        fwd_bwd()
    dt = (time.time() - t0) / n
    cpu_tflops = measure_cpu_gemm_tflops()
    a100_ms = dt * 1e3 * cpu_tflops / A100_SUSTAINED_TFLOPS
    print(json.dumps({
        "cpu_stn_fwd_bwd_ms": round(dt * 1e3, 1),
        "cpu_gemm_tflops": round(cpu_tflops, 3),
        "a100_sustained_tflops_assumed": A100_SUSTAINED_TFLOPS,
        "derived_a100_stn_fwd_bwd_ms": round(a100_ms, 3),
    }))


def main():
    torch.manual_seed(0)
    if len(sys.argv) > 1 and sys.argv[1] == "stn":
        return main_stn()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = 256
    G, D, R = resnet_g(), patchgan_d(), UnetSTN()
    opt_g = torch.optim.Adam(
        list(G.parameters()) + list(R.parameters()), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(D.parameters(), lr=2e-4, betas=(0.5, 0.999))
    a = torch.randn(batch, 1, size, size)
    b = torch.randn(batch, 3, size, size)

    def step():
        # D step on detached fake (reference alternating update)
        with torch.no_grad():
            fake = G(a)
            flow = R(a, b)
            reg_fake = warp(fake, flow)
        opt_d.zero_grad()
        ld = 0.5 * (F.mse_loss(D(b), torch.ones_like(D(b)))
                    + F.mse_loss(D(reg_fake), torch.zeros_like(D(reg_fake))))
        ld.backward()
        opt_d.step()
        # G+R step (both warp orders from one field)
        opt_g.zero_grad()
        fake = G(a)
        flow = R(a, b)
        reg_fake = warp(fake, flow)
        fake2 = G(warp(a, flow))
        pred = D(reg_fake)
        smooth = (flow[:, :, 1:].sub(flow[:, :, :-1]).abs().mean()
                  + flow[:, :, :, 1:].sub(flow[:, :, :, :-1]).abs().mean())
        lg = (F.mse_loss(pred, torch.ones_like(pred))
              + 100.0 * (F.l1_loss(reg_fake, b) + F.l1_loss(fake2, b))
              + 10.0 * smooth)
        lg.backward()
        opt_g.step()
        return float(lg)

    log(f"torch {torch.__version__}, threads {torch.get_num_threads()}, batch {batch}")
    step()  # warmup
    n_steps = 3
    t0 = time.time()
    for _ in range(n_steps):
        step()
    dt = (time.time() - t0) / n_steps
    cpu_pairs = batch / dt
    cpu_tflops = measure_cpu_gemm_tflops()
    a100_pairs = cpu_pairs * A100_SUSTAINED_TFLOPS / cpu_tflops
    out = {
        "cpu_pairs_per_sec": round(cpu_pairs, 3),
        "cpu_step_ms": round(dt * 1e3, 1),
        "cpu_gemm_tflops": round(cpu_tflops, 3),
        "a100_sustained_tflops_assumed": A100_SUSTAINED_TFLOPS,
        "derived_a100_pairs_per_sec": round(a100_pairs, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
