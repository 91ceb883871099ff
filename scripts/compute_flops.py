#!/usr/bin/env python
"""Per-model FLOPs at 256x256 via XLA cost analysis.

TPU-native replacement for the reference's torch.profiler flow
(/root/reference/scripts/compute_flops.py): each architecture is jit-lowered
at (1, 256, 256, C) and XLA's compiled cost analysis reports flops — no
weights required (random init), no execution needed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp


def model_table():
    from tpuir.models.dncnn import DnCNN
    from tpuir.models.rednet import REDNet
    from tpuir.models.restormer import Restormer
    from tpuir.models.mair import MaIR
    from tpuir.models.mair_unet import MaIRUNet
    from tpuir.models.deblurgan import FPNInception, FPNMobileNet

    return [
        ("REDNet", REDNet(), 1),
        ("DnCNN (nonblind, gray)", DnCNN(1, 1, 64, 17), 1),
        ("DnCNN (blind, color)", DnCNN(3, 3, 64, 20), 3),
        ("Restormer", Restormer(), 3),
        ("Restormer (Dual-pixel)", Restormer(inp_channels=6, dual_pixel_task=True), 6),
        ("DeblurGANv2 (Inception)", FPNInception(), 3),
        ("DeblurGANv2 (MobileNet)", FPNMobileNet(), 3),
        ("MaIR (CDN)", MaIR(), 3),
        ("MaIR (UNet)", MaIRUNet(), 3),
    ]


def compute_flops(model, in_ch: int, size: int = 256):
    x = jnp.zeros((1, size, size, in_ch), jnp.float32)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    # abstract init (no math): materialize zeros matching the shapes
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    lowered = jax.jit(model.apply).lower(params, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-device list
        cost = cost[0]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    return cost.get("flops", float("nan")), n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--models", nargs="*", default=None)
    args = ap.parse_args()

    print(f"{'Model':34s} {'Params':>12s} {'GFLOPs@%d' % args.size:>12s}")
    for name, model, in_ch in model_table():
        if args.models and not any(m.lower() in name.lower() for m in args.models):
            continue
        try:
            flops, n_params = compute_flops(model, in_ch, args.size)
            print(f"{name:34s} {n_params:12,d} {flops / 1e9:12.2f}")
        except Exception as e:  # keep going — mirrors graceful skip
            print(f"{name:34s} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
