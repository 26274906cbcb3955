#!/usr/bin/env python
"""Profiling CLI: params / FLOPs / latency per model preset.

Rebuild of the reference's per-model __main__ profiling blocks
(models_bid_pointconv.py:680-713, thop MACs + CUDA-event timing).

Usage: python scripts/profile_model.py [preset ...] [--points N]
"""
import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("presets", nargs="*", default=None)
    ap.add_argument("--points", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet, tiny_config
    from kd_pointcloud_tpu.utils.profiling import profile_model

    presets = args.presets or ["teacher"]
    rng = np.random.RandomState(0)
    for name in presets:
        cfg = PRESETS[name]
        if args.points != cfg.npoints[0]:
            import dataclasses
            scale = args.points / cfg.npoints[0]
            cfg = dataclasses.replace(
                cfg, npoints=tuple(max(8, int(p * scale))
                                   for p in cfg.npoints))
        model = BidPointFlowNet(cfg)
        x1 = jnp.asarray(rng.randn(1, cfg.npoints[0], 3).astype(np.float32))
        x2 = jnp.asarray(rng.randn(1, cfg.npoints[0], 3).astype(np.float32))
        variables = jax.jit(lambda k: model.init(k, x1, x2, x1, x2,
                                                 train=False))(
            jax.random.PRNGKey(0))
        stats = profile_model(model, variables, x1, x2, x1, x2)
        print(f"{name}: params={stats['params']/1e6:.2f}M "
              f"flops={stats['flops']/1e9:.2f}G "
              f"latency={stats['latency_ms']:.1f}ms "
              f"({stats['pairs_per_sec']:.1f} pairs/s)")


if __name__ == "__main__":
    main()
