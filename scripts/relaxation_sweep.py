#!/usr/bin/env python
"""Trained-regime relaxation sweep: six-metric deltas AND throughput per
candidate serving config, in one quiet-host job.

Round-4 motivation: the serving preset's band license must hold on trained
weights (VERDICT r3 #2). If (16,16,32,32) falls out of band in the accurate-
flow regime, this sweep finds the fastest candidate that stays in band —
each variant gets (a) six-metric deltas vs the exact path on the first
--scenes bundled-KITTI scenes and (b) bs=1 dispatch-amortized throughput,
so the speed/accuracy frontier is read off one JSON line.

Usage: python scripts/relaxation_sweep.py [--ckpt PATH] [--scenes N]
"""

from __future__ import annotations

import dataclasses
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

from evidence_data import load_msgpack_tree

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, _REPO)
from kd_pointcloud_tpu.utils.fixtures import fixture_path  # noqa: E402

# resolves to the round-5 18k teacher (evidence alias), refreshing a stale
# /tmp cache — see utils/fixtures.py
DEFAULT_CKPT = (fixture_path("semitrained_teacher.msgpack")
                or "/tmp/kdpc_train_parity/semitrained_teacher.msgpack")

# DIRECTIONAL band (degradation-only, ROUND4_NOTES §3) — the shared
# licensing criterion (kd_pointcloud_tpu/eval/licensing.py)
from kd_pointcloud_tpu.eval.licensing import (in_band, load_scenes,  # noqa: E402
                                              sweep_rows)


def main():
    import jax
    import jax.numpy as jnp

    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet

    def _arg(flag, default):
        return (sys.argv[sys.argv.index(flag) + 1]
                if flag in sys.argv else default)

    ckpt = _arg("--ckpt", DEFAULT_CKPT)
    n_scenes = int(_arg("--scenes", 50))
    if ckpt.endswith(".msgpack"):
        params, stats = load_msgpack_tree(ckpt)
    else:
        from kd_pointcloud_tpu.models.torch_import import \
            load_torch_checkpoint
        params, stats = load_torch_checkpoint(ckpt)
    # device_put ONCE: a host-numpy tree passed to a jitted fwd re-ships
    # the full ~32 MB tree through the remote tunnel on EVERY dispatch —
    # it would dominate (and corrupt) the throughput lines below.
    import jax as _jax
    variables = _jax.device_put({"params": params, "batch_stats": stats})

    scenes = load_scenes(n_scenes)

    teacher = PRESETS["teacher"]
    variants = [
        ("exact", dataclasses.replace(teacher, knn_method="exact",
                                      knn_precision="highest")),
        ("production", teacher),
        ("serving_16_16", PRESETS["serving"]),
        ("l0only_16", dataclasses.replace(
            teacher, flow_nei_per_level=(16, 32, 32, 32))),
        ("k24_24", dataclasses.replace(
            teacher, flow_nei_per_level=(24, 24, 32, 32))),
        ("l0only_24", dataclasses.replace(
            teacher, flow_nei_per_level=(24, 32, 32, 32))),
        ("prod_fps8", dataclasses.replace(teacher, fps_blocks=8)),
        ("serving_fps8", dataclasses.replace(
            PRESETS["serving"], fps_blocks=8)),
        # round-5 arms: coarse-warp (inverse flow reconstructed at lvl+1,
        # upsampled along the decoder's existing 3-NN — skips the l0 8192²
        # warp search, ModelConfig.coarse_warp) alone and stacked on the
        # licensed serving_v2 relaxation
        ("prod_cw0", dataclasses.replace(teacher, coarse_warp=(0,))),
        ("prod_cw01", dataclasses.replace(teacher, coarse_warp=(0, 1))),
        ("v2_cw0", dataclasses.replace(
            teacher, flow_nei_per_level=(16, 32, 32, 32),
            coarse_warp=(0,))),
    ]
    only = _arg("--only", None)
    if only:
        keep = {"exact"} | set(only.split(","))
        variants = [v for v in variants if v[0] in keep]

    out = {"ckpt": ckpt, "n_scenes": n_scenes, "variants": {}}
    means = {}
    for name, cfg in variants:
        model = BidPointFlowNet(cfg)
        fwd = jax.jit(lambda vv, a, b, mm=model: mm.apply(
            vv, a, b, a, b, train=False)["flows"][0])
        means[name] = sweep_rows(cfg, variables, scenes, fwd=fwd).mean(0)

        # bs=1 dispatch-amortized throughput (bench.py protocol: pre-staged
        # device inputs, back-to-back dispatches, single sync)
        staged = [(jnp.asarray(s[0][None]), jnp.asarray(s[1][None]))
                  for s in scenes[:8]]
        float(jnp.sum(fwd(variables, *staged[0])))
        N = 30
        t0 = time.time()
        r = None
        for i in range(N):
            r = fwd(variables, *staged[i % len(staged)])
        float(jnp.sum(r))
        pairs = N / (time.time() - t0)

        entry = {"pairs_per_sec_bs1": round(pairs, 2),
                 "metrics": [round(float(x), 5) for x in means[name]]}
        if name != "exact":
            d = means[name] - means["exact"]
            entry["deltas_vs_exact"] = [round(float(x), 6) for x in d]
            entry["in_band"] = in_band(d)
        out["variants"][name] = entry
        print(json.dumps({name: entry}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
