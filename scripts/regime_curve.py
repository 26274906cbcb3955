#!/usr/bin/env python
"""Regime-curve licensing sweep: approximation deltas vs training progress,
with per-scene paired error bars (VERDICT r4 #4).

Round 4 proved approximation bands are REGIME-DEPENDENT (the serving
preset's random-init "in band" ruling inverted on trained weights), but then
licensed serving_v2 at ONE checkpoint / one seed / no error bar. This sweep
measures the six-metric deltas of each candidate variant vs the exact path
at SEVERAL checkpoints along the semitrained curve (different EPE3D
regimes, ideally from >=2 seeds), reporting for each (ckpt, variant):

  * the exact path's sweep EPE3D (the regime coordinate),
  * mean deltas for all six metrics (variant − exact),
  * the PAIRED per-scene standard error of the EPE3D delta (each scene is
    evaluated under both configs — the matched-pairs SE is the right error
    bar for a mean-delta claim, far tighter than the cross-scene spread),
  * the directional-band verdict (ROUND4_NOTES §3 band).

Usage:
  python scripts/regime_curve.py --ckpts p1,p2,... [--scenes 50]
         [--variants production,serving_v2,prod_cw0,v2_cw0] [--out PATH]
"""

from __future__ import annotations

import dataclasses
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

from evidence_data import load_msgpack_tree

from kd_pointcloud_tpu.eval.licensing import in_band, load_scenes, sweep_rows


def variant_cfg(name):
    from kd_pointcloud_tpu.models import PRESETS
    teacher = PRESETS["teacher"]
    table = {
        "exact": dataclasses.replace(teacher, knn_method="exact",
                                     knn_precision="highest"),
        "production": teacher,
        "serving_v2": PRESETS["serving_v2"],
        "serving_v3": PRESETS["serving_v3"],   # == prod_cw0 (licensed name)
        "serving": PRESETS["serving"],
        "prod_cw0": dataclasses.replace(teacher, coarse_warp=(0,)),
        "prod_cw01": dataclasses.replace(teacher, coarse_warp=(0, 1)),
        "v2_cw0": dataclasses.replace(
            teacher, flow_nei_per_level=(16, 32, 32, 32), coarse_warp=(0,)),
        # round-5 session-3 candidates: K=24 at l0 sits halfway between the
        # exact K=32 and the demoted K=16 (whose delta GROWS with accuracy);
        # job 418 showed the cost-volume K family is the single largest
        # share of the eval wall, so an in-band K wins real latency.
        "prod_k24l0": dataclasses.replace(
            teacher, flow_nei_per_level=(24, 32, 32, 32)),
        "k24l0_cw0": dataclasses.replace(
            teacher, flow_nei_per_level=(24, 32, 32, 32), coarse_warp=(0,)),
        "prod_k24l01": dataclasses.replace(
            teacher, flow_nei_per_level=(24, 24, 32, 32)),
    }
    return table[name]


def main():
    import jax

    def _arg(flag, default):
        return (sys.argv[sys.argv.index(flag) + 1]
                if flag in sys.argv else default)

    ckpts = [c for c in _arg("--ckpts", "").split(",") if c]
    if not ckpts:
        sys.exit("usage: regime_curve.py --ckpts p1,p2,... "
                 "[--scenes N] [--variants a,b,...] [--out PATH]")
    n_scenes = int(_arg("--scenes", 50))
    variants = _arg("--variants",
                    "production,serving_v2,prod_cw0,v2_cw0").split(",")
    out_path = _arg("--out", None)

    scenes = load_scenes(n_scenes)

    curve = []
    for ckpt in ckpts:
        params, stats = load_msgpack_tree(ckpt)
        variables = jax.device_put({"params": params, "batch_stats": stats})
        exact_rows = sweep_rows(variant_cfg("exact"), variables, scenes)
        point = {"ckpt": ckpt,
                 "exact_metrics": [round(float(x), 5)
                                   for x in exact_rows.mean(0)],
                 "regime_epe3d": round(float(exact_rows.mean(0)[0]), 5),
                 "variants": {}}
        for name in variants:
            rows = sweep_rows(variant_cfg(name), variables, scenes)
            d_rows = rows - exact_rows             # paired per-scene deltas
            d = d_rows.mean(0)
            se = d_rows.std(0, ddof=1) / np.sqrt(d_rows.shape[0])
            point["variants"][name] = {
                "deltas_vs_exact": [round(float(x), 6) for x in d],
                "paired_se": [round(float(x), 6) for x in se],
                "epe3d_delta": round(float(d[0]), 6),
                "epe3d_delta_se": round(float(se[0]), 6),
                "in_band": in_band(d),
            }
        curve.append(point)
        print(json.dumps(point), flush=True)

    result = {"n_scenes": n_scenes, "curve": curve}
    if out_path:
        with open(out_path, "w") as fd:
            json.dump(result, fd, indent=1)
    print(json.dumps({"regime_curve_done": len(curve),
                      "out": out_path}))


if __name__ == "__main__":
    main()
