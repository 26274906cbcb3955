#!/usr/bin/env python
"""FG-family isolation probe (VERDICT r4 #2 / missing #2).

Round 4 measured the fg production-vs-exact ACC3DS delta at −3.5e-3 (0.5e-3
outside the ±3e-3 band) on the semitrained fg checkpoint, FLAT across
approx_min_k recall 0.95→0.995 (job 224) — so NOT a feature-kNN-recall
artifact. This probe isolates WHICH approximate component carries the
residual by swapping one search at a time between exact and approx:

  production        all searches approx (the shipped fg fast path)
  prod_featexact    approx everywhere; FG feature-space union half exact
  prod_euclexact    approx everywhere; FG euclidean union half exact
  exact_featapprox  exact everywhere;  FG feature-space union half approx
  exact_euclapprox  exact everywhere;  FG euclidean union half approx
  production_vpu    all approx, fused kNN on the exact-f32 VPU distance
                    variant instead of float-float ("ff" vs "vpu" arm)

Each arm reports six-metric deltas vs all-exact with paired per-scene SEs.

Usage: python scripts/fg_probe.py [--ckpt PATH] [--scenes N]
       [--preset fg|bifeat] [--out PATH]
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

from kd_pointcloud_tpu.eval.licensing import in_band, load_scenes
from kd_pointcloud_tpu.eval.licensing import sweep_rows as _sweep_rows


def main():
    import jax

    from kd_pointcloud_tpu.models import PRESETS
    from kd_pointcloud_tpu.utils.fixtures import fixture_path

    def _arg(flag, default):
        return (sys.argv[sys.argv.index(flag) + 1]
                if flag in sys.argv else default)

    preset = _arg("--preset", "fg")
    ckpt = _arg("--ckpt", fixture_path(f"semitrained_{preset}.msgpack"))
    n_scenes = int(_arg("--scenes", 50))
    out_path = _arg("--out", None)
    assert ckpt, "no semitrained checkpoint available"

    base = PRESETS[preset]
    exact = dataclasses.replace(base, knn_method="exact",
                                knn_precision="highest")
    arms = [
        ("exact", exact),
        ("production", base),
        ("prod_featexact",
         dataclasses.replace(base, fg_feat_knn_method="exact")),
        ("prod_euclexact",
         dataclasses.replace(base, fg_euclid_knn_method="exact")),
        ("exact_featapprox",
         dataclasses.replace(exact, fg_feat_knn_method="approx")),
        ("exact_euclapprox",
         dataclasses.replace(exact, fg_euclid_knn_method="approx")),
        ("production_vpu",
         dataclasses.replace(base, knn_method="approx_vpu")),
    ]

    params, stats = load_msgpack_tree(ckpt)
    variables = jax.device_put({"params": params, "batch_stats": stats})

    scenes = load_scenes(n_scenes)

    def sweep_rows(cfg):
        return _sweep_rows(cfg, variables, scenes)

    result = {"preset": preset, "ckpt": ckpt, "n_scenes": n_scenes,
              "arms": {}}
    exact_rows = None
    for name, cfg in arms:
        rows = sweep_rows(cfg)
        if name == "exact":
            exact_rows = rows
            result["exact_metrics"] = [round(float(x), 5)
                                       for x in rows.mean(0)]
            print(json.dumps({"exact": result["exact_metrics"]}),
                  flush=True)
            continue
        d_rows = rows - exact_rows
        d = d_rows.mean(0)
        se = d_rows.std(0, ddof=1) / np.sqrt(d_rows.shape[0])
        entry = {"deltas_vs_exact": [round(float(x), 6) for x in d],
                 "paired_se": [round(float(x), 6) for x in se],
                 "acc3ds_delta": round(float(d[1]), 6),
                 "acc3ds_delta_se": round(float(se[1]), 6),
                 "in_band": in_band(d)}
        result["arms"][name] = entry
        print(json.dumps({name: entry}), flush=True)

    if out_path:
        with open(out_path, "w") as fd:
            json.dump(result, fd, indent=1)
    print(json.dumps({"fg_probe_done": preset, "out": out_path}))


if __name__ == "__main__":
    main()
