#!/usr/bin/env python
"""On-chip kernel self-test: validates every Pallas kernel against its plain
XLA/numpy oracle ON THE REAL TPU and prints one JSON line per check.

The pytest suite runs CPU-only (tests/conftest.py pins the virtual 8-device
CPU mesh), so kernel behavior under the real Mosaic compiler — layouts,
packed-integer ordering, DMA paths — is otherwise only exercised indirectly
through model-level numbers. This harness makes the hardware contract
explicit; run it after a toolchain bump or kernel change:

    python scripts/selftest_tpu.py          # needs the TPU (exclusive)

Checks (all on real bundled KITTI geometry, not synthetic gaussians):
  fps_exact        Pallas FPS indices == host-side numpy oracle, bit-exact
                   (sampling_gpu.cu:93-209 semantics: seed 0, first-index
                   tie-break). The numpy oracle is independent of the XLA
                   path, which itself miscompiles at some shapes on v5e
                   (ops/fps.py:39-42) and so cannot serve as the referee.
  knn_ff_recall    float-float fused kNN recall vs exact top-k >= 0.98
                   (8192², k=32, metric-scale coordinates)
  knn_vpu_recall   exact-f32 VPU-distance variant recall >= 0.98
  knn_dist_error   fused-kernel distances track true d² (mantissa-mask
                   tolerance) for the IDW consumers
  pool_parity      fused lane-packed cross-pool == plain XLA formulation
                   (merged two-round gather, both channel offsets)
  gather_clip      mode="clip" row gather == numpy fancy indexing
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def _scene_pair(n=8192):
    from kd_pointcloud_tpu.data import KITTI, ProcessData
    ds = KITTI(train=False, transform=ProcessData(num_points=n))
    pc1, pc2, *_ = ds[0]
    return pc1, pc2


def _recall(idx_a, idx_e):
    idx_a, idx_e = np.asarray(idx_a), np.asarray(idx_e)
    hits = sum(len(set(idx_a[s].tolist()) & set(idx_e[s].tolist()))
               for s in range(0, idx_e.shape[0], 7))
    return hits / (len(range(0, idx_e.shape[0], 7)) * idx_e.shape[1])


def main():
    import jax
    import jax.numpy as jnp

    from kd_pointcloud_tpu.ops import group_points
    from kd_pointcloud_tpu.ops.fps import furthest_point_sample
    from kd_pointcloud_tpu.ops.pallas.knn_fused import knn_fused
    from kd_pointcloud_tpu.ops.pallas.pool_fused import (_pool_ref,
                                                         pool_mlp_max)
    from kd_pointcloud_tpu.ops.gather import group_points_kmajor_packed

    results = {}
    ok = True

    pc1, pc2 = _scene_pair()
    q = jnp.asarray(pc1[None])
    kk = jnp.asarray(pc2[None])

    # ---- FPS: bit-exact vs a host-side numpy oracle (NOT the XLA path,
    # which is itself the known-miscompiling variant at some shapes —
    # ops/fps.py:39-42; advisor round-2 finding).
    def np_fps(xyz, m):
        B, N, _ = xyz.shape
        out = np.zeros((B, m), dtype=np.int64)
        for b in range(B):
            temp = np.full(N, 1e10, dtype=np.float32)
            last = 0
            for j in range(1, m):
                d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
                temp = np.minimum(temp, d)
                last = int(np.argmax(temp))
                out[b, j] = last
        return out

    x2 = jnp.concatenate([q, kk], axis=0)
    idx_p = np.asarray(furthest_point_sample(x2, 2048, backend="pallas"))
    idx_np = np_fps(np.asarray(x2, dtype=np.float32), 2048)
    results["fps_exact"] = bool((idx_p == idx_np).all())

    # ---- kNN: both production variants vs exact
    d_exact = ((np.asarray(q)[0][:, None, :]
                - np.asarray(kk)[0][None, :, :]) ** 2).sum(-1)
    idx_e = np.argsort(d_exact, axis=1)[:, :32]
    _, idx_ff = knn_fused(q, kk, 32, mode="ff")
    _, idx_vpu = knn_fused(q, kk, 32, mode="vpu")
    results["knn_ff_recall"] = round(_recall(np.asarray(idx_ff)[0], idx_e), 4)
    results["knn_vpu_recall"] = round(_recall(np.asarray(idx_vpu)[0], idx_e),
                                      4)
    # fuse_min (round 5, the production default in ops/knn.py): must return
    # BIT-IDENTICAL indices to the scratch path (evidence/round5/job404)
    _, idx_fm = knn_fused(q, kk, 32, mode="ff", fuse_min=True)
    results["knn_ff_fusemin_bitident"] = bool(
        (np.asarray(idx_fm) == np.asarray(idx_ff)).all())

    # ---- kNN distances (VPU variant feeds IDW): mantissa-mask tolerance
    d3, i3 = knn_fused(q, kk, 3, mode="vpu")
    gathered = np.asarray(kk)[0][np.asarray(i3)[0]]
    true_d = ((np.asarray(q)[0][:, None, :] - gathered) ** 2).sum(-1)
    err = np.max(np.abs(np.asarray(d3)[0] - true_d)
                 / np.maximum(true_d, 1e-6))
    results["knn_dist_rel_err"] = round(float(err), 5)

    # ---- pool kernel: packed fast path vs plain XLA formulation
    rng = np.random.RandomState(0)
    C, K, Cg = 32, 32, 64
    u = jnp.asarray(rng.randn(1, 8192, Cg).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 8192, C).astype(np.float32))
    idx = jnp.asarray(np.asarray(idx_ff))
    ws = tuple(jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.2
               for _ in range(2))
    bs = tuple(jnp.asarray(rng.randn(C).astype(np.float32)) * 0.2
               for _ in range(2))
    P = 128 // C
    gp = group_points_kmajor_packed(u, idx, P)
    pool_errs = []
    for co in (0, C):
        out = pool_mlp_max(gp, v, ws, bs, co=co, packed_p=P)
        gq = jnp.swapaxes(group_points(u, idx), 1, 2)       # (B, K, N, Cg)
        ref = _pool_ref(gq, v, ws, bs, co)
        pool_errs.append(float(jnp.max(jnp.abs(out - ref))))
    results["pool_max_abs_err"] = round(max(pool_errs), 6)

    # ---- gather clip semantics
    g = np.asarray(group_points(u, idx))
    ref = np.asarray(u)[0][np.asarray(idx)[0]]
    results["gather_exact"] = bool(np.array_equal(g[0], ref))

    ok = (results["fps_exact"] and results["gather_exact"]
          and results["knn_ff_recall"] >= 0.98
          and results["knn_vpu_recall"] >= 0.98
          and results["knn_ff_fusemin_bitident"]
          and results["knn_dist_rel_err"] < 3e-3
          and results["pool_max_abs_err"] < 1e-4)

    # ---- optional: every ModelConfig preset's forward on the real chip
    # (~8 min of compiles; caught the FG feature-space-kNN routing crash
    # that the CPU suite structurally cannot see)
    if "--presets" in sys.argv:
        from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
        for name in PRESETS:
            try:
                m = BidPointFlowNet(PRESETS[name])
                v = jax.jit(lambda k, mm=m: mm.init(
                    k, q, kk, q, kk, train=False))(jax.random.PRNGKey(0))
                out = jax.jit(lambda vv, mm=m: mm.apply(
                    vv, q, kk, q, kk, train=False)["flows"])(v)
                f0 = out[0][-1] if isinstance(out[0], list) else out[0]
                fin = bool(np.isfinite(float(jnp.sum(f0))))
                results[f"preset_{name}"] = "ok" if fin else "NONFINITE"
                ok = ok and fin
            except Exception as e:  # pragma: no cover - hardware harness
                results[f"preset_{name}"] = f"FAIL: {str(e)[:80]}"
                ok = False

    # ---- optional: SIX-METRIC parity of the production approx path vs the
    # exact path on real hardware (VERDICT r2 #3, re-licensed on TRAINED
    # weights per VERDICT r3 #2). Thresholds mirror
    # tests/test_eval_parity.py::TestProductionPathMetrics.
    #
    #   --ckpt PATH     teacher-tree weights (.pth state_dict or flax
    #                   .msgpack); default prefers the semi-trained overfit
    #                   checkpoint (tests/make_train_parity_fixture.py
    #                   `overfit` mode — EPE3D ~0.07 regime) over the legacy
    #                   random-init fixture (EPE3D ~0.66 regime).
    #   --scenes N      bundled-KITTI scene count (default 50)
    #   --fg            also sweep the FG family (feature-space kNN — the
    #                   approx path's hardest case, VERDICT r3 #5) with
    #                   --fg-ckpt weights (flax .msgpack; falls back to a
    #                   seeded random init, labeled in the output)
    if "--metrics" in sys.argv:
        import dataclasses
        import os.path as osp

        from kd_pointcloud_tpu.data import KITTI, ProcessData
        from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
        from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint

        def _arg(flag, default):
            return (sys.argv[sys.argv.index(flag) + 1]
                    if flag in sys.argv else default)

        def _load_tree(path):
            if path.endswith(".msgpack"):
                import flax
                with open(path, "rb") as fd:
                    tree = flax.serialization.msgpack_restore(fd.read())
                return tree["params"], tree["batch_stats"]
            return load_torch_checkpoint(path)

        # checkpoint preference: the GENERALIZING semitrained tree (scripts/
        # train_semitrained.py — accurate flows on the sweep scenes, the
        # regime that licenses approximations), then the 16-scene overfit
        # fixture (round-4 finding: its sweep-scene EPE3D ~0.73 is no more
        # "trained regime" than random init), then random init.
        # fixture_path resolves to the round-5 18k teacher (aliased in
        # evidence/fixtures as semitrained_teacher_18k.msgpack) and
        # REFRESHES a stale /tmp cache — after a host wipe this keeps the
        # gate on the SAME regime instead of silently falling back to the
        # round-4 6k checkpoint (ADVICE r4 #3 + round-5 review finding #1)
        from kd_pointcloud_tpu.utils.fixtures import fixture_path
        candidates = (fixture_path("semitrained_teacher.msgpack"),
                      "/tmp/kdpc_train_parity/overfit_final.pth",
                      "/tmp/kdpc_eval_parity/ref_eval_random.pth")
        sd_path = _arg("--ckpt", next((c for c in candidates
                                       if c and osp.exists(c)),
                                      candidates[-1]))
        n_scenes = int(_arg("--scenes", 50))
        params, stats = _load_tree(sd_path)
        results["metrics_ckpt"] = sd_path
        ds = KITTI(train=False, transform=ProcessData(num_points=8192))
        scenes = []
        for i in range(n_scenes):
            pc1s, pc2s, _, _, sf, path = ds[i]
            scenes.append((pc1s, pc2s, sf, path))

        # The licensing criterion (DIRECTIONAL degradation-only band) and
        # the per-scene sweep live in eval/licensing.py, shared with
        # relaxation_sweep/fg_probe/regime_curve so a band change lands
        # everywhere at once. Per-variant tolerance widening (ADVICE r4
        # #1) became moot when serving_v2 — the one variant near its band
        # edge — was demoted from gating in round 5.
        from kd_pointcloud_tpu.eval.licensing import in_band as _in_band
        from kd_pointcloud_tpu.eval.licensing import sweep_rows

        def _sweep(variants, params, stats):
            means = {}
            # device_put ONCE: msgpack/torch trees are host numpy, and a
            # host tree passed to a jitted fwd re-ships all ~32 MB through
            # the remote tunnel per scene (50 scenes x 4 variants = 6.4 GB
            # — job 212 took 63 min mostly on this).
            vv_dev = jax.device_put({"params": params,
                                     "batch_stats": stats})
            for name, cfg in variants:
                means[name] = sweep_rows(cfg, vv_dev, scenes).mean(0)
            return means

        means = _sweep((
            ("exact", dataclasses.replace(PRESETS["teacher"],
                                          knn_method="exact",
                                          knn_precision="highest")),
            ("production", PRESETS["teacher"]),
            # serving_v3 (coarse-warp at l0): the regime-robust LICENSED
            # relaxation — in the directional band at every checkpoint of
            # the round-5 regime curve (evidence/round5/regime_curve.json)
            ("serving_v3", PRESETS["serving_v3"]),
            # serving_v2 (K=16 at l0): DEMOTED round 5 — its round-4
            # single-checkpoint license does not transfer across regimes
            # (EPE3D +0.0023..+0.008 at more accurate checkpoints)
            ("serving_v2", PRESETS["serving_v2"]),
            # serving preset (l0/l1 cost-volume K=16): DEMOTED round 4 —
            # EPE3D +0.054 on trained weights, fast-but-approximate only
            ("serving", PRESETS["serving"]),
            # fps_blocks=8: the serial-FPS relaxation, ruled OUT of band on
            # trained weights (+0.091 with serving, +0.029 with production)
            ("fps_blocks8", dataclasses.replace(PRESETS["serving"],
                                                fps_blocks=8)),
        ), params, stats)
        results["metrics_exact"] = [round(float(x), 5)
                                    for x in means["exact"]]
        metrics_ok = True
        for variant in ("production", "serving_v3", "serving_v2", "serving",
                        "fps_blocks8"):
            d = means[variant] - means["exact"]
            results[f"metric_deltas_{variant}_minus_exact"] = [
                round(float(x), 6) for x in d]
            v_ok = _in_band(d)
            results[f"metrics_ok_{variant}"] = v_ok
            # serving_v2/serving/fps_blocks8 are QUANTIFIED-RELAXATION
            # knobs, not equivalence claims (round-4/5 demotions).
            # production and serving_v3 are the LICENSED paths and gate
            # metrics_ok.
            if variant in ("production", "serving_v3"):
                metrics_ok = metrics_ok and v_ok

        if "--fg" in sys.argv:
            from kd_pointcloud_tpu.utils.fixtures import fixture_path
            fg_default = (fixture_path("semitrained_fg.msgpack")
                          or fixture_path("overfit_jax_fg.msgpack")
                          or "/tmp/kdpc_train_parity/semitrained_fg.msgpack")
            fg_path = _arg("--fg-ckpt", fg_default)
            for preset in ("fg", "bifeat"):
                p = fg_path.replace("_fg.", f"_{preset}.")
                if not osp.exists(p):
                    p = fixture_path(osp.basename(p)) or p
                if osp.exists(p):
                    fg_params, fg_stats = _load_tree(p)
                    results[f"metrics_{preset}_ckpt"] = p
                else:
                    m = BidPointFlowNet(PRESETS[preset])
                    pc1s = scenes[0][0]
                    v = jax.jit(lambda k, mm=m: mm.init(
                        k, jnp.asarray(pc1s[None]), jnp.asarray(pc1s[None]),
                        jnp.asarray(pc1s[None]), jnp.asarray(pc1s[None]),
                        train=False))(jax.random.PRNGKey(0))
                    fg_params, fg_stats = v["params"], v["batch_stats"]
                    results[f"metrics_{preset}_ckpt"] = "random-init"
                fmeans = _sweep((
                    ("exact", dataclasses.replace(PRESETS[preset],
                                                  knn_method="exact",
                                                  knn_precision="highest")),
                    ("production", PRESETS[preset])), fg_params, fg_stats)
                d = fmeans["production"] - fmeans["exact"]
                results[f"metrics_{preset}_exact"] = [
                    round(float(x), 5) for x in fmeans["exact"]]
                results[f"metric_deltas_{preset}_minus_exact"] = [
                    round(float(x), 6) for x in d]
                v_ok = _in_band(d)
                results[f"metrics_ok_{preset}"] = v_ok
                metrics_ok = metrics_ok and v_ok

        results["metrics_ok"] = metrics_ok
        ok = ok and metrics_ok

    results["ok"] = bool(ok)
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
