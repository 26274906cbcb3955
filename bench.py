"""Headline benchmark: eval point-pairs/sec/chip for the flagship teacher.

Protocol mirrors the reference evaluation setting (evaluate_bid_pointconv.py:
batch 1, 8192 points/cloud, KITTI scenes): jitted eval forward of
BidPointFlowNet(teacher) on real bundled KITTI scenes. Throughput is measured
by dispatching N forwards back-to-back and syncing once — per-call host sync
through this image's remote-TPU tunnel costs ~30 ms of pure RPC latency that
a production serving loop would pipeline away.

Round 2: distance computations run at full accuracy (round 1's default-
precision cost path had neighbor recall 0.26 on KITTI-scale coordinates —
a silent accuracy bug, see models/config.py), with the fused Pallas kNN
kernel (ops/pallas/knn_fused.py, float-float MXU distances at recall
0.987), the fused lane-packed cross-pool kernel (ops/pallas/pool_fused.py)
and the reassociated PointConv contraction (nn/pointconv.py contract_dense)
recovering and extending the speed: 9.2 ms/pair = 108.8 pairs/s = 4.25×.

Baseline: the reference repo logs no latency (SURVEY.md §6); the
Bi-PointFlowNet paper (ECCV'22) reports 39 ms/pair on its reference GPU →
25.6 pairs/s. vs_baseline = measured / 25.6.

Prints one JSON line per metric; the LAST line is the headline eval metric
(the driver records the last line).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PAIRS_PER_S = 25.6  # 39 ms/pair, Bi-PointFlowNet ECCV'22 runtime
V5E_PEAK_F32_FLOPS = 49.2e12  # per chip (bf16 197 TFLOP/s ÷ 4 HIGHEST passes≈)
# Model FLOPs per pair on the reference's own accounting basis: thop reports
# 13.1 GMAC/pair for the teacher (BASELINE.md, 연구노트 11차 table) = 26.2 GFLOP.
# This is the comparable numerator for MFU; the XLA cost_analysis number also
# emitted below additionally counts the 6-pass HIGHEST-precision distance
# matmuls and is therefore NOT comparable across implementations.
MODEL_FLOPS_PER_PAIR = 13.1e9 * 2
PROTOCOL = "200-dispatch amortized, single sync (remote-tunnel RPC ~30ms/call)"


def _wait_for_quiet_host(threshold: float = 1.5, max_wait_s: float = 900.0):
    """Block until 1-min loadavg < threshold (bounded wait).

    Measured round-3 finding: host CPU contention (e.g. a concurrent pytest
    suite) balloons per-dispatch host work ~2x (58 vs 110 pairs/s on the
    same binary) — the dispatch-amortized protocol is only meaningful on a
    quiet host. If the host never quiets down we proceed anyway and stamp
    the loadavg into the JSON lines.
    """
    import os
    deadline = time.time() + max_wait_s
    load = os.getloadavg()[0]
    while load >= threshold and time.time() < deadline:
        print(json.dumps({"event": "waiting_for_quiet_host",
                          "loadavg_1m": round(load, 2),
                          "threshold": threshold}), flush=True)
        time.sleep(15.0)
        load = os.getloadavg()[0]
    return load


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat runs skip remote cold compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_kdpc")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    host_load = _wait_for_quiet_host()

    from kd_pointcloud_tpu.data import KITTI, ProcessData
    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
    from kd_pointcloud_tpu.train import (TrainState, make_optimizer,
                                         make_train_step)

    model = BidPointFlowNet(PRESETS["teacher"])

    try:
        ds = KITTI(train=False, transform=ProcessData(num_points=8192))
        n_scenes = min(8, len(ds))
        batches = []
        for i in range(n_scenes):
            pc1, pc2, n1, n2, _, _ = ds[i]
            batches.append(tuple(jnp.asarray(x[None])
                                 for x in (pc1, pc2, n1, n2)))
    except Exception:
        rng = np.random.RandomState(0)
        batches = [tuple(jnp.asarray(rng.randn(1, 8192, 3).astype(np.float32))
                         for _ in range(4)) for _ in range(4)]

    variables = jax.jit(
        lambda k: model.init(k, *batches[0], train=False))(
            jax.random.PRNGKey(0))

    fwd = jax.jit(lambda v, a, b, c, d:
                  model.apply(v, a, b, c, d, train=False)["flows"][0])

    # analytical cost of one eval forward (for the MFU line)
    try:
        flops_per_pair = jax.jit(
            lambda v, a, b, c, d:
            model.apply(v, a, b, c, d, train=False)["flows"][0]
        ).lower(variables, *batches[0]).compile().cost_analysis()["flops"]
    except Exception:
        flops_per_pair = None

    # warm / compile
    float(jnp.sum(fwd(variables, *batches[0])))

    def timed_reps(f, n=20, reps=1):
        """reps × n-dispatch amortized blocks → pairs/s per block."""
        vals = []
        for _ in range(reps):
            t0 = time.time()
            out = None
            for i in range(n):
                out = f(variables, *batches[i % len(batches)])
            float(jnp.sum(out))  # host sync — device has executed all n
            vals.append(n / (time.time() - t0))
        return vals

    # ---- INTERLEAVED repetitions (VERDICT r4 weak #1: the latency-bound
    # exact-path number swings ~4% between consecutive quiet runs; N=1
    # reporting makes the 5× claim unfalsifiable). Protocol: warm every
    # variant, then run REPS rounds visiting each variant once per round —
    # interleaving exposes each variant to the same drift — and report
    # median (headline) + min + all reps.
    #
    # NBLK=200 (round 5): each block's single host sync costs one tunnel
    # RTT (~30-40 ms on the 1-core round-5 host), which at the old NBLK=20
    # deflated every line by ~15% (block probe, evidence/round5/job412:
    # n20/n50/n100/n200 → 116/127.5/132.4/135.0 pairs/s, flat across
    # gap/no-gap arms — pure per-block sync amortization, not device
    # drift). 200 dispatches ≈ 1.4 s/block keeps the sync tail <2%.
    REPS, NBLK = 3, 200
    teacher_reps = timed_reps(fwd, NBLK, 1)          # rep 1 (more below)
    pairs_per_s = teacher_reps[0]

    # ---- train-step throughput (bs=3, the reference training batch size,
    # train_bid_pointconv.py:138) with a SELF-MEASURED target: the bs=1
    # step timed in the same run defines the perfect-batch-scaling bound
    # (3 pairs in the time of one bs=1 step x1); vs_target is the fraction
    # of that bound achieved. The reference publishes no train timing
    # (SURVEY.md §6), so the target is floor-based, not baseline-based
    # (VERDICT r3 #6). The known wall is the batched row-gather penalty
    # (ops/gather.py module docstring; round-3 ledger job 111b: bs=3 step
    # 84.3 ms ~= value_and_grad 78 ms — gathers/FPS/pool-bwd shares ~2.0 /
    # ~2.3 / ~1.4 ms of the bs=1 forward's 9.1 ms, scaling superlinearly
    # with batch).
    def timed_steps(step, state, batch, m):
        state, loss = step(state, batch)
        float(loss)                      # compile + settle
        t0 = time.time()
        for _ in range(m):
            state, loss = step(state, batch)
        float(loss)
        return (time.time() - t0) / m

    def make_train_batch(bs):
        bb = tuple(jnp.concatenate([x] * bs) for x in batches[0])
        return dict(pos1=bb[0], pos2=bb[1], norm1=bb[2], norm2=bb[3],
                    flow=jnp.zeros_like(bb[0]))

    try:
        from kd_pointcloud_tpu.losses import multi_scale_loss

        tx = make_optimizer(1e-3)
        b3 = make_train_batch(3)
        v3 = jax.jit(lambda k: model.init(
            k, b3["pos1"], b3["pos2"], b3["norm1"], b3["norm2"],
            train=False))(jax.random.PRNGKey(0))
        step = make_train_step(model, tx, donate=False)
        dt1 = timed_steps(step, TrainState.create(v3, tx),
                          make_train_batch(1), 15)
        dt3 = timed_steps(step, TrainState.create(v3, tx), b3, 15)
        target_pairs = 3 / dt1           # perfect scaling from the bs=1 step

        # fwd/bwd decomposition (round-5 probe, evidence/round5/job402):
        # the backward sits at the textbook ~2x-forward FLOP ratio, so the
        # "3 pairs in one bs=1 step" target is a physically unreachable
        # floor for a linear-work step — batch_efficiency (per-pair cost
        # ratio bs1/bs3) is the defensible scaling criterion.
        def loss_only(v, b):
            out, _ = model.apply(v, b["pos1"], b["pos2"], b["norm1"],
                                 b["norm2"], train=True,
                                 mutable=["batch_stats"])
            return multi_scale_loss(out["flows"], b["flow"],
                                    out["fps_idx1"])

        def timed_fwd(batch, m=10):
            f = jax.jit(loss_only)
            float(f(v3, batch))
            t0 = time.time()
            for _ in range(m):
                loss = f(v3, batch)
            float(loss)
            return (time.time() - t0) / m

        fwd1 = timed_fwd(make_train_batch(1))
        fwd3 = timed_fwd(b3)
        print(json.dumps({
            "metric": "teacher_train_step_bs3",
            "value": round(1.0 / dt3, 2),
            "unit": "steps/sec",
            "vs_baseline": None,   # the reference publishes no train timing
            "pairs_per_sec": round(3 / dt3, 2),
            "bs1_step_ms": round(dt1 * 1e3, 2),
            "target_pairs_per_sec": round(target_pairs, 2),
            "vs_target": round((3 / dt3) / target_pairs, 3),
            "target_basis": "perfect batch scaling of the same-run bs=1 "
                            "step (floor-based; no reference train timing)",
            "batch_efficiency": round((dt1) / (dt3 / 3), 3),
            "batch_efficiency_basis": "per-pair step cost bs=1 / bs=3 "
                                      "(1.0 = linear work, >1 = batching "
                                      "helps; the fwd/bwd ledger below "
                                      "shows why vs_target cannot reach 1)",
            "fwd_bs1_ms": round(fwd1 * 1e3, 2),
            "fwd_bs3_ms": round(fwd3 * 1e3, 2),
            "bwd_over_fwd_bs1": round((dt1 - fwd1) / fwd1, 2),
            "protocol": "15-dispatch amortized, single sync",
        }))
    except Exception as e:  # pragma: no cover - train bench is best-effort
        print(json.dumps({"metric": "teacher_train_step_bs3",
                          "error": str(e)[:200]}))

    # ---- FULL KD step (bs=8, config_train_kd_pointconv.yaml batch size):
    # frozen-teacher forward + student grad + Adam update in ONE jitted
    # step (train/distill.py make_distill_step with the shipped
    # biDirection_loss_ht) — the measured number ADVICE r3 #1 asked for in
    # place of the composed ~304 ms estimate. Same self-measured
    # perfect-scaling target from a bs=1 KD step.
    try:
        from kd_pointcloud_tpu.train import make_distill_step
        from kd_pointcloud_tpu.train.distill_experiment import make_named_loss

        # the reference's actual KD student is lighttoken_res
        # (distilTrain.py:15) — teacher-width features, so the hint term is
        # shape-consistent (the narrow "student" preset is not at l3).
        s_model = BidPointFlowNet(PRESETS["lighttoken_res"])
        b8 = make_train_batch(8)
        sv = jax.jit(lambda k: s_model.init(
            k, b8["pos1"], b8["pos2"], b8["norm1"], b8["norm2"],
            train=False))(jax.random.PRNGKey(1))
        named = make_named_loss("biDirection_loss_ht",
                                {"gamma": 0.3, "beta": 0.8,
                                 "hint_layers": [2, 3]})
        kd_step = make_distill_step(
            model, s_model, tx,
            loss_fn=lambda s_out, t_out, b: named(s_out, t_out, b))

        def timed_kd(bs, m):
            b = make_train_batch(bs)
            # fresh leaf copies: the KD step donates its state, so the init
            # tree must not be shared across arms
            st = TrainState.create(
                jax.tree_util.tree_map(jnp.copy, sv), tx)
            st, loss = kd_step(st, variables, b)
            float(loss)
            t0 = time.time()
            for _ in range(m):
                st, loss = kd_step(st, variables, b)
            float(loss)
            return (time.time() - t0) / m

        kdt1 = timed_kd(1, 10)
        kdt8 = timed_kd(8, 10)
        print(json.dumps({
            "metric": "kd_full_step_bs8",
            "value": round(kdt8 * 1e3, 1),
            "unit": "ms/step",
            "vs_baseline": None,   # the reference publishes no KD timing
            "pairs_per_sec": round(8 / kdt8, 2),
            "bs1_step_ms": round(kdt1 * 1e3, 2),
            "target_step_ms": round(kdt1 * 1e3 * 8, 1),
            "vs_target": round((kdt1 * 8) / kdt8, 3),
            "target_basis": "perfect batch scaling of the same-run bs=1 "
                            "full KD step (teacher fwd + student grad + "
                            "Adam in one jit)",
            "config": "teacher->lighttoken_res, biDirection_loss_ht "
                      "(gamma .3, beta .8, hint l3), bs=8 "
                      "(config_train_kd_pointconv.yaml / distilTrain.py:15)",
            "protocol": "10-dispatch amortized, single sync",
        }))
    except Exception as e:  # pragma: no cover - KD bench is best-effort
        print(json.dumps({"metric": "kd_full_step_bs8",
                          "error": str(e)[:200]}))
    print(json.dumps({
        "metric": "teacher_eval_mfu",
        "value": round(MODEL_FLOPS_PER_PAIR * pairs_per_s / V5E_PEAK_F32_FLOPS, 4),
        "unit": "fraction_of_v5e_f32_peak",
        "vs_baseline": None,
        "flops_basis": "model (thop-comparable, 13.1 GMAC/pair)",
        "flops_per_pair": MODEL_FLOPS_PER_PAIR,
        "xla_cost_analysis_mfu": (
            round(flops_per_pair * pairs_per_s / V5E_PEAK_F32_FLOPS, 4)
            if flops_per_pair else None),
        "xla_cost_analysis_flops_per_pair": flops_per_pair,
        "protocol": PROTOCOL,
    }))

    # ---- wall ledger (VERDICT r3 #4): standalone kernel walls of the two
    # serial-latency components, measured in THIS run under the same
    # protocol; "other" = model wall minus these (row gathers + matmuls +
    # pools + elementwise, which fuse and can't be timed standalone).
    # Components are timed HERE; the line itself prints at the end against
    # the teacher's final interleaved MEDIAN wall, so the ledger and the
    # headline describe the same number (round-5 review finding #7 — the
    # old rep-1 wall put the ±4% run-to-run swing entirely into "other").
    ledger = None
    try:
        from kd_pointcloud_tpu.ops.pallas.fps_pallas import \
            furthest_point_sample_pallas
        from kd_pointcloud_tpu.ops.pallas.knn_fused import knn_fused

        both = jnp.concatenate([batches[0][0], batches[0][1]])   # (2, N, 3)

        def timed(fn, m=200):
            float(jnp.sum(fn()))
            t0 = time.time()
            r = None
            for _ in range(m):
                r = fn()
            float(jnp.sum(r))
            return (time.time() - t0) / m * 1e3

        fps_ms = timed(lambda: furthest_point_sample_pallas(both, 2048))
        # production-config kernels (ops/knn.py _fused_call: fuse_min,
        # tq=512 square / tq=256 tall-skinny — round-5 A/B, job 404).
        # Keys precomputed OUTSIDE the timed lambda: an eager per-call
        # both[::-1] costs its own tunnel dispatch (job 416's 9.26 ms
        # ledger artifact).
        both_rev = jnp.concatenate([batches[0][1], batches[0][0]])
        knn_ms = timed(lambda: knn_fused(both, both_rev, 32, tq=512,
                                         mode="ff", fuse_min=True)[1])
        warp_ms = timed(lambda: knn_fused(batches[0][1], batches[0][0], 3,
                                          tq=512, mode="ff",
                                          fuse_min=True)[1])
        up_keys = jnp.concatenate([batches[0][0][:, :2048],
                                   batches[0][1][:, :2048]])
        up_ms = timed(lambda: knn_fused(both, up_keys, 3, tq=256,
                                        mode="ff", fuse_min=True)[1])
        ledger = (fps_ms, knn_ms, warp_ms, up_ms)
    except Exception as e:  # pragma: no cover - ledger is best-effort
        print(json.dumps({"metric": "teacher_eval_wall_ledger_ms",
                          "error": str(e)[:200]}))

    # ---- serving preset (models/config.py "serving": cost-volume K=16 at
    # the dense l0/l1, reference K=32 kept at the coarse levels; same param
    # tree as teacher — any teacher checkpoint serves unchanged). ROUND-4
    # DEMOTION (trained-weight re-licensing, ROUND4_NOTES §3): on the
    # semitrained generalizing checkpoint its EPE3D delta vs exact is
    # +0.054 — OUT OF BAND (the round-3 "in band" ruling was an artifact
    # of random-init flows). These lines are therefore labeled
    # fast-but-approximate; the headline (LAST line) is the production
    # teacher, whose trained-weight delta is +7.1e-5 (14x inside band).
    # Per-variant compile/timing/printing is isolated so one preset's
    # failure cannot suppress or misattribute another's line, and no metric
    # key can be emitted twice (round-5 review finding #2).
    VARIANTS = {
        "serving": ("serving preset (cost-volume K=16 at l0/l1, K=32 "
                    "at l2/l3; teacher params)",
                    "FAST-BUT-APPROXIMATE: EPE3D +0.054 vs exact "
                    "on the semitrained trained-regime ckpt "
                    "(out of the ≤1e-3 band; ROUND4_NOTES §3)"),
        "serving_v2": ("serving_v2 preset (cost-volume K=16 at l0 only; "
                       "teacher params)",
                       "FAST-BUT-APPROXIMATE (round-5 demotion): the "
                       "round-4 single-checkpoint license does not "
                       "transfer across regimes — EPE3D +0.0023..+0.008 "
                       "at more accurate checkpoints "
                       "(evidence/round5/regime_curve.json)"),
        "serving_v3": ("serving_v3 preset (coarse-warp at l0, reference K "
                       "everywhere; teacher params)",
                       "LICENSED across the regime curve (directional "
                       "band at every checkpoint, 2 seeds, paired SEs: "
                       "EPE3D -2.9e-5 at the most accurate regime — "
                       "evidence/round5/regime_curve.json)"),
    }
    v_fwd, v_reps = {}, {}
    for vname in VARIANTS:
        try:
            v_model = BidPointFlowNet(PRESETS[vname])
            f = jax.jit(lambda v, a, b, c, d, v_model=v_model:
                        v_model.apply(v, a, b, c, d,
                                      train=False)["flows"][0])
            float(jnp.sum(f(variables, *batches[0])))
            v_fwd[vname], v_reps[vname] = f, []
        except Exception as e:  # pragma: no cover
            print(json.dumps({
                "metric": f"{vname}_eval_throughput_8192pts_bs1",
                "error": str(e)[:200]}))

    # interleaved reps: each round times every variant under the same
    # host/drift conditions; a mid-flight failure leaves every already-
    # collected rep intact (each line reports its actual rep count)
    try:
        for vname, f in v_fwd.items():
            v_reps[vname] += timed_reps(f, NBLK, 1)
        for _ in range(REPS - 1):
            teacher_reps += timed_reps(fwd, NBLK, 1)
            for vname, f in reversed(list(v_fwd.items())):
                v_reps[vname] += timed_reps(f, NBLK, 1)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "interleave_reps",
                          "error": str(e)[:200]}))

    # throughput mode: batch 3 pairs/dispatch (gathers no longer
    # degrade with batch after the flat-index rewrite, ops/gather.py)
    if "serving" in v_fwd:
        try:
            s_fwd = v_fwd["serving"]
            batches3 = [tuple(jnp.concatenate([x] * 3) for x in bb)
                        for bb in batches]
            float(jnp.sum(s_fwd(variables, *batches3[0])))
            M3 = 20
            t0 = time.time()
            out = None
            for i in range(M3):
                out = s_fwd(variables, *batches3[i % len(batches3)])
            float(jnp.sum(out))
            s3_pairs = 3 * M3 / (time.time() - t0)
            print(json.dumps({
                "metric": "serving_eval_throughput_8192pts_bs3",
                "value": round(s3_pairs, 2),
                "unit": "pairs/sec/chip",
                "vs_baseline": round(s3_pairs / BASELINE_PAIRS_PER_S, 2),
                "config": "serving preset, batch-3 throughput mode (bs=1 "
                          "latency line below is the headline)",
                "protocol": "20-dispatch amortized, single sync",
            }))
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": "serving_eval_throughput_8192pts_bs3",
                              "error": str(e)[:200]}))

    for vname, (config, deltas) in VARIANTS.items():
        reps = v_reps.get(vname)
        if not reps:
            continue
        med = float(np.median(reps))
        print(json.dumps({
            "metric": f"{vname}_eval_throughput_8192pts_bs1",
            "value": round(med, 2),
            "unit": "pairs/sec/chip",
            "vs_baseline": round(med / BASELINE_PAIRS_PER_S, 2),
            "value_min": round(min(reps), 2),
            "reps": [round(v, 2) for v in reps],
            "config": config,
            "metric_deltas": deltas,
            "loadavg_1m": round(host_load, 2),
            "protocol": PROTOCOL + "; median of %d interleaved reps"
                        % len(reps),
        }))

    # ---- HEADLINE (last line; the driver records it): the production
    # teacher — approx ff-kNN at K=32, exact FPS — whose six-metric deltas
    # vs the exact path are +7.1e-5 EPE3D on the semitrained TRAINED-regime
    # checkpoint (scripts/selftest_tpu.py --metrics, ROUND4_NOTES §3):
    # equivalent accuracy, not a relaxation. Value = MEDIAN of the
    # interleaved reps; min and all reps are reported alongside so the 5×
    # claim is falsifiable against run-to-run variance (VERDICT r4 weak #1).
    t_med = float(np.median(teacher_reps))
    if ledger is not None:
        fps_ms, knn_ms, warp_ms, up_ms = ledger
        wall_ms = 1e3 / t_med
        print(json.dumps({
            "metric": "teacher_eval_wall_ledger_ms",
            "value": round(wall_ms, 2),
            "unit": "ms/pair",
            "vs_baseline": None,
            "fps_b2_8192_to_2048": round(fps_ms, 3),
            "knn_ff_8192sq_k32_b2_cross0": round(knn_ms, 3),
            "knn_ff_8192sq_k3_b1_warp0": round(warp_ms, 3),
            "knn_ff_8192x2048_k3_b2_upsample0": round(up_ms, 3),
            "other_gathers_matmuls_pools": round(
                wall_ms - fps_ms - knn_ms - warp_ms - up_ms, 2),
            "protocol": "200-dispatch amortized, single sync; wall = "
                        "headline median",
        }))
    print(json.dumps({
        "metric": "teacher_eval_throughput_8192pts_bs1",
        "value": round(t_med, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(t_med / BASELINE_PAIRS_PER_S, 2),
        "value_min": round(min(teacher_reps), 2),
        "vs_baseline_min": round(min(teacher_reps) / BASELINE_PAIRS_PER_S, 2),
        "reps": [round(v, 2) for v in teacher_reps],
        "loadavg_1m": round(host_load, 2),
        "protocol": PROTOCOL + "; median of %d interleaved reps"
                    % len(teacher_reps),
    }))


if __name__ == "__main__":
    main()
