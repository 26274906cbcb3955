#!/usr/bin/env python
"""KD-effectiveness demonstration: distilled student vs the SAME student
trained without KD (VERDICT r3 #3; mirrors distilTrain.py:156-182 and the
blending-KD-beats-scratch rows of BASELINE.md).

Round-4 protocol (supersedes the first attempt, whose teacher was overfit to
the SAME 8 batches the student trained on and so had no held-out knowledge
to transfer — both arms landed at held-out EPE ~0.9 and the comparison was
noise):

  * teacher  = semitrained checkpoint (scripts/train_semitrained.py:
    teacher preset trained on bundled-KITTI scenes 0..99, best-held-out
    tree) — a teacher that actually GENERALIZES to the held-out scenes;
  * student  = fg preset (the WeightNet8_FG family of the reference's
    blending-KD table) initialized from model.init(seed 42);
  * arm "scratch": N steps of multiScaleLoss on scenes 0..99 (fresh
    resample each visit, evidence_data protocol);
  * arm "kd":      N steps of biDirection_loss_ht (gamma 0.3, beta 0.8,
    hint layer 3 — configs/distill_kd.yaml; the reference's own
    cross_biDirection_loss_ht default needs 2x-width student feats and
    raises in torch too, train/distill.py:42-50) against the frozen
    teacher — identical init, identical batch order, identical lr schedule;
  * both arms eval every EVAL_EVERY steps on HELD-OUT scenes 100..141
    (fixed seeded prep), reporting final and best EPE3D.

With --fast, runs the iterative pairing instead: semitrained bifeat teacher
-> fg student with att_iter_loss (fast_distillTrain.py:161-189 semantics).

Round-4 lesson (chip jobs 205/213): the comparison is only meaningful when
the teacher's held-out EPE beats what the student reaches from scratch in
the same horizon — a semitrained TEACHER-preset model (held-out 0.2232)
against an fg student (scratch reaches 0.106 in 3000 steps) just drags the
student toward the worse teacher. The flags below let the arms pair the
strongest semitrained family (fg/bifeat, ~0.1 regime) with the reference's
actual small students (student/student2 presets), and pick a FLOW-ONLY KD
loss (biDirectionLoss — loss_functions.py:53-66) when teacher/student
feature widths differ (hint losses require equal hint-layer widths, in
torch exactly as here).

Usage: python scripts/kd_effectiveness.py [--fast] [--steps N] [--bs B]
           [--teacher PRESET] [--student PRESET] [--loss NAME] [--tag SUFFIX]
"""

from __future__ import annotations

import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

from evidence_data import (EVAL_BS, N_TRAIN_SCENES, build_scene_bank,
                           load_msgpack_tree, make_batches, mean_epe)

FIXTURE_DIR = "/tmp/kdpc_train_parity"
EVAL_EVERY = 250
GAMMA, BETA, HINT_LAYER = 0.3, 0.8, 3     # configs/distill_kd.yaml


def run_arm(step_fn, state, t_variables, next_batch, eval_step, eval_batches,
            n_steps, set_lr, tag):
    curve = []
    best = float("inf")
    for i in range(n_steps):
        b = next_batch(i)
        if t_variables is None:
            state, loss = step_fn(state, b)
        else:
            state, loss = step_fn(state, t_variables, b)
        if (i + 1) % 50 == 0:
            # bound the async dispatch backlog: block_until_ready is a
            # no-op on this remote backend, so force a host transfer. An
            # unbounded enqueue loop floods the remote tunnel (round-4
            # incident: the tunnel stopped draining mid-job and the client
            # ballooned to 130 GB rss before the OOM killer fired).
            float(loss)
        if i == int(n_steps * 0.5) or i == int(n_steps * 0.75):
            state = set_lr(state, 0.5)
        if (i + 1) % EVAL_EVERY == 0 or i == n_steps - 1:
            epe = mean_epe(eval_step, state.variables, eval_batches)
            best = min(best, epe)
            curve.append((i + 1, epe))
            print(f"{tag} step {i + 1}: loss {float(loss):.4f} "
                  f"held-out epe {epe:.4f}", flush=True)
    return state, curve, best


def main():
    import jax

    from kd_pointcloud_tpu.data import KITTI, ProcessData
    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
    from kd_pointcloud_tpu.train import (TrainState, make_distill_step,
                                         make_eval_step,
                                         make_fast_distill_step,
                                         make_optimizer, make_train_step,
                                         set_learning_rate)
    from kd_pointcloud_tpu.train.distill_experiment import make_named_loss

    def _arg(flag, default):
        return (sys.argv[sys.argv.index(flag) + 1]
                if flag in sys.argv else default)

    fast = "--fast" in sys.argv
    n_steps = int(_arg("--steps", 3000))
    bs = int(_arg("--bs", 4))
    s_preset = _arg("--student", "fg")
    loss_name = _arg("--loss", "biDirection_loss_ht")
    # reference hint layers for the shipped standard pairing are [2, 3]
    # (distilTrain.py:174); default keeps the round-4 single-layer protocol
    hint_layers = [int(x) for x in _arg("--hint", str(HINT_LAYER)).split(",")]
    tag = _arg("--tag", "")
    # --seed offsets the student init AND the (arm-shared) batch stream —
    # a full independent replicate of the paired two-arm protocol; the
    # held-out eval batches stay fixed so EPEs are comparable across seeds
    seed = int(_arg("--seed", 0))

    ds = KITTI(train=False, transform=ProcessData(num_points=8192))
    bank = build_scene_bank(ds, range(len(ds)))
    train_ids = list(range(N_TRAIN_SCENES))
    held_ids = list(range(N_TRAIN_SCENES, len(ds)))
    eval_batches = make_batches(bank, held_ids, np.random.default_rng(11),
                                EVAL_BS)

    t_preset = _arg("--teacher", "bifeat" if fast else "teacher")
    t_model = BidPointFlowNet(PRESETS[t_preset])
    from kd_pointcloud_tpu.utils.fixtures import fixture_path
    if "--teacher-ckpt" in sys.argv:            # don't hydrate an unused
        t_ckpt = _arg("--teacher-ckpt", None)   # 17-31 MB fixture copy
    else:
        t_ckpt = (fixture_path(f"semitrained_{t_preset}.msgpack")
                  or osp.join(FIXTURE_DIR,
                              f"semitrained_{t_preset}.msgpack"))
    t_params, t_stats = load_msgpack_tree(t_ckpt)
    # device_put ONCE: msgpack_restore yields host numpy, and passing a
    # host tree to a jitted step re-ships the ENTIRE teacher tree (~32 MB)
    # through the remote-TPU tunnel on EVERY call — 3000 KD steps would
    # push ~95 GB and was the round-4 tunnel-wedge root cause (job 213).
    t_variables = jax.device_put(
        {"params": t_params, "batch_stats": t_stats})

    s_model = BidPointFlowNet(PRESETS[s_preset])
    probe = make_batches(bank, train_ids[:bs], np.random.default_rng(0), bs)
    s_init = jax.jit(lambda k: s_model.init(
        k, probe[0]["pos1"], probe[0]["pos2"], probe[0]["norm1"],
        probe[0]["norm2"], train=False))(jax.random.PRNGKey(42 + seed))
    tx = make_optimizer(1e-3, 1e-4)
    eval_step = make_eval_step(s_model)

    def set_lr(state, factor):
        return state.replace(opt_state=set_learning_rate(
            state.opt_state,
            float(state.opt_state.hyperparams["lr"]) * factor))

    def make_batch_stream():
        """Identical batch stream for both arms: seeded permutations of the
        train scenes, fresh point resample each visit."""
        rng = np.random.default_rng(7 + seed)
        queue = []

        def next_batch(_i):
            if not queue:
                order = rng.permutation(train_ids)
                queue.extend(make_batches(bank, list(order), rng, bs))
            return queue.pop()

        return next_batch

    print(f"backend={jax.default_backend()} mode="
          f"{'fast/att_iter' if fast else f'standard/{loss_name}'} "
          f"steps={n_steps} bs={bs} teacher=semitrained_{t_preset} "
          f"student={s_preset}", flush=True)
    t_held = None
    try:
        t_eval = make_eval_step(t_model)
        t_held = mean_epe(t_eval, t_variables, eval_batches)
        print(f"teacher held-out epe {t_held:.4f}", flush=True)
    except Exception as e:
        print(f"teacher eval skipped: {e}", flush=True)

    # ---- scratch arm
    state = TrainState.create(s_init, tx)
    scratch_step = make_train_step(s_model, tx, donate=False)
    _, scratch_curve, scratch_best = run_arm(
        scratch_step, state, None, make_batch_stream(), eval_step,
        eval_batches, n_steps, set_lr, "scratch")

    # ---- KD arm (same init, same batch order)
    state = TrainState.create(s_init, tx)
    if fast:
        kd_step = make_fast_distill_step(t_model, s_model, tx,
                                         gamma=0.6, layers=(1, 2))
    else:
        named = make_named_loss(loss_name,
                                {"gamma": GAMMA, "beta": BETA,
                                 "hint_layers": hint_layers})
        kd_step = make_distill_step(
            t_model, s_model, tx,
            loss_fn=lambda s_out, t_out, b: named(s_out, t_out, b))
    _, kd_curve, kd_best = run_arm(
        kd_step, state, t_variables, make_batch_stream(), eval_step,
        eval_batches, n_steps, set_lr, "kd")

    suffix = ("_fast" if fast else "") + tag
    np.savez(osp.join(FIXTURE_DIR, f"kd_effectiveness{suffix}.npz"),
             scratch=np.asarray(scratch_curve), kd=np.asarray(kd_curve))
    verdict = {
        "mode": "fast" if fast else "standard",
        "teacher": t_preset, "student": s_preset,
        "loss": "att_iter" if fast else loss_name,
        "hint_layers": None if fast else hint_layers,
        "teacher_ckpt": t_ckpt,
        "steps": n_steps,
        "teacher_held_out_epe": (round(t_held, 4)
                                 if t_held is not None else None),
        "scratch_final_epe": round(scratch_curve[-1][1], 4),
        "scratch_best_epe": round(scratch_best, 4),
        "kd_final_epe": round(kd_curve[-1][1], 4),
        "kd_best_epe": round(kd_best, 4),
        "kd_beats_scratch_final": kd_curve[-1][1] < scratch_curve[-1][1],
        "kd_beats_scratch_best": kd_best < scratch_best,
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
