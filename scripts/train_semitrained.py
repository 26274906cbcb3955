#!/usr/bin/env python
"""Train a GENERALIZING semi-trained checkpoint on the bundled KITTI scenes.

Why this exists (round-4 finding): the 16-scene/400-step overfit checkpoint
(tests/make_train_parity_fixture.py `overfit` mode) descends to train-mode
EPE ~0.07 on its own batches but scores EPE3D ~0.73 on the 50-scene eval
sweep — as far from the reference's trained regime (0.031) as the random
init it was meant to replace. Approximation licensing (VERDICT r3 #2) needs
metric deltas measured where the model's flows are ACCURATE, because error
cascades through warp/upsample scale with flow error.

Protocol:
  * data    = the 142 mapped bundled-KITTI scenes (the repo's only shipped
    real data; eval-style prep, transforms/transforms.py:137-203 semantics);
  * train   on scenes 0..99, fresh 8192-point resample every visit;
  * held-out = scenes 100..141, fixed seeded prep — generalization signal
    for the KD-effectiveness experiments (scripts/kd_effectiveness.py);
  * train-subset eval on scenes 0..49 with the SAME fixed prep the metric
    sweep uses (scripts/selftest_tpu.py --metrics evaluates KITTI
    train=False scenes 0..N) — this is the accurate-flow regime that
    licenses the approx/serving bands;
  * Adam(lr 1e-3, wd 1e-4) with lr halved at 50% / 75% of the horizon
    (train_bid_pointconv.py:117-124 optimizer semantics; StepLR's epoch-100
    boundary never lands inside a short horizon, so the halvings stand in
    for it).

Writes to the fixture dir (/tmp/kdpc_train_parity):
  semitrained_<preset>.msgpack        best-held-out {params, batch_stats}
  semitrained_<preset>_final.msgpack  final-step tree
  semitrained_<preset>_curve.npz      step losses + eval curves

Usage: python scripts/train_semitrained.py [preset] [--steps N] [--bs B]
"""

from __future__ import annotations

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

from evidence_data import (EVAL_BS, N_POINTS, N_TRAIN_SCENES,
                           build_scene_bank, make_batches, mean_epe)

FIXTURE_DIR = "/tmp/kdpc_train_parity"
TRAINSUB_SCENES = 50  # scenes 0..49 — the metric sweep's scene set


def main():
    import flax
    import jax

    from kd_pointcloud_tpu.data import KITTI, ProcessData
    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
    from kd_pointcloud_tpu.train import (TrainState, make_eval_step,
                                         make_optimizer, make_train_step,
                                         set_learning_rate)

    preset = next((a for a in sys.argv[1:] if not a.startswith("--")),
                  "teacher")
    n_steps = (int(sys.argv[sys.argv.index("--steps") + 1])
               if "--steps" in sys.argv else 6000)
    bs = (int(sys.argv[sys.argv.index("--bs") + 1])
          if "--bs" in sys.argv else 4)
    # --seed shifts BOTH the init key and the data streams (regime-curve
    # licensing, VERDICT r4 #4: deltas need >=2 seeds for error bars);
    # seed 0 reproduces the round-4 runs bit-for-bit.
    seed = (int(sys.argv[sys.argv.index("--seed") + 1])
            if "--seed" in sys.argv else 0)
    # --save-at "2000,4500,9000": additionally persist the CURRENT tree at
    # these step counts (semitrained_<preset>_s<seed>_step<k>.msgpack) —
    # the regime-curve checkpoints the licensing sweep consumes.
    save_at = ([int(x) for x in
                sys.argv[sys.argv.index("--save-at") + 1].split(",")]
               if "--save-at" in sys.argv else [])
    # --tag SUFFIX: append to every output fixture name (continuation runs
    # must not overwrite the checkpoint they started from)
    tag = (sys.argv[sys.argv.index("--tag") + 1]
           if "--tag" in sys.argv else "")
    eval_every = max(200, n_steps // 12)

    ds = KITTI(train=False, transform=ProcessData(num_points=N_POINTS))
    n_scenes = len(ds)
    train_ids = list(range(N_TRAIN_SCENES))
    held_ids = list(range(N_TRAIN_SCENES, n_scenes))
    bank = build_scene_bank(ds, range(n_scenes))

    # fixed seeded eval preps: held-out generalization + train-subset
    # (accurate-flow regime, the metric sweep's scenes)
    eval_rng = np.random.default_rng(11)
    held_batches = make_batches(bank, held_ids, eval_rng, EVAL_BS)
    trainsub_batches = make_batches(bank, list(range(TRAINSUB_SCENES)),
                                    np.random.default_rng(12), EVAL_BS)

    model = BidPointFlowNet(PRESETS[preset])
    b0 = make_batches(bank, train_ids[:bs], np.random.default_rng(0), bs)[0]
    variables = jax.jit(lambda k: model.init(
        k, b0["pos1"], b0["pos2"], b0["norm1"], b0["norm2"],
        train=False))(jax.random.PRNGKey(seed))
    # --init-from PATH: continue from a saved {params, batch_stats} tree
    # (fresh Adam state; pair with --lr set to the prior run's decayed
    # value so the warm restart doesn't blow up early steps) — used to
    # extend the licensing regime curve toward the reference's trained
    # regime without repaying the full schedule.
    init_from = (sys.argv[sys.argv.index("--init-from") + 1]
                 if "--init-from" in sys.argv else None)
    if init_from:
        from evidence_data import load_msgpack_tree
        p0, s0 = load_msgpack_tree(init_from)
        variables = {"params": p0, "batch_stats": s0}
        print(f"init from {init_from}", flush=True)
    lr0 = (float(sys.argv[sys.argv.index("--lr") + 1])
           if "--lr" in sys.argv else 1e-3)
    tx = make_optimizer(lr0, 1e-4)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    print(f"backend={jax.default_backend()} preset={preset} steps={n_steps} "
          f"bs={bs} train_scenes={len(train_ids)} held={len(held_ids)}",
          flush=True)

    train_rng = np.random.default_rng(7 + 1000 * seed)
    losses, held_curve, trainsub_curve = [], [], []
    best = (float("inf"), None)
    queue = []

    def _dump(path_suffix):
        tree = {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}
        p = osp.join(FIXTURE_DIR, f"semitrained_{preset}{path_suffix}"
                     ".msgpack")
        with open(p, "wb") as fd:
            fd.write(flax.serialization.to_bytes(tree))
        print(f"saved {p}", flush=True)

    for step_i in range(n_steps):
        if not queue:
            order = train_rng.permutation(train_ids)
            queue = make_batches(bank, list(order), train_rng, bs)
        state, loss = train_step(state, queue.pop())
        losses.append(float(loss))
        if (step_i + 1) in save_at:
            _dump(f"_s{seed}{tag}_step{step_i + 1}")
        if step_i == int(n_steps * 0.5) or step_i == int(n_steps * 0.75):
            state = state.replace(opt_state=set_learning_rate(
                state.opt_state,
                float(state.opt_state.hyperparams["lr"]) * 0.5))
            print(f"step {step_i}: lr halved", flush=True)
        if (step_i + 1) % eval_every == 0 or step_i == n_steps - 1:
            held = mean_epe(eval_step, state.variables, held_batches)
            tsub = mean_epe(eval_step, state.variables, trainsub_batches)
            held_curve.append((step_i + 1, held))
            trainsub_curve.append((step_i + 1, tsub))
            print(f"step {step_i + 1}: loss {losses[-1]:.3f} "
                  f"held-out epe {held:.4f} train-sub epe {tsub:.4f}",
                  flush=True)
            if held < best[0]:
                tree = {"params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)}
                best = (held, flax.serialization.to_bytes(tree))

    sfx = ("" if seed == 0 else f"_s{seed}") + tag
    with open(osp.join(FIXTURE_DIR, f"semitrained_{preset}{sfx}.msgpack"),
              "wb") as fd:
        fd.write(best[1])
    final_tree = {"params": jax.device_get(state.params),
                  "batch_stats": jax.device_get(state.batch_stats)}
    with open(osp.join(FIXTURE_DIR,
                       f"semitrained_{preset}{sfx}_final.msgpack"),
              "wb") as fd:
        fd.write(flax.serialization.to_bytes(final_tree))
    np.savez(osp.join(FIXTURE_DIR, f"semitrained_{preset}{sfx}_curve.npz"),
             losses=np.asarray(losses, np.float64),
             held=np.asarray(held_curve, np.float64),
             trainsub=np.asarray(trainsub_curve, np.float64))
    # a multi-hour run must survive a host wipe the moment it finishes
    # (VERDICT r4 weak #5; utils/fixtures.py contract) — persist best +
    # curve in-repo immediately. Pass --no-persist for throwaway probes
    # (the 31.8 MB best tree is the licensing fixture; _final and the
    # --save-at regime dumps stay /tmp-only unless persisted by hand,
    # ADVICE r4 #4 blob-bloat tradeoff, regeneration documented here).
    if "--no-persist" not in sys.argv:
        from kd_pointcloud_tpu.utils.fixtures import persist_fixture
        for name in (f"semitrained_{preset}{sfx}.msgpack",
                     f"semitrained_{preset}{sfx}_curve.npz"):
            print(f"persisted {persist_fixture(name)}", flush=True)
    print(f"done: best held-out epe {best[0]:.4f}; final train-sub epe "
          f"{trainsub_curve[-1][1]:.4f} -> semitrained_{preset}.msgpack",
          flush=True)


if __name__ == "__main__":
    main()
