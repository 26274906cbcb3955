"""KD-effectiveness demonstration on bundled KITTI (VERDICT r2 #6).

End-to-end evidence that the KD losses actually DISTILL rather than merely
compute: train a teacher briefly on bundled KITTI scenes, then train two
identically-seeded students on the same stream — one with the plain
multi-scale flow loss, one with cross_biDirection_loss_ht distillation from
the frozen teacher (the reference's standard KD recipe,
distilTrain.py:165-182) — and compare val EPE3D.

Data: the 200 bundled preprocessed KITTI scenes (reference
datasets/kitti_processed); scenes 42..141 train, 0..41 validation.
Everything runs on whatever backend jax selects (intended: the real chip
via scripts/tpu_worker.py).

Prints one JSON line: teacher/val-EPE, student-no-KD val EPE, student-KD
val EPE, and the relative improvement.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def run(teacher_steps: int = 300, student_steps: int = 150,
        batch_size: int = 4, n_val: int = 42, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from kd_pointcloud_tpu.data import KITTI, ProcessData
    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
    from kd_pointcloud_tpu.train import (TrainState, make_optimizer,
                                         make_train_step)
    from kd_pointcloud_tpu.train.distill import make_distill_step
    from kd_pointcloud_tpu.train.distill_experiment import make_named_loss
    from kd_pointcloud_tpu.utils import Config

    ds = KITTI(train=False, transform=ProcessData(num_points=8192))
    n = len(ds)
    val_ids = list(range(min(n_val, n)))
    train_ids = list(range(len(val_ids), n))

    def scene(i):
        pc1, pc2, n1, n2, sf, _ = ds[i]
        return pc1, pc2, n1, n2, sf

    train_scenes = [scene(i) for i in train_ids]
    val_scenes = [scene(i) for i in val_ids]

    rng = np.random.RandomState(seed)

    def batches(num_steps, order_seed):
        r = np.random.RandomState(order_seed)
        for _ in range(num_steps):
            ids = r.randint(0, len(train_scenes), size=batch_size)
            cols = list(zip(*[train_scenes[j] for j in ids]))
            yield {k: jnp.asarray(np.stack(c)) for k, c in
                   zip(("pos1", "pos2", "norm1", "norm2", "flow"), cols)}

    def init_vars(model, key):
        b0 = next(batches(1, 0))
        return jax.jit(lambda k: model.init(
            k, b0["pos1"], b0["pos2"], b0["norm1"], b0["norm2"],
            train=False))(key)

    def val_epe(model, variables):
        fwd = jax.jit(lambda v, a, b, c, d: model.apply(
            v, a, b, c, d, train=False)["flows"][0])
        errs = []
        for pc1, pc2, n1, n2, sf in val_scenes:
            pred = fwd(variables, *(jnp.asarray(x[None])
                                    for x in (pc1, pc2, n1, n2)))
            errs.append(float(jnp.mean(jnp.linalg.norm(
                pred[0] - jnp.asarray(sf), axis=-1))))
        return float(np.mean(errs))

    t_model = BidPointFlowNet(PRESETS["teacher"])
    s_model = BidPointFlowNet(PRESETS["lighttoken_res"])

    # ---- teacher
    tx = make_optimizer(1e-3)
    t_state = TrainState.create(init_vars(t_model, jax.random.PRNGKey(seed)),
                                tx)
    t_step = make_train_step(t_model, tx, donate=False)
    for b in batches(teacher_steps, order_seed=seed + 1):
        t_state, t_loss = t_step(t_state, b)
    t_vars = {"params": t_state.params, "batch_stats": t_state.batch_stats}
    teacher_epe = val_epe(t_model, t_vars)
    random_epe = val_epe(t_model, init_vars(
        t_model, jax.random.PRNGKey(seed + 99)))

    # ---- students: identical init, identical batch order
    s_init = init_vars(s_model, jax.random.PRNGKey(seed + 7))
    results = {}

    s_tx = make_optimizer(1e-3)
    s_state = TrainState.create(s_init, s_tx)
    plain_step = make_train_step(s_model, s_tx, donate=False)
    for b in batches(student_steps, order_seed=seed + 2):
        s_state, _ = plain_step(s_state, b)
    results["student_plain_epe"] = val_epe(s_model, {
        "params": s_state.params, "batch_stats": s_state.batch_stats})

    s_state = TrainState.create(s_init, s_tx)
    # the shipped teacher→lighttoken_res recipe's loss
    # (configs/distill_kd.yaml kd_loss: biDirection_loss_ht; the distilTrain
    # default cross_biDirection_loss_ht needs the double-width student)
    named = make_named_loss("biDirection_loss_ht", Config({}))
    kd_step = make_distill_step(
        t_model, s_model, s_tx,
        loss_fn=lambda s_out, t_out, bb: named(s_out, t_out, bb))
    for b in batches(student_steps, order_seed=seed + 2):
        s_state, _ = kd_step(s_state, t_vars, b)
    results["student_kd_epe"] = val_epe(s_model, {
        "params": s_state.params, "batch_stats": s_state.batch_stats})

    out = dict(
        metric="kd_effectiveness_demo",
        teacher_steps=teacher_steps, student_steps=student_steps,
        batch_size=batch_size, n_train=len(train_scenes),
        n_val=len(val_scenes),
        random_init_epe=round(random_epe, 4),
        teacher_epe=round(teacher_epe, 4),
        **{k: round(v, 4) for k, v in results.items()},
    )
    out["kd_improvement"] = round(
        results["student_plain_epe"] - results["student_kd_epe"], 4)
    return out


def main() -> int:
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    print(json.dumps(run(**kw)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
