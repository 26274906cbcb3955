"""Shared data protocol for the round-4 evidence harnesses.

One place defines how the bundled-KITTI scenes become train/eval batches so
scripts/train_semitrained.py (semi-trained checkpoints),
scripts/kd_effectiveness.py (KD vs scratch arms) and any future evidence
script measure on EXACTLY the same scene splits and prep:

  * scenes   = the 142 mapped bundled-KITTI scenes (KITTI(train=False)),
    loaded once into a masked full-cloud bank;
  * prep     = eval-style (transforms/transforms.py:137-203 semantics):
    ground removal (dataset loader), depth<35 mask, no-corr 8192-point
    sampling, sf = pc2 - pc1 row-wise before sampling;
  * split    = train scenes 0..99, held-out 100..141; the metric sweep
    (scripts/selftest_tpu.py --metrics) evaluates scenes 0..N of the same
    ordering, so the train subset is the accurate-flow licensing regime.
"""

from __future__ import annotations

import numpy as np

N_TRAIN_SCENES = 100
N_POINTS = 8192
EVAL_BS = 6   # 42 held-out scenes = 7 exact batches


def build_scene_bank(ds, scene_ids):
    """Masked full clouds, loaded once: ground removal (pc_loader) keeps
    pc1/pc2 rows aligned, then the depth<35 mask (also row-aligned), so
    sf = pc2 - pc1 stays a row-wise correspondence."""
    bank = []
    for i in scene_ids:
        pc1, pc2 = ds.pc_loader(ds.samples[i])
        near = np.logical_and(pc1[:, 2] < 35.0, pc2[:, 2] < 35.0)
        bank.append((pc1[near].astype(np.float32),
                     pc2[near].astype(np.float32)))
    return bank


def sample_pair(pc1, pc2, rng, n_points: int = N_POINTS):
    """Eval-style no-corr sampling: sf from idx1 rows, pos2 from idx2."""
    n = pc1.shape[0]
    idx1 = rng.choice(n, n_points, replace=n < n_points)
    idx2 = rng.choice(n, n_points, replace=n < n_points)
    return pc1[idx1], pc2[idx2], (pc2 - pc1)[idx1]


def make_batches(bank, scene_ids, rng, bs, n_points: int = N_POINTS):
    import jax.numpy as jnp

    batches = []
    for i in range(0, len(scene_ids) - len(scene_ids) % bs, bs):
        trip = [sample_pair(*bank[s], rng, n_points)
                for s in scene_ids[i:i + bs]]
        b = dict(pos1=jnp.asarray(np.stack([t[0] for t in trip])),
                 pos2=jnp.asarray(np.stack([t[1] for t in trip])),
                 flow=jnp.asarray(np.stack([t[2] for t in trip])))
        b["norm1"], b["norm2"] = b["pos1"], b["pos2"]
        batches.append(b)
    return batches


def mean_epe(eval_step, variables, batches) -> float:
    vals = []
    for b in batches:
        epe3d, _, _ = eval_step(variables, b)
        vals.extend(np.asarray(epe3d).tolist())
    return float(np.mean(vals))


def load_msgpack_tree(path: str):
    import flax

    with open(path, "rb") as fd:
        tree = flax.serialization.msgpack_restore(fd.read())
    return tree["params"], tree["batch_stats"]
