# Validate the fixed wall ledger (commit dc63a8c: precompute both_rev so the
# eager per-call reversal doesn't inflate the cross0 kNN line to 9.26 ms /
# remainder -8.0 as in job 416's artifact). Mirrors bench.py:308-356 exactly.
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from kd_pointcloud_tpu.data import KITTI, ProcessData
from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
from kd_pointcloud_tpu.ops.pallas.fps_pallas import furthest_point_sample_pallas
from kd_pointcloud_tpu.ops.pallas.knn_fused import knn_fused

ds = KITTI(train=False, transform=ProcessData(num_points=8192))
pc1, pc2, n1, n2, _, _ = ds[0]
b1 = tuple(jnp.asarray(x[None]) for x in (pc1, pc2, n1, n2))
model = BidPointFlowNet(PRESETS["teacher"])
variables = jax.jit(lambda k: model.init(k, *b1, train=False))(jax.random.PRNGKey(0))
fwd = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False)["flows"][0])

def timed(fn, m=200):
    float(jnp.sum(fn()))
    t0 = time.time()
    r = None
    for _ in range(m):
        r = fn()
    float(jnp.sum(r))
    return (time.time() - t0) / m * 1e3

# model wall, same 200-dispatch protocol
model_ms = timed(lambda: fwd(variables, *b1))

both = jnp.concatenate([b1[0], b1[1]])
both_rev = jnp.concatenate([b1[1], b1[0]])
fps_ms = timed(lambda: furthest_point_sample_pallas(both, 2048))
knn_ms = timed(lambda: knn_fused(both, both_rev, 32, tq=512, mode="ff", fuse_min=True)[1])
warp_ms = timed(lambda: knn_fused(b1[1], b1[0], 3, tq=512, mode="ff", fuse_min=True)[1])
up_keys = jnp.concatenate([b1[0][:, :2048], b1[1][:, :2048]])
up_ms = timed(lambda: knn_fused(both, up_keys, 3, tq=256, mode="ff", fuse_min=True)[1])
out = {
    "model_ms": round(model_ms, 3),
    "fps_b2_8192_to_2048": round(fps_ms, 3),
    "knn_ff_8192sq_k32_b2_cross0": round(knn_ms, 3),
    "knn_ff_8192sq_k3_b1_warp0": round(warp_ms, 3),
    "knn_ff_8192x2048_k3_b2_upsample0": round(up_ms, 3),
    "other_gathers_matmuls_pools": round(model_ms - fps_ms - knn_ms - warp_ms - up_ms, 2),
}
import os
out["loadavg_1m"] = round(os.getloadavg()[0], 2)
print(json.dumps(out))
