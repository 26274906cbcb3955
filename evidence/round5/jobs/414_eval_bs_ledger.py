# Eval batch-scaling ledger (VERDICT r4 #7): where does bs=3 lose the 3x?
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from kd_pointcloud_tpu.data import KITTI, ProcessData
from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
from kd_pointcloud_tpu.ops.pallas.knn_fused import knn_fused
from kd_pointcloud_tpu.ops.pallas.fps_pallas import furthest_point_sample_pallas
from kd_pointcloud_tpu.ops.gather import group_points_kmajor_packed

ds = KITTI(train=False, transform=ProcessData(num_points=8192))
pc1, pc2, n1, n2, _, _ = ds[0]
b1 = tuple(jnp.asarray(x[None]) for x in (pc1, pc2, n1, n2))
def rep(x, bs): return jnp.concatenate([x] * bs)
model = BidPointFlowNet(PRESETS["teacher"])
variables = jax.jit(lambda k: model.init(k, *b1, train=False))(jax.random.PRNGKey(0))
fwd = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False)["flows"][0])

def timed(fn, n=30):
    float(jnp.sum(fn()))
    t0 = time.time()
    for _ in range(n): r = fn()
    float(jnp.sum(r))
    return (time.time() - t0) / n * 1e3

out = {}
for bs in (1, 2, 3, 6):
    bb = tuple(rep(x, bs) for x in b1)
    out[f"model_bs{bs}_ms"] = round(timed(lambda bb=bb: fwd(variables, *bb), 20), 3)
# kernels vs batch: kNN 8192^2 (cross stacks 2B), FPS (2B), gather (pool shape)
q = b1[0]; k_ = b1[1]
rng = np.random.RandomState(0)
idx32 = np.asarray(knn_fused(q, k_, 32, mode="ff", fuse_min=True)[1])
u = jnp.asarray(rng.randn(1, 8192, 64).astype(np.float32))
for B in (2, 4, 6, 12):
    qq, kk = rep(q, B), rep(k_, B)
    out[f"knn_ff_B{B}_ms"] = round(timed(lambda qq=qq, kk=kk: knn_fused(qq, kk, 32, mode="ff", fuse_min=True, tq=512)[1]), 3)
    out[f"fps_B{B}_ms"] = round(timed(lambda qq=qq: furthest_point_sample_pallas(qq, 2048)), 3)
    uB = rep(u, B); iB = jnp.asarray(np.concatenate([idx32] * B))
    out[f"gather_kmaj_B{B}_ms"] = round(timed(lambda uB=uB, iB=iB: group_points_kmajor_packed(uB, iB, 2)), 3)
import os
out["loadavg"] = round(os.getloadavg()[0], 2)
print(json.dumps(out))
