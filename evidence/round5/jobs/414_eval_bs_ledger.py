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

# serving preset per-batch eval cost (VERDICT r4 #7: bs=3 >= 1.5x bs=1 or
# a ledger proving the floor)
sm = BidPointFlowNet(PRESETS["serving"])
sfwd = jax.jit(lambda v, a, b, c, d: sm.apply(v, a, b, c, d, train=False)["flows"][0])
for bs in (1, 3, 6):
    bb = tuple(rep(x, bs) for x in b1)
    out[f"serving_bs{bs}_ms"] = round(timed(lambda bb=bb: sfwd(variables, *bb), 20), 3)

# train-step per-batch cost (VERDICT r4 #3: is the step compute-bound —
# per-pair cost flat with batch — or is there a scaling wall?)
from kd_pointcloud_tpu.train import TrainState, make_optimizer, make_train_step
tx = make_optimizer(1e-3)
step = make_train_step(model, tx, donate=False)
for bs in (1, 2, 3, 6, 8):
    bb = tuple(rep(x, bs) for x in b1)
    batch = dict(pos1=bb[0], pos2=bb[1], norm1=bb[2], norm2=bb[3],
                 flow=jnp.zeros_like(bb[0]))
    st = TrainState.create(variables, tx)
    st, loss = step(st, batch); float(loss)
    import time as _t
    t0 = _t.time()
    for _ in range(10):
        st, loss = step(st, batch)
    float(loss)
    out[f"train_step_bs{bs}_ms"] = round((_t.time() - t0) / 10 * 1e3, 2)
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
