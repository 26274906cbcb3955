# Decompose the 4.85 ms "other" (job 417 ledger): sensitivity of the teacher
# forward wall to each width knob. Each arm changes ONE dimension family;
# the delta vs baseline bounds that family's share of the wall. Probe-only
# (semantics change) — NOT licensing anything.
import sys, time, json, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from kd_pointcloud_tpu.data import KITTI, ProcessData
from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet

ds = KITTI(train=False, transform=ProcessData(num_points=8192))
pc1, pc2, n1, n2, _, _ = ds[0]
b1 = tuple(jnp.asarray(x[None]) for x in (pc1, pc2, n1, n2))

def timed(fn, m=100):
    float(jnp.sum(fn()))
    t0 = time.time()
    r = None
    for _ in range(m):
        r = fn()
    float(jnp.sum(r))
    return (time.time() - t0) / m * 1e3

T = PRESETS["teacher"]
arms = {
    "teacher": T,
    # cost-volume K at every level (cross pools + their gathers/weightnets)
    "cv_k16_all": dataclasses.replace(T, flow_nei_per_level=(16, 16, 16, 16)),
    # pointconv grouping width (encoder/decoder grouping gathers + convs)
    "feat_nei8": dataclasses.replace(T, feat_nei=8),
    # weightnet width (the per-neighbor MLP + the W-contraction matmul)
    "weightnet8": dataclasses.replace(T, weightnet=(8, 8, 8, 8, 8),
                                      flow_weightnet=(8, 8, 8, 8)),
    # feature channel widths (all matmuls + HBM activation traffic)
    "chan_half": dataclasses.replace(
        T, level_channels=(16, 32, 64, 128, 128),
        lift_channels=(32, 64, 128, 256), deconv=(32, 32, 16, 16),
        flow0_channels=(64, 64), flow0_mlp=(64, 32)),
}
out = {}
for name, cfg in arms.items():
    model = BidPointFlowNet(cfg)
    v = jax.jit(lambda k, model=model: model.init(k, *b1, train=False))(
        jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, a, b, c, d, model=model:
                  model.apply(v, a, b, c, d, train=False)["flows"][0])
    out[name] = round(timed(lambda: fwd(v, *b1)), 3)
    print(name, out[name], flush=True)
import os
out["loadavg_1m"] = round(os.getloadavg()[0], 2)
print(json.dumps(out))
