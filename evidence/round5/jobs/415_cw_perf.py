# Coarse-warp variants: bs=1 eval throughput (pairs with regime-curve licensing).
import sys, time, json, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from kd_pointcloud_tpu.data import KITTI, ProcessData
from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet

ds = KITTI(train=False, transform=ProcessData(num_points=8192))
batches = []
for i in range(4):
    pc1, pc2, n1, n2, _, _ = ds[i]
    batches.append(tuple(jnp.asarray(x[None]) for x in (pc1, pc2, n1, n2)))
teacher = PRESETS["teacher"]
cfgs = {
    "production": teacher,
    "prod_cw0": dataclasses.replace(teacher, coarse_warp=(0,)),
    "serving_v2": PRESETS["serving_v2"],
    "v2_cw0": dataclasses.replace(teacher, flow_nei_per_level=(16, 32, 32, 32),
                                  coarse_warp=(0,)),
    "v2_cw01": dataclasses.replace(teacher, flow_nei_per_level=(16, 32, 32, 32),
                                   coarse_warp=(0, 1)),
}
variables = None
fwds = {}
for name, cfg in cfgs.items():
    m = BidPointFlowNet(cfg)
    if variables is None:
        variables = jax.jit(lambda k, mm=m: mm.init(k, *batches[0], train=False))(jax.random.PRNGKey(0))
    fwds[name] = jax.jit(lambda v, a, b, c, d, mm=m: mm.apply(v, a, b, c, d, train=False)["flows"][0])
    float(jnp.sum(fwds[name](variables, *batches[0])))

def block(f, n=40):
    t0 = time.time()
    out = None
    for i in range(n):
        out = f(variables, *batches[i % 4])
    float(jnp.sum(out))
    return n / (time.time() - t0)

res = {n: [] for n in cfgs}
for rep in range(4):
    for n, f in fwds.items():
        res[n].append(round(block(f), 2))
import os
print(json.dumps({"loadavg": os.getloadavg()[0]}))
print(json.dumps({n: {"med": float(np.median(v)), "reps": v} for n, v in res.items()}))
