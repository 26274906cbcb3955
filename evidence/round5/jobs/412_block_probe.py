# Dispatch-block-length probe: is today's lower bench a ramp/idle-clock artifact?
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from kd_pointcloud_tpu.data import KITTI, ProcessData
from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet

model = BidPointFlowNet(PRESETS["teacher"])
ds = KITTI(train=False, transform=ProcessData(num_points=8192))
batches = []
for i in range(4):
    pc1, pc2, n1, n2, _, _ = ds[i]
    batches.append(tuple(jnp.asarray(x[None]) for x in (pc1, pc2, n1, n2)))
variables = jax.jit(lambda k: model.init(k, *batches[0], train=False))(jax.random.PRNGKey(0))
fwd = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False)["flows"][0])
float(jnp.sum(fwd(variables, *batches[0])))

def block(n):
    t0 = time.time()
    out = None
    for i in range(n):
        out = fwd(variables, *batches[i % 4])
    float(jnp.sum(out))
    return n / (time.time() - t0)

res = {}
for n in (20, 20, 50, 100, 200, 20, 100):
    key = f"n{n}"
    res.setdefault(key, []).append(round(block(n), 2))
import os
print(json.dumps({"loadavg": os.getloadavg()[0], "blocks": res}))
# also: back-to-back 20-blocks with NO gap vs 2s sleep gaps (idle-clock probe)
nogap = [round(block(20), 2) for _ in range(5)]
gap = []
for _ in range(5):
    time.sleep(2.0)
    gap.append(round(block(20), 2))
print(json.dumps({"nogap_20blocks": nogap, "gap2s_20blocks": gap}))
