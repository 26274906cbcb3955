# Perf of the K=24@l0 candidates vs production/serving_v3, 200-dispatch
# amortized blocks, 3 interleaved reps (driver bench protocol).
import sys, time, json, dataclasses, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from kd_pointcloud_tpu.data import KITTI, ProcessData
from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet

ds = KITTI(train=False, transform=ProcessData(num_points=8192))
pc1, pc2, n1, n2, _, _ = ds[0]
b1 = tuple(jnp.asarray(x[None]) for x in (pc1, pc2, n1, n2))

T = PRESETS["teacher"]
arms = {
    "production": T,
    "serving_v3": PRESETS["serving_v3"],
    "prod_k24l0": dataclasses.replace(T, flow_nei_per_level=(24, 32, 32, 32)),
    "k24l0_cw0": dataclasses.replace(T, flow_nei_per_level=(24, 32, 32, 32),
                                     coarse_warp=(0,)),
}
fns = {}
for name, cfg in arms.items():
    model = BidPointFlowNet(cfg)
    v = jax.jit(lambda k, model=model: model.init(k, *b1, train=False))(
        jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, a, b, c, d, model=model:
                  model.apply(v, a, b, c, d, train=False)["flows"][0])
    fns[name] = (fwd, v)
    float(jnp.sum(fwd(v, *b1)))          # compile before timed reps

def block(fwd, v, m=200):
    t0 = time.time()
    r = None
    for _ in range(m):
        r = fwd(v, *b1)
    float(jnp.sum(r))
    return m / (time.time() - t0)

reps = {name: [] for name in arms}
for _ in range(3):                        # interleaved reps
    for name, (fwd, v) in fns.items():
        reps[name].append(round(block(fwd, v), 2))
out = {name: {"med": float(np.median(r)), "reps": r} for name, r in reps.items()}
out["loadavg_1m"] = round(os.getloadavg()[0], 2)
print(json.dumps(out))
