# Latency-floor probe: forward wall of the SAME op graph at shrinking point
# counts. As N -> tiny, throughput terms (matmuls/gathers, ~O(N)) vanish and
# what remains is the per-op sequencing latency of the ~600-op program —
# bounding the payoff of any future small-level megakernel fusion.
import sys, time, json, os, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
from kd_pointcloud_tpu.models.config import tiny_config

def timed(fn, m=200):
    float(jnp.sum(fn()))
    t0 = time.time()
    r = None
    for _ in range(m):
        r = fn()
    float(jnp.sum(r))
    return (time.time() - t0) / m * 1e3

out = {}
for label, cfg, n in [
        ("teacher_8192", PRESETS["teacher"], 8192),
        ("half_4096", dataclasses.replace(
            PRESETS["teacher"], name="half",
            npoints=(4096, 1024, 256, 128, 32)), 4096),
        ("quarter_2048", dataclasses.replace(
            PRESETS["teacher"], name="quarter",
            npoints=(2048, 512, 128, 64, 16)), 2048),
        ("tiny_512", dataclasses.replace(
            tiny_config("teacher", npoints=(512, 256, 128, 64, 32)),
            ), 512),
]:
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(1, n, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(1, n, 3).astype(np.float32))
    model = BidPointFlowNet(cfg)
    v = jax.jit(lambda k, model=model, a=a, b=b:
                model.init(k, a, b, a, b, train=False))(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, a, b, model=model:
                  model.apply(v, a, b, a, b, train=False)["flows"][0])
    out[label] = round(timed(lambda: fwd(v, a, b)), 3)
    print(label, out[label], flush=True)
out["loadavg_1m"] = round(os.getloadavg()[0], 2)
print(json.dumps(out))
