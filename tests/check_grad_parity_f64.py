"""Float64 gradient-parity checker (run as a subprocess: enabling jax x64 is
process-global, so it must not run inside the main test process).

Computes our step-1 gradients in float64 on the train-parity fixture's batch 0
and compares against the torch float64 gradients (grads64.pth). Agreement at
~1e-9 proves the backward MATH is identical and any f32 grad deltas are pure
rounding. Prints one line: `worst <rel> <leaf>` (BN-fed bias leaves, whose
true gradient is mathematically zero, are checked absolutely instead).
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses  # noqa: E402

import flax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(fixture_dir: str):
    from kd_pointcloud_tpu.losses import multi_scale_loss
    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
    from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint

    params, stats = load_torch_checkpoint(osp.join(fixture_dir, "init.pth"))
    as64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float64), t)
    params, stats = as64(params), as64(stats)

    z = np.load(osp.join(fixture_dir, "train.npz"))
    b = {k: jnp.asarray(z[f"b0_{k}"], jnp.float64)
         for k in ("pos1", "pos2", "flow")}

    cfg = dataclasses.replace(PRESETS["teacher"], knn_method="exact",
                              knn_precision="highest")
    model = BidPointFlowNet(cfg)

    def compute(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats},
            b["pos1"], b["pos2"], b["pos1"], b["pos2"],
            train=True, mutable=["batch_stats"])
        return multi_scale_loss(out["flows"], b["flow"], out["fps_idx1"])

    loss, grads = jax.jit(jax.value_and_grad(compute))(params)
    tgrads, _ = load_torch_checkpoint(osp.join(fixture_dir, "grads64.pth"))

    ours = flax.traverse_util.flatten_dict(grads)
    theirs = flax.traverse_util.flatten_dict(tgrads)
    assert set(ours) == set(theirs)
    gnorm = float(np.sqrt(sum(float(jnp.sum(jnp.square(v)))
                              for v in theirs.values())))
    worst, worst_key = 0.0, None
    for k in ours:
        a = np.asarray(ours[k], np.float64)
        t = np.asarray(theirs[k], np.float64)
        tn = np.linalg.norm(t)
        if tn < 1e-12 * gnorm:
            # mathematically-zero gradient (e.g. Dense bias feeding a
            # train-mode BatchNorm): both sides must be negligible
            r = np.linalg.norm(a) / (1e-12 * gnorm)
            r = 0.0 if r < 1.0 else r
        else:
            r = np.linalg.norm(a - t) / tn
        if r > worst:
            worst, worst_key = r, k
    print(f"loss {float(loss):.9f}")
    print(f"worst {worst:.3e} {'/'.join(worst_key)}")


if __name__ == "__main__":
    main(sys.argv[1])
