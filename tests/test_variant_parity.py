"""Numeric torch parity for the FG and vote presets (VERDICT round-1 #8).

Extends tests/test_torch_parity.py (teacher-only) to the two variants with
the most bespoke math: CrossLayerLightFG's union feature/euclid kNN
(pointconv_util.py:1915-1931) and CrossLayerLightVote's soft-argmax vote
flow (pointconv_util_vote.py:1489-1517). Real reference models on CPU →
state_dict imported through torch_import → identical flows.
"""

import os.path as osp
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = "/tmp/kdpc_variant_parity"
REFERENCE_AVAILABLE = osp.isdir("/root/reference")


def _ensure_fixture():
    if all(osp.exists(osp.join(FIXTURE_DIR, f))
           for f in ("ref_fg.pth", "golden_fg.npz",
                     "ref_vote.pth", "golden_vote.npz")):
        return True
    gen = osp.join(osp.dirname(__file__), "make_variant_parity_fixture.py")
    r = subprocess.run([sys.executable, gen, FIXTURE_DIR],
                       capture_output=True, text=True, timeout=1200,
                       cwd=osp.dirname(__file__))
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        return False
    return True


@pytest.mark.skipif(not REFERENCE_AVAILABLE,
                    reason="reference checkout not present")
# fg tolerance: the union kNN's feature-space half selects neighbors by
# f32 feature distances; at near-ties torch.topk and lax.top_k can pick a
# different (equally-near) neighbor, shifting a handful of max-pooled
# activations — measured max |Δflow| 4e-5 on a 4096-pt cloud, float noise
# everywhere else. vote has no feature-space selection and matches at 1e-5.
@pytest.mark.parametrize("tag,preset,family,tol",
                         [("fg", "fg", "fg", 2e-4),
                          ("vote", "vote", "vote", 1e-5)])
def test_variant_flows_match(tag, preset, family, tol):
    import dataclasses

    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
    from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint

    assert _ensure_fixture(), "could not build variant parity fixture"
    params, stats = load_torch_checkpoint(
        osp.join(FIXTURE_DIR, f"ref_{tag}.pth"), family=family)
    golden = np.load(osp.join(FIXTURE_DIR, f"golden_{tag}.npz"))
    x = jnp.asarray(golden["x"])

    cfg = dataclasses.replace(PRESETS[preset], knn_method="exact",
                              knn_precision="highest")
    model = BidPointFlowNet(cfg)

    # converted tree must cover a fresh init exactly
    import flax
    ref = jax.eval_shape(lambda k: model.init(k, x, x, x, x, train=False),
                         jax.random.PRNGKey(0))
    want = flax.traverse_util.flatten_dict(ref["params"])
    got = flax.traverse_util.flatten_dict(params)
    assert set(want) == set(got), (
        set(want) ^ set(got))
    for k in want:
        assert want[k].shape == got[k].shape, (k, want[k].shape, got[k].shape)

    out = model.apply({"params": params, "batch_stats": stats},
                      x, x, x, x, train=False)
    for lvl in range(4):
        mine = out["flows"][lvl]
        mine = mine[-1] if isinstance(mine, list) else mine
        mine = np.asarray(mine)[0]
        theirs = golden[f"flow{lvl}"][0].transpose(1, 0)   # (B,3,N)->(N,3)
        err = np.abs(mine - theirs)
        assert err.max() < tol, f"{tag} level {lvl}: max abs err {err.max()}"
