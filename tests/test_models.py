"""Model-family tests: output contract shapes for every preset + gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_pointcloud_tpu.losses import multi_scale_loss
from kd_pointcloud_tpu.models import (PRESETS, BidPointFlowNet, Bridge,
                                      tiny_config)

TINY_N = 256


def make_inputs(rng, b=2, n=TINY_N):
    xyz1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    return xyz1, xyz2, xyz1, xyz2


def init_and_run(cfg, inputs, train=False):
    model = BidPointFlowNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out, _ = model.apply(variables, *inputs, train=train,
                         mutable=["batch_stats"])
    return model, variables, out


FAST_PRESETS = ["teacher", "bifeat", "no_cross"]  # covers all wiring branches
SLOW_PRESETS = sorted(set(PRESETS) - set(FAST_PRESETS))


@pytest.mark.parametrize(
    "preset",
    FAST_PRESETS + [pytest.param(p, marks=pytest.mark.slow)
                    for p in SLOW_PRESETS])
def test_forward_contract(rng, preset):
    cfg = tiny_config(preset)
    inputs = make_inputs(rng)
    _, _, out = init_and_run(cfg, inputs)

    npoints = cfg.npoints
    # flows fine→coarse at the l0..l3 resolutions
    assert len(out["flows"]) == 4
    for lvl in range(4):
        f = out["flows"][lvl]
        if isinstance(f, list):       # iterative variant
            assert cfg.iters > 1 and lvl < 3
            f = f[-1]
            assert len(out["flows"][lvl]) == cfg.iters
        assert f.shape == (2, npoints[lvl], 3)

    # FPS chains
    for idxs in (out["fps_idx1"], out["fps_idx2"]):
        assert [i.shape[1] for i in idxs] == list(npoints[1:4])

    # position pyramids
    assert [p.shape[1] for p in out["pc1"]] == list(npoints[:4])

    # feature lists: 7 entries (teacher contract) or 8 (FG family)
    want_feats = 8 if cfg.returns_c_feats else 7
    assert len(out["feat1s"]) == len(out["feat2s"]) == want_feats

    assert len(out["crosses"]) == 4
    if cfg.returns_c_feats:
        assert len(out["c_feat1s"]) == 3
        if cfg.iters > 1:
            assert all(len(c) == cfg.iters for c in out["c_feat1s"])


def test_serving_param_tree_identical_to_teacher(rng):
    """The serving presets (models/config.py) only change gather/pool widths
    or warp scheduling — their parameter trees must stay bit-identical in
    structure and shapes to the teacher's so any teacher checkpoint serves
    unchanged. serving_v3 (coarse-warp at l0) is the round-5 LICENSED
    relaxation (in band at every regime-curve checkpoint); serving_v2
    (K=16 at l0) and serving (K=16 at l0/l1) are demoted
    fast-but-approximate knobs (rounds 5 and 4 respectively)."""
    small_n = (512, 256, 64, 32, 16)
    assert PRESETS["serving"].flow_nei_per_level == (16, 16, 32, 32)
    assert PRESETS["serving_v2"].flow_nei_per_level == (16, 32, 32, 32)
    assert PRESETS["serving_v3"].coarse_warp == (0,)
    sv = dataclasses.replace(PRESETS["serving"], npoints=small_n,
                             flow_nei_per_level=(8, 16, 16, 8), feat_nei=8)
    v2 = dataclasses.replace(PRESETS["serving_v2"], npoints=small_n,
                             flow_nei_per_level=(8, 16, 16, 8), feat_nei=8)
    v3 = dataclasses.replace(PRESETS["serving_v3"], npoints=small_n,
                             flow_nei=16, feat_nei=8)
    tc = dataclasses.replace(PRESETS["teacher"], npoints=small_n,
                             flow_nei=16, feat_nei=8)
    inputs = make_inputs(rng, n=512)
    vt = BidPointFlowNet(tc).init(jax.random.PRNGKey(0), *inputs,
                                  train=False)
    for cfg in (sv, v2, v3):
        vs = BidPointFlowNet(cfg).init(jax.random.PRNGKey(0), *inputs,
                                       train=False)
        assert (jax.tree_util.tree_structure(vs)
                == jax.tree_util.tree_structure(vt))
        assert (jax.tree_util.tree_map(lambda x: x.shape, vs)
                == jax.tree_util.tree_map(lambda x: x.shape, vt))


def test_coarse_warp_contract(rng):
    """coarse_warp (ModelConfig round-5 relaxation): the inverse warp flow
    at the listed levels is reconstructed at lvl+1 and IDW-upsampled —
    the param tree must stay identical to the exact config's (no new
    modules) and the outputs must stay finite and CLOSE to exact at tiny
    scale (the warp only perturbs cost-volume neighborhood geometry)."""
    cfg = tiny_config("teacher")
    inputs = make_inputs(rng)
    _, v, out = init_and_run(cfg, inputs)
    for levels in ((0,), (0, 1)):
        cw = dataclasses.replace(cfg, coarse_warp=levels)
        m = BidPointFlowNet(cw)
        vs = m.init(jax.random.PRNGKey(0), *inputs, train=False)
        assert (jax.tree_util.tree_structure(vs)
                == jax.tree_util.tree_structure(v))
        o, _ = m.apply(v, *inputs, train=False, mutable=["batch_stats"])
        f = np.asarray(o["flows"][0])
        assert np.isfinite(f).all()
        # same weights, perturbed warp: flows differ but not wildly
        d = np.abs(f - np.asarray(out["flows"][0])).max()
        assert d < 0.1, d


@pytest.mark.slow
def test_coarse_warp_iterative_only_first_iter(rng):
    """iters>1: only iteration 0 of a level may take the coarse path
    (later iterations refine a fine-level flow; config.py coarse_warp)."""
    cfg = tiny_config("bifeat")
    inputs = make_inputs(rng)
    _, v, out = init_and_run(cfg, inputs)
    cw = dataclasses.replace(cfg, coarse_warp=(0,))
    o, _ = BidPointFlowNet(cw).apply(v, *inputs, train=False,
                                     mutable=["batch_stats"])
    for lvl in range(3):
        for it in range(cfg.iters):
            f = np.asarray(o["flows"][lvl][it])
            assert np.isfinite(f).all()


def test_feature_widths_teacher(rng):
    """The teacher contract: feat1s channel widths match
    models_bid_pointconv.py:203 ([64,128,256,512,64,32,32])."""
    cfg = tiny_config("teacher")
    _, _, out = init_and_run(cfg, make_inputs(rng))
    widths = [f.shape[-1] for f in out["feat1s"]]
    assert widths == [64, 128, 256, 512, 64, 32, 32]


def test_loss_and_grad(rng):
    cfg = tiny_config("teacher")
    inputs = make_inputs(rng)
    model = BidPointFlowNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    gt = jnp.asarray(rng.randn(2, TINY_N, 3).astype(np.float32))

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             *inputs, train=True, mutable=["batch_stats"])
        return multi_scale_loss(out["flows"], gt, out["fps_idx1"])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the finest flow head must receive gradient
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert max(norms) > 0


def test_eval_deterministic(rng):
    cfg = tiny_config("teacher")
    inputs = make_inputs(rng)
    model = BidPointFlowNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out1 = model.apply(variables, *inputs, train=False)
    out2 = model.apply(variables, *inputs, train=False)
    np.testing.assert_array_equal(np.asarray(out1["flows"][0]),
                                  np.asarray(out2["flows"][0]))


def test_batchnorm_state_updates(rng):
    """Flow-head BN is the only mutable state; train mode must update it."""
    cfg = tiny_config("teacher")
    inputs = make_inputs(rng)
    model = BidPointFlowNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    _, mutated = model.apply(variables, *inputs, train=True,
                             mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a))
               for b, a in zip(before, after))


def test_param_count_teacher_matches_reference():
    """Full-size teacher must have the reference's param count (~7.9M;
    SURVEY.md reports ≤7.9M params; exact value asserted once measured —
    here we sanity-bound it)."""
    cfg = PRESETS["teacher"]
    model = BidPointFlowNet(cfg)
    xyz = jnp.zeros((1, 8192, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), xyz, xyz, xyz, xyz,
                           train=False))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 3_000_000 < n < 9_000_000, n


def test_bridge(rng):
    feats = jnp.asarray(rng.randn(2, 32, 512).astype(np.float32))
    model = Bridge()
    variables = model.init(jax.random.PRNGKey(0), feats, feats)
    s, t = model.apply(variables, feats, feats)
    assert s.shape == t.shape == (2, 32, 512)
    # untied outputs: src and target branches differ even on equal inputs
    assert not np.allclose(np.asarray(s), np.asarray(t))
