"""Fused cross-pool kernel (ops/pallas/pool_fused.py): interpret-mode parity
vs the plain XLA formulation, merged-gather channel offsets, and the
custom-VJP gradient path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_pointcloud_tpu.ops import (group_points, group_points_kmajor,
                                   group_points_kmajor_packed)
from kd_pointcloud_tpu.ops.pallas.pool_fused import (_pool_pallas, _pool_ref,
                                                     pool_mlp_max)


def _leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _case(rng, B=2, N=256, K=16, C=32, Cg=None, layers=1):
    Cg = Cg or C
    u = jnp.asarray(rng.randn(B, N, Cg).astype(np.float32))
    v = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, N, K)).astype(np.int32))
    ws = tuple(jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.2
               for _ in range(layers))
    bs = tuple(jnp.asarray(rng.randn(C).astype(np.float32)) * 0.2
               for _ in range(layers))
    return u, v, idx, ws, bs


def _oracle(u, v, idx, ws, bs, co):
    C = v.shape[-1]
    g = group_points(u, idx)[..., co:co + C]           # (B, N, K, C)
    h = _leaky(g + v[:, :, None, :])
    for w, b in zip(ws, bs):
        h = _leaky(jnp.dot(h, w, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) + b)
    return jnp.max(h, axis=2)


@pytest.mark.parametrize("co,Cg", [(0, 32), (0, 64), (32, 64), (0, 67)])
def test_pool_ref_matches_oracle(co, Cg):
    rng = np.random.RandomState(0)
    u, v, idx, ws, bs = _case(rng, Cg=Cg)
    g = group_points_kmajor(u, idx)
    out = _pool_ref(g, v, ws, bs, co)
    ref = _oracle(u, v, idx, ws, bs, co)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("co,Cg", [(0, 32), (32, 64)])
def test_pool_kernel_interpret(co, Cg, monkeypatch):
    from kd_pointcloud_tpu.ops.pallas import pool_fused
    import functools
    orig = pool_fused.pl.pallas_call
    monkeypatch.setattr(pool_fused.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    rng = np.random.RandomState(1)
    u, v, idx, ws, bs = _case(rng, Cg=Cg)
    g = group_points_kmajor(u, idx)
    out = _pool_pallas(g, v, ws, bs, co)
    ref = _oracle(u, v, idx, ws, bs, co)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("co,Cg", [(0, 32), (32, 64)])
def test_pool_packed_gather_matches_oracle(co, Cg):
    """Caller-side lane packing (group_points_kmajor_packed + packed_p) must
    reproduce the unpacked result exactly (CPU falls back to _pool_ref via
    the same unpack reshape)."""
    rng = np.random.RandomState(3)
    u, v, idx, ws, bs = _case(rng, Cg=Cg, layers=2)
    P = 128 // v.shape[-1]
    gp = group_points_kmajor_packed(u, idx, P)
    out = pool_mlp_max(gp, v, ws, bs, co=co, packed_p=P)
    ref = _oracle(u, v, idx, ws, bs, co)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("co,Cg", [(0, 32), (32, 64)])
def test_pool_kernel_packed_interpret(co, Cg, monkeypatch):
    from kd_pointcloud_tpu.ops.pallas import pool_fused
    import functools
    orig = pool_fused.pl.pallas_call
    monkeypatch.setattr(pool_fused.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    rng = np.random.RandomState(4)
    u, v, idx, ws, bs = _case(rng, Cg=Cg)
    P = 128 // v.shape[-1]
    gp = group_points_kmajor_packed(u, idx, P)
    out = _pool_pallas(gp, v, ws, bs, co, packed_p=P)
    ref = _oracle(u, v, idx, ws, bs, co)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pool_grads_match_plain_formulation():
    rng = np.random.RandomState(2)
    u, v, idx, ws, bs = _case(rng, layers=2)
    g = group_points_kmajor(u, idx)

    def via_entry(g, v, ws, bs):
        return jnp.sum(pool_mlp_max(g, v, ws, bs) ** 2)

    def via_oracle(u, v, ws, bs):
        return jnp.sum(_oracle(u, v, idx, ws, bs, 0) ** 2)

    gg, gv, gws, gbs = jax.grad(via_entry, argnums=(0, 1, 2, 3))(g, v, ws, bs)
    gu_o, gv_o, gws_o, gbs_o = jax.grad(via_oracle,
                                        argnums=(0, 1, 2, 3))(u, v, ws, bs)
    # fold the k-major gather cotangent back onto the table to compare
    B, N, C = u.shape
    gu = jnp.zeros_like(u)
    idx_t = jnp.swapaxes(idx, 1, 2).reshape(B, -1)
    for b in range(B):
        gu = gu.at[b].add(
            jax.ops.segment_sum(gg[b].reshape(-1, C), idx_t[b],
                                num_segments=N))
    # segment-sum vs scatter-add accumulation order: tolerance covers
    # f32 summation noise on O(10³) magnitudes
    np.testing.assert_allclose(gu, gu_o, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(gv, gv_o, rtol=1e-5, atol=1e-5)
    for a, o in zip(gws + gbs, gws_o + gbs_o):
        np.testing.assert_allclose(a, o, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("co,Cg,packed", [(0, 32, False), (32, 64, False),
                                          (0, 32, True), (32, 64, True)])
def test_pool_bwd_kernel_interpret(co, Cg, packed, monkeypatch):
    """Fused Pallas backward (_pool_bwd_pallas) vs jax.vjp of the plain XLA
    formulation, including tied-max queries (duplicate neighbor indices force
    exact ties; the kernel must split the cotangent like jnp.max's VJP)."""
    from kd_pointcloud_tpu.ops.pallas import pool_fused
    import functools
    orig = pool_fused.pl.pallas_call
    monkeypatch.setattr(pool_fused.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    rng = np.random.RandomState(5)
    u, v, idx, ws, bs = _case(rng, Cg=Cg, layers=1)
    # force exact pool ties on the first 8 queries: every neighbor identical
    idx = idx.at[:, :8, :].set(idx[:, :8, :1])
    B, N, C = v.shape
    ct = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    if packed:
        P = 128 // C
        g = group_points_kmajor_packed(u, idx, P)
    else:
        P = 1
        g = group_points_kmajor(u, idx)

    gu = pool_fused._unpack(g, P) if P > 1 else g
    _, vjp = jax.vjp(
        lambda gg, vv, w, b: pool_fused._pool_ref(gg, vv, w, b, co),
        gu, v, ws, bs)
    gg_o, gv_o, gws_o, gbs_o = vjp(ct)
    if P > 1:
        gg_o = gg_o.reshape(g.shape)

    gg, gv, gws, gbs = pool_fused._pool_bwd_pallas(g, v, ws, bs, co, P, ct)
    np.testing.assert_allclose(gg, gg_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gv, gv_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gws[0], gws_o[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gbs[0], gbs_o[0], rtol=1e-4, atol=1e-4)


def test_pool_custom_vjp_end_to_end_interpret(monkeypatch):
    """jax.grad through _pool_custom (fwd kernel + bwd kernel) vs the oracle."""
    from kd_pointcloud_tpu.ops.pallas import pool_fused
    import functools
    orig = pool_fused.pl.pallas_call
    monkeypatch.setattr(pool_fused.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    rng = np.random.RandomState(6)
    u, v, idx, ws, bs = _case(rng, Cg=64, layers=1)
    co = 32
    g = group_points_kmajor(u, idx)

    def via_kernel(g, v, ws, bs):
        return jnp.sum(pool_fused._pool_custom(g, v, ws, bs, co, 1) ** 2)

    def via_ref(g, v, ws, bs):
        return jnp.sum(pool_fused._pool_ref(g, v, ws, bs, co) ** 2)

    got = jax.grad(via_kernel, argnums=(0, 1, 2, 3))(g, v, ws, bs)
    want = jax.grad(via_ref, argnums=(0, 1, 2, 3))(g, v, ws, bs)
    for a, o in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(a, o, rtol=1e-4, atol=1e-4)
