"""Model profiling: params, FLOPs, latency.

Rebuild of the reference's thop-based profiling mains
(models_bid_pointconv.py:680-713): parameter count, analytical FLOPs via
XLA's cost analysis (replaces thop MACs), and a latency timer that forces a
host sync per batch (the remote-TPU tunnel makes block_until_ready
unreliable — see scripts/tpu_worker.py docstring).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of the jitted fn: flops, bytes accessed.

    Counterpart of the reference's `thop.profile` MACs (FLOPs ≈ 2·MACs)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):          # older jax returns a list per device
        costs = costs[0]
    return {k: costs.get(k, 0.0) for k in
            ("flops", "bytes accessed", "transcendentals")}


def latency(fn: Callable, *args, warmup: int = 2, iters: int = 20
            ) -> Tuple[float, float]:
    """(mean_ms_per_call, pairs_per_sec) — N dispatches + one final host sync
    (per-call sync would measure tunnel RPC latency, not device time)."""
    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    r = None
    for _ in range(warmup):
        r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / iters
    return dt * 1000.0, 1.0 / dt


def profile_model(model, variables, *inputs) -> Dict[str, Any]:
    fwd = lambda v, *a: model.apply(v, *a, train=False)["flows"][0]
    costs = cost_analysis(fwd, variables, *inputs)
    ms, pps = latency(jax.jit(fwd), variables, *inputs)
    return dict(params=param_count(variables["params"]),
                flops=costs["flops"],
                bytes_accessed=costs.get("bytes accessed", 0.0),
                latency_ms=ms, pairs_per_sec=pps)
