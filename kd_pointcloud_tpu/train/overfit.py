"""Fixed-batch training-trajectory runner (convergence evidence harness).

Reproduces the reference trainer's hot loop (train_bid_pointconv.py:117-155:
forward -> multiScaleLoss -> backward -> Adam(lr=1e-3, wd=1e-4), no scheduler
inside the horizon) over a FIXED batch list, recording the per-step loss and
the train-mode l0 EPE3D exactly as tests/make_train_parity_fixture.py records
them on the torch side. Used by:

  * tests/test_train_parity.py::TestConvergenceParity — CPU run asserted
    against the torch overfit fixture's own 1-ulp self-divergence envelope;
  * scripts/overfit_convergence.py — the same horizon on the real chip,
    exporting the semi-trained parameter tree for metric re-licensing and
    the KD-effectiveness experiments.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import multi_scale_loss
from .state import TrainState, make_optimizer


def make_trajectory_step(model, tx):
    """Jitted step returning (state, loss, l0-EPE3D) — the two trajectory
    observables the torch fixture records per step."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def compute(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pos1"], batch["pos2"], batch["norm1"], batch["norm2"],
                train=True, mutable=["batch_stats"])
            loss = multi_scale_loss(out["flows"], batch["flow"],
                                    out["fps_idx1"])
            flow0 = out["flows"][0]
            flow0 = flow0[-1] if isinstance(flow0, list) else flow0
            epe = jnp.mean(jnp.sqrt(jnp.sum(
                (flow0 - batch["flow"]) ** 2, axis=-1)))
            return loss, (mutated["batch_stats"], epe)

        (loss, (new_stats, epe)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        return (state.replace(params=new_params, batch_stats=new_stats,
                              opt_state=new_opt, step=state.step + 1),
                loss, epe)

    return jax.jit(step)


def run_trajectory(model, params, batch_stats,
                   batches: Sequence[Dict[str, jnp.ndarray]], n_steps: int,
                   lr: float = 1e-3, wd: float = 1e-4,
                   log_every: int = 50) -> Tuple[np.ndarray, np.ndarray,
                                                 TrainState]:
    """Run n_steps over cyclically-repeated fixed batches; returns the
    per-step (losses, epes) float64 arrays and the final TrainState."""
    tx = make_optimizer(lr, wd)
    state = TrainState.create({"params": params, "batch_stats": batch_stats},
                              tx)
    step = make_trajectory_step(model, tx)
    losses: List[float] = []
    epes: List[float] = []
    for i in range(n_steps):
        state, loss, epe = step(state, batches[i % len(batches)])
        losses.append(float(loss))
        epes.append(float(epe))
        if log_every and (i % log_every == 0 or i == n_steps - 1):
            print(f"jax step {i}: loss {losses[-1]:.6f} epe {epes[-1]:.4f}",
                  flush=True)
    return (np.asarray(losses, np.float64), np.asarray(epes, np.float64),
            state)


def load_overfit_batches(npz_path: str) -> List[Dict[str, jnp.ndarray]]:
    """Rehydrate the torch fixture's batch list (b{i}_{pos1,pos2,flow});
    norm1/norm2 alias positions, matching the reference trainer's
    model(pos1, pos2, pos1, pos2) call (train_bid_pointconv.py:138)."""
    z = np.load(npz_path)
    n = len([k for k in z.files if k.startswith("b") and k.endswith("_pos1")])
    batches = []
    for i in range(n):
        b = {k: jnp.asarray(z[f"b{i}_{k}"]) for k in ("pos1", "pos2", "flow")}
        b["norm1"], b["norm2"] = b["pos1"], b["pos2"]
        batches.append(b)
    return batches
