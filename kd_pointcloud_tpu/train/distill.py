"""Knowledge-distillation train steps.

Rebuilds of the three KD workloads (SURVEY.md §3.3-3.4):
  * distill step        — frozen teacher + student, cross_biDirection_loss_ht
                          (distilTrain.py:156-182)
  * bridge step         — + Bridge module on teacher l3 features with its own
                          optimizer (distillBridge.py:141-188)
  * fast/iterative step — iterative bifeat teacher → FG student with
                          att_iter_loss (fast_distillTrain.py:161-189)

Each step jits teacher-forward (stop-gradient) + student-forward + loss +
update as ONE program, so XLA overlaps both model graphs; the reference runs
them as separate CUDA launches under no_grad.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..losses import att_iter_loss, bridge_ht_loss, cross_bidirection_loss_ht
from ..models import BidPointFlowNet, Bridge
from .state import TrainState


def _apply_frozen(model, variables, batch):
    out = model.apply(variables, batch["pos1"], batch["pos2"],
                      batch["norm1"], batch["norm2"], train=False)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.stop_gradient(x) if isinstance(x, jnp.ndarray) else x,
        out)


def make_distill_step(t_model: BidPointFlowNet, s_model: BidPointFlowNet, tx,
                      gamma: float = 0.3, beta: float = 0.8,
                      layer=(2, 3), loss_fn: Optional[Callable] = None):
    """Standard KD step (distilTrain.py:165-182). loss_fn may override the
    default cross_biDirection_loss_ht(γ, β, layer).

    NOTE (reference bug, faithfully preserved): the default loss — the
    reference's own uncommented choice, distilTrain.py:173 — requires a
    student whose hint-layer feats are 2× the teacher width, because it
    compares student feat1s[l] against cat(t_feat1s[l], t_feat2s[l]).
    With the reference's OWN teacher/lighttoken_res pairing (identical
    widths, models_bid_pointconv.py:20-72 vs models_bid_lighttoken_res.py:
    20-60) it raises a channel mismatch — in torch exactly as here. The
    shipped configs therefore select biDirection_loss_ht
    (configs/distill_kd.yaml kd_loss), which hints same-width feats."""

    def step(state: TrainState, t_variables, batch: Dict[str, jnp.ndarray]):
        t_out = _apply_frozen(t_model, t_variables, batch)

        def compute(params):
            s_out, mutated = s_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pos1"], batch["pos2"], batch["norm1"], batch["norm2"],
                train=True, mutable=["batch_stats"])
            if loss_fn is not None:
                loss = loss_fn(s_out, t_out, batch)
            else:
                loss = cross_bidirection_loss_ht(
                    s_out["flows"], s_out["feat1s"], s_out["fps_idx1"],
                    batch["flow"], t_out["flows"], t_out["feat1s"],
                    t_out["feat2s"], gamma, beta, layer)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))


def make_fast_distill_step(t_model: BidPointFlowNet, s_model: BidPointFlowNet,
                           tx, gamma: float = 0.6, layers=(1, 2)):
    """Attentive per-iteration KD step (fast_distillTrain.py:172-189)."""

    def step(state: TrainState, t_variables, batch):
        t_out = _apply_frozen(t_model, t_variables, batch)

        def compute(params):
            s_out, mutated = s_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pos1"], batch["pos2"], batch["norm1"], batch["norm2"],
                train=True, mutable=["batch_stats"])
            # teacher flows at iterative levels are per-iteration lists;
            # the student's are single tensors
            loss = att_iter_loss(s_out["flows"], s_out["fps_idx1"],
                                 batch["flow"], t_out["flows"],
                                 t_out["fps_idx1"], gamma, layers)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))


def make_bridge_distill_step(t_model: BidPointFlowNet,
                             s_model: BidPointFlowNet,
                             bridge: Bridge, s_tx, b_tx,
                             gamma: float = 0.3, beta: float = 0.8,
                             layer: int = 3):
    """Bridge KD step (distillBridge.py:165-188): the Bridge mixes the
    teacher's l3 features of both clouds; student hints target the bridged
    features. Unlike the reference — whose bridge optimizer steps over
    gradients that never flow (the bridge runs under no_grad,
    distillBridge.py:173-175) — the bridge here trains jointly through the
    hint loss (documented divergence; set b_tx=None to freeze it)."""

    def step(s_state: TrainState, b_params, b_opt, t_variables, batch):
        t_out = _apply_frozen(t_model, t_variables, batch)

        def compute(params, bridge_params):
            s_out, mutated = s_model.apply(
                {"params": params, "batch_stats": s_state.batch_stats},
                batch["pos1"], batch["pos2"], batch["norm1"], batch["norm2"],
                train=True, mutable=["batch_stats"])
            br1, br2 = bridge.apply({"params": bridge_params},
                                    t_out["feat1s"][layer],
                                    t_out["feat2s"][layer])
            loss = bridge_ht_loss(s_out["flows"], s_out["feat1s"],
                                  s_out["feat2s"], s_out["fps_idx1"],
                                  batch["flow"], t_out["flows"], br1, br2,
                                  gamma, beta, layer)
            return loss, mutated["batch_stats"]

        (loss, new_stats), (grads, b_grads) = jax.value_and_grad(
            compute, argnums=(0, 1), has_aux=True)(s_state.params, b_params)

        updates, new_opt = s_tx.update(grads, s_state.opt_state,
                                       s_state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            s_state.params, updates)
        new_s_state = s_state.replace(params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt,
                                      step=s_state.step + 1)
        if b_tx is not None:
            b_updates, new_b_opt = b_tx.update(b_grads, b_opt, b_params)
            new_b_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                  b_params, b_updates)
        else:
            new_b_params, new_b_opt = b_params, b_opt
        return new_s_state, new_b_params, new_b_opt, loss

    return jax.jit(step, donate_argnums=(0, 1, 2))
