"""Jitted train/eval steps + the teacher training loop.

TPU-native rebuild of the reference hot loop (train_bid_pointconv.py:129-181):
one jitted step = forward + multiScaleLoss + backward + Adam update, with the
batch sharded over the `data` mesh axis and parameters replicated — XLA
inserts the gradient all-reduce (psum over ICI). Loss accumulation stays on
device across the epoch; only the epoch summary syncs to host (the reference
D2H-syncs every step, :152).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ..losses import multi_scale_loss, multi_scale_loss_per_sample
from ..models import BidPointFlowNet
from .state import TrainState


def make_train_step(model: BidPointFlowNet, tx,
                    loss_fn: Optional[Callable] = None,
                    donate: bool = True):
    """Build the jitted supervised train step.

    loss_fn(out, batch) -> scalar; defaults to multiScaleLoss on flows vs
    batch['flow'] through the pc1 FPS chain (train_bid_pointconv.py:150).
    """

    if loss_fn is None:
        def loss_fn(out, batch):
            if "weight" in batch:
                # padded data-parallel batch (parallel/mesh.py
                # data_parallel_plan): pad rows carry weight 0 so the loss
                # is exactly the mean over the REAL samples
                per = multi_scale_loss_per_sample(out["flows"],
                                                  batch["flow"],
                                                  out["fps_idx1"])
                w = batch["weight"]
                return jnp.sum(per * w) / jnp.sum(w)
            return multi_scale_loss(out["flows"], batch["flow"],
                                    out["fps_idx1"])

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def compute(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pos1"], batch["pos2"], batch["norm1"], batch["norm2"],
                train=True, mutable=["batch_stats"])
            return loss_fn(out, batch), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, loss

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_eval_step(model: BidPointFlowNet):
    """Jitted eval step: forward + multiScaleLoss + EPE3D
    (train_bid_pointconv.py:184-210).

    Returns per-SAMPLE epe/loss vectors (B,) so callers can weight uneven or
    padded final batches correctly (the reference's drop_last silently skips
    FT3D-val's remainder at batch_size>1)."""

    @jax.jit
    def step(variables, batch):
        out = model.apply(variables, batch["pos1"], batch["pos2"],
                          batch["norm1"], batch["norm2"], train=False)
        loss = multi_scale_loss_per_sample(out["flows"], batch["flow"],
                                           out["fps_idx1"])
        flow0 = out["flows"][0]
        flow0 = flow0[-1] if isinstance(flow0, list) else flow0
        epe3d = jnp.mean(
            jnp.sqrt(jnp.sum((flow0 - batch["flow"]) ** 2, axis=-1)), axis=-1)
        return epe3d, loss, flow0

    return step


def batch_to_device(batch_np, sharding=None,
                    pad_to: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """pad_to: pad the batch axis (repeat-last) up to this size and attach a
    0/1 "weight" row mask — data_parallel_plan's padded-batch protocol; the
    train step's default loss then averages over real rows only."""
    pos1, pos2, norm1, norm2, flow, _paths = batch_np
    batch = dict(pos1=pos1, pos2=pos2, norm1=norm1, norm2=norm2, flow=flow)
    if pad_to is not None and pos1.shape[0] != pad_to:
        n = pos1.shape[0]
        reps = pad_to - n
        batch = {k: np.concatenate([v, np.repeat(v[-1:], reps, axis=0)])
                 for k, v in batch.items()}
        batch["weight"] = np.concatenate(
            [np.ones(n, np.float32), np.zeros(reps, np.float32)])
    elif pad_to is not None:
        batch["weight"] = np.ones(pos1.shape[0], np.float32)
    if sharding is not None:
        batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: jnp.asarray(v) for k, v in batch.items()}


def eval_sceneflow(eval_step, variables, loader, sharding=None,
                   pad_to: Optional[int] = None) -> Tuple[float, float]:
    """Mean EPE3D + eval loss over a loader (train_bid_pointconv.py:184-210).

    Per-sample results are masked by the loader's pad sentinel, so padded
    final batches (loader pad_last=True) contribute only their real samples.
    pad_to additionally pads each batch up to a mesh-divisible size
    (data_parallel_plan protocol); those rows are masked out too."""
    from ..data import PAD_PATH

    epes, losses, masks = [], [], []
    for batch_np in loader:
        batch = batch_to_device(batch_np, sharding, pad_to=pad_to)
        epe3d, loss, _ = eval_step(variables, batch)
        epes.append(epe3d)
        losses.append(loss)
        real = [p != PAD_PATH for p in batch_np[5]]
        if pad_to is not None:
            real += [False] * (pad_to - len(real))
        masks.append(jnp.asarray(real, jnp.float32))
    epe = jnp.concatenate([jnp.atleast_1d(e) for e in epes])
    loss = jnp.concatenate([jnp.atleast_1d(l) for l in losses])
    mask = jnp.concatenate(masks)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return (float(jnp.sum(epe * mask) / denom),
            float(jnp.sum(loss * mask) / denom))
