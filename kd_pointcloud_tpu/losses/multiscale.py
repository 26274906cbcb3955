"""Multi-scale supervised flow loss.

Reference: multiScaleLoss (loss_functions.py:6-25). Ground-truth flow is
downsampled through the model's FPS index chain, then per-level L2 norms are
summed over points, averaged over batch, and alpha-weighted.

Channels-last: pred flows and gt are (B, N, 3) — no permutes needed.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..ops import gather_points

ALPHA = (0.02, 0.04, 0.08, 0.16)
SCALE = 1.0


def safe_norm(x, axis=-1):
    """L2 norm with a finite gradient at 0 (jax's norm/sqrt has inf grad
    there; torch.norm — which the reference uses — defines a 0 subgradient).
    Forward differs from exact norm by at most 1e-10."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), 1e-20))


def downsample_gt(gt_flow: jnp.ndarray, fps_idxs: Sequence[jnp.ndarray],
                  scale: float = SCALE):
    """GT flow pyramid via the FPS index chain (loss_functions.py:13-17)."""
    gt_flows = [gt_flow]
    for idx in fps_idxs:
        gt_flows.append(gather_points(gt_flows[-1], idx) / scale)
    return gt_flows


def multi_scale_loss(pred_flows, gt_flow, fps_idxs,
                     alpha: Sequence[float] = ALPHA) -> jnp.ndarray:
    """Σ_l alpha[l] · mean_B Σ_N ||pred_l − gt_l||₂."""
    return jnp.mean(multi_scale_loss_per_sample(pred_flows, gt_flow,
                                                fps_idxs, alpha))


def multi_scale_loss_per_sample(pred_flows, gt_flow, fps_idxs,
                                alpha: Sequence[float] = ALPHA) -> jnp.ndarray:
    """Per-sample (B,) variant of multi_scale_loss — the batch mean of this is
    exactly the reference loss; eval loops use it to weight uneven/padded
    final batches correctly.

    Iterative-teacher entries (a level's flows as a per-iteration LIST,
    models_bifeat.py:217) each score fully against that level's gt with
    that level's alpha — the reference's bifeat-local multiScaleLoss
    expresses the same by flattening the list and interleaving None into
    the fps chain (models_bifeat.py:231-256)."""
    num_scale = len(pred_flows)
    offset = len(fps_idxs) - num_scale + 1
    gt_flows = downsample_gt(gt_flow, fps_idxs)

    first = pred_flows[0]
    first = first[0] if isinstance(first, (list, tuple)) else first
    total = jnp.zeros((first.shape[0],), jnp.float32)
    for i in range(num_scale):
        entry = pred_flows[i]
        flows_i = entry if isinstance(entry, (list, tuple)) else [entry]
        for f in flows_i:
            l2 = safe_norm(f - gt_flows[i + offset])      # (B, N)
            total += alpha[i] * jnp.sum(l2, axis=1)
    return total
