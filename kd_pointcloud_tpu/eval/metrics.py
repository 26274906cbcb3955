"""Scene-flow evaluation metrics.

Reference: evaluation_utils.py:18-50 (itself borrowed from HPLFlowNet).
Thresholds: ACC3DS <0.05 m or <5% rel; ACC3DR <0.1 m or <10%; Outliers3D
>0.3 m or >10% rel; ACC2D <3 px or <5% rel. Uses modern numpy dtypes (the
reference's np.float is deprecated).

Both numpy (host aggregation) and jax (on-device, batched) versions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def evaluate_3d(sf_pred: np.ndarray, sf_gt: np.ndarray):
    """Args: (N, 3) arrays. Returns (EPE3D, ACC3DS, ACC3DR, outliers)."""
    l2 = np.linalg.norm(sf_gt - sf_pred, axis=-1)
    epe3d = l2.mean()
    sf_norm = np.linalg.norm(sf_gt, axis=-1)
    rel = l2 / (sf_norm + 1e-4)
    acc_s = np.logical_or(l2 < 0.05, rel < 0.05).astype(np.float64).mean()
    acc_r = np.logical_or(l2 < 0.1, rel < 0.1).astype(np.float64).mean()
    outlier = np.logical_or(l2 > 0.3, rel > 0.1).astype(np.float64).mean()
    return epe3d, acc_s, acc_r, outlier


def evaluate_2d(flow_pred: np.ndarray, flow_gt: np.ndarray):
    """Args: (N, 2) pixel flows. Returns (EPE2D, ACC2D)."""
    epe2d = np.linalg.norm(flow_gt - flow_pred, axis=-1)
    flow_gt_norm = np.linalg.norm(flow_gt, axis=-1)
    rel = epe2d / (flow_gt_norm + 1e-5)
    acc2d = np.logical_or(epe2d < 3.0, rel < 0.05).astype(np.float64).mean()
    return epe2d.mean(), acc2d


def evaluate_3d_jax(sf_pred: jnp.ndarray, sf_gt: jnp.ndarray):
    """Batched on-device metrics: (B, N, 3) → per-SAMPLE (B,) vectors, so
    the eval sweep accumulates scalars on device and syncs once at the end
    (the reference syncs every step, evaluate_bid_pointconv.py:128-131;
    through this image's remote-TPU tunnel a per-scene sync costs ~45 ms)."""
    l2 = jnp.linalg.norm(sf_gt - sf_pred, axis=-1)          # (B, N)
    epe3d = jnp.mean(l2, axis=-1)
    rel = l2 / (jnp.linalg.norm(sf_gt, axis=-1) + 1e-4)
    acc_s = jnp.mean(jnp.logical_or(l2 < 0.05, rel < 0.05)
                     .astype(jnp.float32), axis=-1)
    acc_r = jnp.mean(jnp.logical_or(l2 < 0.1, rel < 0.1)
                     .astype(jnp.float32), axis=-1)
    outlier = jnp.mean(jnp.logical_or(l2 > 0.3, rel > 0.1)
                       .astype(jnp.float32), axis=-1)
    return epe3d, acc_s, acc_r, outlier


def evaluate_2d_jax(flow_pred: jnp.ndarray, flow_gt: jnp.ndarray):
    """(B, N, 2) pixel flows → per-sample (B,) EPE2D / ACC2D."""
    epe2d = jnp.linalg.norm(flow_gt - flow_pred, axis=-1)
    rel = epe2d / (jnp.linalg.norm(flow_gt, axis=-1) + 1e-5)
    acc2d = jnp.mean(jnp.logical_or(epe2d < 3.0, rel < 0.05)
                     .astype(jnp.float32), axis=-1)
    return jnp.mean(epe2d, axis=-1), acc2d
