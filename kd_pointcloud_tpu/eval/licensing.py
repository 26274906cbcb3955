"""Shared licensing-band machinery for approximation rulings.

Every relaxation of exact reference semantics (approx kNN, coarse warp,
cost-volume K, FPS blocking) is licensed against the SAME criterion: the
directional six-metric band below, evaluated on trained-regime weights over
bundled-KITTI sweep scenes, with paired per-scene deltas (ROUND4_NOTES §3,
ROUND5_NOTES regime-curve section). This module is the single home of that
criterion — scripts/{selftest_tpu,relaxation_sweep,fg_probe,regime_curve}.py
all consume it, so a band change lands everywhere at once (round-5 review
finding #6; the copies had already drifted on list-valued-flows handling).

Metric order everywhere: [epe3d acc3ds acc3dr outliers epe2d acc2d]
(eval/metrics.py semantics, reference evaluation_utils.py:evaluate_2d/3d).
"""

from __future__ import annotations

import numpy as np

# Directional (degradation-only) tolerances: EPE/Outliers are lower-better
# (a delta must not EXCEED +band), ACC* higher-better (a delta must not
# fall BELOW -band). Improvements can never fail the band.
BAND = (1e-3, 3e-3, 3e-3, 3e-3, 5e-2, 3e-3)
LOWER_BETTER = (True, False, False, True, True, False)
METRIC_NAMES = ("epe3d", "acc3ds", "acc3dr", "outliers", "epe2d", "acc2d")


def in_band(d) -> bool:
    """Directional band verdict for a six-metric delta vector (variant −
    exact). NOTE at 50 scenes the paired SE of the ACC metrics is ~2e-3 —
    report SEs alongside any ruling (ROUND5_NOTES session-2 finding #2)."""
    return bool(all((x <= b) if lb else (x >= -b)
                    for x, b, lb in zip(d, BAND, LOWER_BETTER)))


def load_scenes(n_scenes: int, num_points: int = 8192):
    """First n bundled-KITTI sweep scenes as (pc1, pc2, sf, path) tuples
    (the deterministic eval-transform protocol every ruling uses)."""
    from kd_pointcloud_tpu.data import KITTI, ProcessData

    ds = KITTI(train=False, transform=ProcessData(num_points=num_points))
    scenes = []
    for i in range(n_scenes):
        pc1s, pc2s, _, _, sf, path = ds[i]
        scenes.append((pc1s, pc2s, sf, path))
    return scenes


def sweep_rows(cfg, variables, scenes, fwd=None) -> np.ndarray:
    """Per-scene six-metric rows (S, 6) for one ModelConfig under
    `variables` (MUST already be jax.device_put — a host-numpy tree passed
    to a jitted fwd re-ships ~32 MB through the remote tunnel per scene).

    Handles both array-valued flows[0] and the iterative families'
    list-valued flows (last refinement is the prediction). Pass a prebuilt
    jitted `fwd(variables, pc1, pc2) -> flows[0]` to reuse one trace when
    the caller also times the same fn (re-jitting a fresh flax module
    instance re-traces through the remote-compile tunnel, ~25 s)."""
    import jax
    import jax.numpy as jnp

    from kd_pointcloud_tpu.eval.geometry import get_batch_2d_flow
    from kd_pointcloud_tpu.eval.metrics import evaluate_2d, evaluate_3d
    from kd_pointcloud_tpu.models import BidPointFlowNet

    if fwd is None:
        model = BidPointFlowNet(cfg)
        fwd = jax.jit(lambda vv, a, b, mm=model: mm.apply(
            vv, a, b, a, b, train=False)["flows"][0])
    rows = []
    for pc1s, pc2s, sf, path in scenes:
        pred = fwd(variables, jnp.asarray(pc1s[None]),
                   jnp.asarray(pc2s[None]))
        pred = np.asarray(pred[-1] if isinstance(pred, list) else pred)[0]
        epe3d, a3s, a3r, outl = evaluate_3d(pred, sf)
        f2d_pred, f2d_gt = get_batch_2d_flow(
            pc1s[None], (pc1s + sf)[None], (pc1s + pred)[None], [path])
        epe2d, a2d = evaluate_2d(f2d_pred[0], f2d_gt[0])
        rows.append([epe3d, a3s, a3r, outl, epe2d, a2d])
    return np.asarray(rows)
