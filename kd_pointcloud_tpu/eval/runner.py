"""Full evaluation sweep: EPE3D / ACC3DS / ACC3DR / Outliers3D / EPE2D / ACC2D.

Rebuild of evaluate_bid_pointconv.py:27-172: iterate the val loader, jitted
forward, host-side 3D/2D metrics with per-scene KITTI intrinsics
(utils/geometry.py), AverageMeter aggregation.

Unlike the reference — which synchronizes and computes numpy metrics inline
every step (:128-148) — the device→host transfer and the metric computation
run on worker threads while the main thread keeps dispatching forwards, so
host work overlaps device compute.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import multi_scale_loss
from ..utils.logging import AverageMeter
from .geometry import get_batch_2d_flow
from .metrics import evaluate_2d, evaluate_3d


def make_eval_forward(model):
    @jax.jit
    def fwd(variables, pos1, pos2, norm1, norm2, flow):
        out = model.apply(variables, pos1, pos2, norm1, norm2, train=False)
        flow0 = out["flows"][0]
        flow0 = flow0[-1] if isinstance(flow0, list) else flow0
        loss = multi_scale_loss(out["flows"], flow, out["fps_idx1"])
        return flow0, loss

    return fwd


def _batch_metrics(pred_dev, loss_dev, pos1, flow, paths, with_2d):
    """Runs on a worker thread: device→host transfer + numpy metrics.
    Returns a list of per-sample metric dicts."""
    pred = np.asarray(pred_dev)
    loss = float(loss_dev)
    rows: List[Dict[str, float]] = []
    if with_2d:
        flow_pred_2d, flow_gt_2d = get_batch_2d_flow(
            pos1, pos1 + flow, pos1 + pred, paths)
    for b in range(pred.shape[0]):
        epe3d, acc_s, acc_r, outl = evaluate_3d(pred[b], flow[b])
        row = dict(epe3d=epe3d, acc3ds=acc_s, acc3dr=acc_r, outliers=outl,
                   loss=loss)
        if with_2d:
            epe2d, acc2d = evaluate_2d(flow_pred_2d[b], flow_gt_2d[b])
            row.update(epe2d=epe2d, acc2d=acc2d)
        rows.append(row)
    return rows


def evaluate_model(model, variables, loader, logger=None,
                   with_2d: bool = True, metric_workers: int = 2
                   ) -> Dict[str, float]:
    """Returns the 6 reference metrics + mean multiScaleLoss."""
    fwd = make_eval_forward(model)
    futures = []
    with ThreadPoolExecutor(max_workers=metric_workers) as pool:
        for batch in loader:
            pos1, pos2, norm1, norm2, flow, paths = batch
            pred_dev, loss_dev = fwd(
                variables, jnp.asarray(pos1), jnp.asarray(pos2),
                jnp.asarray(norm1), jnp.asarray(norm2), jnp.asarray(flow))
            futures.append(pool.submit(_batch_metrics, pred_dev, loss_dev,
                                       pos1, flow, paths, with_2d))
        meters: Dict[str, AverageMeter] = {}
        for f in futures:
            for row in f.result():
                for k, v in row.items():
                    meters.setdefault(k, AverageMeter()).update(v)

    results = {k: m.avg for k, m in meters.items()}
    if logger is not None:
        logger.info(" ".join(f"{k}={v:.4f}" for k, v in results.items()))
    return results
