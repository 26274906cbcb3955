"""Full evaluation sweep: EPE3D / ACC3DS / ACC3DR / Outliers3D / EPE2D / ACC2D.

Rebuild of evaluate_bid_pointconv.py:27-172: iterate the val loader, jitted
forward + on-device 3D metrics, host-side 2D projection through per-scene
KITTI intrinsics (utils/geometry.py), AverageMeter aggregation.
"""

from __future__ import annotations

from typing import Dict

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


def evaluate_model(model, variables, loader, logger=None,
                   with_2d: bool = True) -> Dict[str, float]:
    """Returns the 6 reference metrics + mean multiScaleLoss."""
    fwd = make_eval_forward(model)
    meters = {k: AverageMeter() for k in
              ("epe3d", "acc3ds", "acc3dr", "outliers", "epe2d", "acc2d",
               "loss")}

    for batch in loader:
        pos1, pos2, norm1, norm2, flow, paths = batch
        pred_flow, loss = fwd(variables, jnp.asarray(pos1), jnp.asarray(pos2),
                              jnp.asarray(norm1), jnp.asarray(norm2),
                              jnp.asarray(flow))
        pred = np.asarray(pred_flow)
        B = pred.shape[0]
        for b in range(B):
            epe3d, acc_s, acc_r, outl = evaluate_3d(pred[b], flow[b])
            meters["epe3d"].update(epe3d)
            meters["acc3ds"].update(acc_s)
            meters["acc3dr"].update(acc_r)
            meters["outliers"].update(outl)
        meters["loss"].update(float(loss), B)

        if with_2d:
            flow_pred_2d, flow_gt_2d = get_batch_2d_flow(
                pos1, pos1 + flow, pos1 + pred, paths)
            for b in range(B):
                epe2d, acc2d = evaluate_2d(flow_pred_2d[b], flow_gt_2d[b])
                meters["epe2d"].update(epe2d)
                meters["acc2d"].update(acc2d)

    results = {k: m.avg for k, m in meters.items()}
    if logger is not None:
        logger.info(" ".join(f"{k}={v:.4f}" for k, v in results.items()))
    return results
