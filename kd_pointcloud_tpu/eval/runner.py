"""Full evaluation sweep: EPE3D / ACC3DS / ACC3DR / Outliers3D / EPE2D / ACC2D.

Rebuild of evaluate_bid_pointconv.py:27-172, redesigned for the device: the
reference synchronizes and computes numpy metrics inline every step
(:128-148). Here ALL six metrics — including the 2D projection, fed the
per-scene KITTI intrinsics as arrays — run inside the jitted step; the sweep
accumulates per-sample metric vectors on device and syncs ONCE at the end.
(Through this image's remote-TPU tunnel a per-scene host sync costs ~45 ms;
the device-metrics sweep removes all of them.)

`device_metrics=False` falls back to the host numpy path (threaded metric
workers overlapping device compute), kept for cross-checking against the
reference's own metric code.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import multi_scale_loss
from ..utils.logging import AverageMeter
from .geometry import FT3D_INTRINSICS, get_batch_2d_flow, read_kitti_intrinsics
from .metrics import evaluate_2d, evaluate_2d_jax, evaluate_3d, evaluate_3d_jax

_INTR_KEYS = ("f", "cx", "cy", "constx", "consty", "constz")

# jitted steps cached per (model, flags): flax modules hash by their frozen
# config, and rebuilding a jit wrapper per evaluate_model call would re-trace
# the whole model graph each time (~25 s through this image's remote-compile
# tunnel — measured 31 s sweeps whose actual compute loop was 4 s)
_STEP_CACHE: dict = {}
METRIC_KEYS = ("epe3d", "acc3ds", "acc3dr", "outliers", "epe2d", "acc2d",
               "loss")


def make_eval_forward(model):
    key = ("fwd", model)
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]

    @jax.jit
    def fwd(variables, pos1, pos2, norm1, norm2, flow):
        out = model.apply(variables, pos1, pos2, norm1, norm2, train=False)
        flow0 = out["flows"][0]
        flow0 = flow0[-1] if isinstance(flow0, list) else flow0
        loss = multi_scale_loss(out["flows"], flow, out["fps_idx1"])
        return flow0, loss

    _STEP_CACHE[key] = fwd
    return fwd


def make_eval_metrics_step(model, with_2d: bool = True):
    """Jitted forward + ALL metrics on device.

    intr: (B, 6) per-sample projection intrinsics (f, cx, cy, constx,
    consty, constz — utils/geometry.py:61 semantics). Returns a (B, 7)
    matrix of per-sample [epe3d, acc3ds, acc3dr, outliers, epe2d, acc2d,
    loss]."""
    key = ("metrics", model, with_2d)
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]

    project = project_points

    @jax.jit
    def step(variables, pos1, pos2, norm1, norm2, flow, intr):
        out = model.apply(variables, pos1, pos2, norm1, norm2, train=False)
        pred = out["flows"][0]
        pred = pred[-1] if isinstance(pred, list) else pred
        loss = multi_scale_loss(out["flows"], flow, out["fps_idx1"])

        epe3d, acc_s, acc_r, outl = evaluate_3d_jax(pred, flow)
        if with_2d:
            px1 = project(pos1, intr)
            f_pred = project(pos1 + pred, intr) - px1
            f_gt = project(pos1 + flow, intr) - px1
            epe2d, acc2d = evaluate_2d_jax(f_pred, f_gt)
        else:
            epe2d = jnp.zeros_like(epe3d)
            acc2d = jnp.zeros_like(epe3d)
        B = pos1.shape[0]
        return jnp.stack([epe3d, acc_s, acc_r, outl, epe2d, acc2d,
                          jnp.broadcast_to(loss, (B,))], axis=-1)

    _STEP_CACHE[key] = step
    return step


def project_points(pc, intr):
    """Batched 3D→2D projection with per-sample intrinsics.
    pc: (B, N, 3); intr: (B, 6) rows of (f, cx, cy, constx, consty, constz)
    — utils/geometry.py:61 semantics, device-side."""
    f, cx, cy, constx, consty, constz = (intr[:, i:i + 1] for i in range(6))
    x = (pc[..., 0] * f + cx * pc[..., 2] + constx) / (pc[..., 2] + constz)
    y = (pc[..., 1] * f + cy * pc[..., 2] + consty) / (pc[..., 2] + constz)
    return jnp.stack([x, y], axis=-1)


def _intrinsics_for(paths) -> np.ndarray:
    rows = []
    for p in paths:
        if "KITTI" in p or "kitti" in p:
            intr = read_kitti_intrinsics(p.rsplit("/", 1)[-1])
        else:
            intr = FT3D_INTRINSICS
        rows.append([intr[k] for k in _INTR_KEYS])
    return np.asarray(rows, np.float32)


def evaluate_model(model, variables, loader, logger=None,
                   with_2d: bool = True, metric_workers: int = 2,
                   device_metrics: bool = True, mesh=None) -> Dict[str, float]:
    """Returns the 6 reference metrics + mean multiScaleLoss.

    mesh: optional jax Mesh with a "data" axis — the sweep then runs
    data-parallel: batches sharded over the mesh, params replicated, the
    same jitted metrics step executing SPMD (metric rows are per-sample, so
    no cross-device reduction is needed; the host mean handles pad masking
    as in the single-device path). Requires loader batch_size % mesh size
    == 0 with pad_last=True. Beyond reference parity — its DataParallel
    covers training only (train_bid_pointconv.py:108-114)."""
    if device_metrics:
        from ..data.loader import PAD_PATH

        if mesh is not None and (
                getattr(loader, "batch_size", 0) % mesh.size != 0
                or not getattr(loader, "pad_last", False)):
            # A non-divisible (or dynamically short) batch would raise an
            # opaque sharding error deep inside jit — fall back instead
            # (advisor round-2 finding).
            if logger is not None:
                logger.info(
                    "evaluate_model: loader batch_size=%s incompatible with "
                    "%d-device mesh (needs batch_size %% mesh.size == 0 and "
                    "pad_last=True); falling back to single-device",
                    getattr(loader, "batch_size", None), mesh.size)
            mesh = None

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            bsh = NamedSharding(mesh, PartitionSpec("data"))
            variables = jax.device_put(
                variables, NamedSharding(mesh, PartitionSpec()))
            put = lambda x: jax.device_put(jnp.asarray(x), bsh)  # noqa: E731
        else:
            # device_put ONCE even single-device: checkpoint trees arrive
            # as host numpy (torch_import / msgpack), and a host tree
            # passed to a jitted step re-ships all ~32 MB through the
            # remote-TPU tunnel on EVERY batch.
            variables = jax.device_put(variables)
            put = jnp.asarray

        step = make_eval_metrics_step(model, with_2d=with_2d)
        per_sample: List[jnp.ndarray] = []
        masks: List[np.ndarray] = []
        for batch in loader:
            pos1, pos2, norm1, norm2, flow, paths = batch
            intr = _intrinsics_for(paths) if with_2d else \
                np.zeros((pos1.shape[0], 6), np.float32)
            per_sample.append(step(
                variables, put(pos1), put(pos2),
                put(norm1), put(norm2), put(flow),
                put(intr)))
            masks.append(np.asarray([p != PAD_PATH for p in paths],
                                    np.float32))
        stacked = np.asarray(jnp.concatenate(per_sample, axis=0))  # one sync
        mask = np.concatenate(masks)
        mean = (stacked * mask[:, None]).sum(0) / max(mask.sum(), 1.0)
        results = dict(zip(METRIC_KEYS, (float(v) for v in mean)))
        if not with_2d:
            results.pop("epe2d"), results.pop("acc2d")
        if logger is not None:
            logger.info(" ".join(f"{k}={v:.4f}" for k, v in results.items()))
        return results

    # ---- host-metrics fallback (reference-identical numpy path)
    variables = jax.device_put(variables)   # see device-metrics note above
    fwd = make_eval_forward(model)
    futures = []
    with ThreadPoolExecutor(max_workers=metric_workers) as pool:
        for batch in loader:
            pos1, pos2, norm1, norm2, flow, paths = batch
            pred_dev, loss_dev = fwd(
                variables, jnp.asarray(pos1), jnp.asarray(pos2),
                jnp.asarray(norm1), jnp.asarray(norm2), jnp.asarray(flow))
            # start the device→host copies NOW so they overlap the next
            # scenes' forwards
            for dev in (pred_dev, loss_dev):
                try:
                    dev.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
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
