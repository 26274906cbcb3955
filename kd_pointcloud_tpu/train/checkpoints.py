"""Checkpointing via orbax.

Improves on the reference (SURVEY.md §5): the reference saves bare
state_dicts only on val-EPE improvement and parses the resume epoch out of
the checkpoint *filename* (train_bid_pointconv.py:115, 172-177), never saving
optimizer state. Here a checkpoint carries params + batch_stats + opt_state +
epoch + best_epe; the best-EPE filename convention
(`<name>_<epoch:03d>_<epe:.4f>`) is kept for parity.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def _ckpt_name(model_name: str, epoch: int, epe: float) -> str:
    return f"{model_name}_{epoch:03d}_{epe:.4f}"


def save_checkpoint(ckpt_dir: str, model_name: str, epoch: int, epe: float,
                    tree: Dict[str, Any]) -> str:
    """Save a pytree checkpoint; returns its path."""
    path = osp.abspath(osp.join(ckpt_dir, _ckpt_name(model_name, epoch, epe)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(osp.abspath(path), target)


def full_state_tree(state, epoch: int, best_epe: float,
                    extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """The complete resumable checkpoint payload: params + batch_stats +
    opt_state (Adam moments & injected lr) + epoch + best-EPE watermark.
    Fixes the reference flaw of saving bare state_dicts and parsing the epoch
    out of the filename (train_bid_pointconv.py:115, 172-177)."""
    tree = {"params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": epoch,
            "best_epe": float(best_epe)}
    if extra:
        tree.update(extra)
    return tree


def restore_train_state(path: str, state,
                        extra: Optional[Dict[str, Any]] = None):
    """Restore a TrainState (+ optional extra trees) from `path`.

    Handles both full checkpoints (with opt_state/epoch/best_epe) and bare
    weight checkpoints ({params, batch_stats} — e.g. converted reference
    .pth files): only the keys present in the checkpoint are restored.

    Returns (state, epoch, best_epe, extra_restored). For bare checkpoints
    the epoch falls back to the filename convention and best_epe to inf.
    """
    raw = load_checkpoint(path)   # structure-only restore to inspect keys
    target: Dict[str, Any] = {"params": state.params,
                              "batch_stats": state.batch_stats}
    if "opt_state" in raw:
        target["opt_state"] = state.opt_state
    if "epoch" in raw:
        target["epoch"] = 0
    if "best_epe" in raw:
        target["best_epe"] = 0.0
    extra = extra or {}
    for key, tpl in extra.items():
        if key in raw:
            target[key] = tpl
    restored = load_checkpoint(path, target)

    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"])
    if "opt_state" in restored:
        state = state.replace(opt_state=restored["opt_state"])
    epoch = int(restored.get("epoch", parse_epoch_from_name(path)))
    best_epe = float(restored.get("best_epe", float("inf")))
    extra_restored = {k: restored.get(k, tpl) for k, tpl in extra.items()}
    return state, epoch, best_epe, extra_restored


def parse_epoch_from_name(path: str) -> int:
    """Resume-epoch convention from the checkpoint name
    (`<name>_<epoch>_<epe>`; replaces the reference's brittle char-slice
    `pretrain[-14:-11]`)."""
    m = re.search(r"_(\d{3})_[\d.]+$", osp.basename(path.rstrip("/")))
    return int(m.group(1)) if m else 0


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Lowest-EPE checkpoint in a directory."""
    best, best_epe = None, float("inf")
    if not osp.isdir(ckpt_dir):
        return None
    for name in os.listdir(ckpt_dir):
        m = re.search(r"_\d{3}_([\d.]+)$", name)
        if m:
            epe = float(m.group(1))
            if epe < best_epe:
                best, best_epe = osp.join(ckpt_dir, name), epe
    return best
