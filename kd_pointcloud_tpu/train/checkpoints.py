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
