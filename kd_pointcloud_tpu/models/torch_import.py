"""Import reference PyTorch checkpoints into BidPointFlowNet params.

Converts a state_dict saved by the reference's teacher/lighttoken models
(models_bid_pointconv.py / models_bid_lighttoken_res.py — the family the
released checkpoints target, e.g. models_bid_lighttoken_res_369_0.0288.pth)
into this framework's flax param/batch_stats trees, so users of the
reference can bring their trained weights.

Key-mapping summary (torch → flax, channels-last):
  * 1×1 Conv1d/Conv2d weight (O, I, 1[,1]) → Dense kernel (I, O)
  * torch Linear weight (O, I)             → Dense kernel (I, O); the
    PointConv linear's flatten order (c-major over (C, W)) matches
    weighted_contract's reshape, so a plain transpose is exact
  * BatchNorm1d weight/bias → BatchNorm scale/bias; running_mean/var →
    batch_stats mean/var
  * dead params skipped: cross bias1/bias2 (never used,
    pointconv_util.py:1802) and WeightNet mlp_bns (constructed but bypassed
    since use_bn=False, pointconv_util.py:192-202)

Accepts either a raw state_dict or {"state_dict": ...}; tensors may be torch
tensors or numpy arrays (torch is only imported if needed).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

# torch-side prefixes of plain Conv1d blocks (reference Conv1d wrapper:
# <name>.composed_module.0.{weight,bias}), per model family
_CONV_BLOCKS = ("level0", "level0_1", "level0_2", "level1_0", "level1_1",
                "level2_0", "level2_1", "level3_0", "level3_1",
                "deconv4_3", "deconv3_2", "deconv2_1", "deconv1_0")
# FG family (models_bid_FG.py:24-59 / models_bifeat.py): level0 is a
# PointConv, level0_lift feeds it, and there is no level0_2
_CONV_BLOCKS_FG = ("level0_lift", "level0_1", "level1_0", "level1_1",
                   "level2_0", "level2_1", "level3_0", "level3_1",
                   "deconv4_3", "deconv3_2", "deconv2_1", "deconv1_0")


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, 1[,1]) conv weight → (I, O) dense kernel."""
    return w.reshape(w.shape[0], w.shape[1]).T.copy()


def convert_teacher_state_dict(state_dict: Dict[str, Any]
                               ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) flax trees for the teacher preset."""
    return convert_state_dict(state_dict, family="teacher")


def convert_state_dict(state_dict: Dict[str, Any], family: str = "teacher"
                       ) -> Tuple[Dict, Dict]:
    """Convert a reference state_dict for a model family.

    family: "teacher" (models_bid_pointconv / lighttoken_res / weight48),
    "fg" (models_bid_FG / models_bifeat — PointConv l0 encoder, no
    level0_2), or "vote" (modes_bid_vote — teacher wiring + a `vote` 1×1
    conv on the final cross round, pointconv_util_vote.py:1483).
    """
    if "state_dict" in state_dict and isinstance(state_dict["state_dict"],
                                                 dict):
        state_dict = state_dict["state_dict"]
    # DataParallel checkpoints prefix "module."
    sd = {k[7:] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    used = set()

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def take(key):
        used.add(key)
        return _np(sd[key])

    # --- plain Conv1d blocks
    conv_blocks = _CONV_BLOCKS_FG if family == "fg" else _CONV_BLOCKS
    # our FG flax module names level0_2's role "level0_1" and the lift
    # "level0_lift" — identical to the reference FG names, no remap needed
    for name in conv_blocks:
        put(params, (name, "Dense_0", "kernel"),
            _conv_kernel(take(f"{name}.composed_module.0.weight")))
        put(params, (name, "Dense_0", "bias"),
            take(f"{name}.composed_module.0.bias"))

    # --- PointConv / PointConvD levels
    pc_levels = [1, 2, 3, 4] + ([0] if family == "fg" else [])
    for lvl in pc_levels:
        base = f"level{lvl}"
        for j in range(3):
            put(params, (base, "WeightNet_0", f"Dense_{j}", "kernel"),
                _conv_kernel(take(f"{base}.weightnet.mlp_convs.{j}.weight")))
            put(params, (base, "WeightNet_0", f"Dense_{j}", "bias"),
                take(f"{base}.weightnet.mlp_convs.{j}.bias"))
        put(params, (base, "Dense_0", "kernel"),
            take(f"{base}.linear.weight").T.copy())
        put(params, (base, "Dense_0", "bias"), take(f"{base}.linear.bias"))

    # --- cross layers
    for lvl in range(4):
        base = f"cross{lvl}"
        for t in ("cross_t11", "cross_t22", "cross_t1", "cross_t2",
                  "pos1", "pos2"):
            put(params, (base, t, "kernel"),
                _conv_kernel(take(f"{base}.{t}.weight")))
            put(params, (base, t, "bias"), take(f"{base}.{t}.bias"))
        for mlp in ("mlp1", "mlp2"):
            i = 0
            while f"{base}.{mlp}.{i}.composed_module.0.weight" in sd:
                put(params, (base, mlp, f"PointwiseBlock_{i}", "Dense_0",
                             "kernel"),
                    _conv_kernel(
                        take(f"{base}.{mlp}.{i}.composed_module.0.weight")))
                put(params, (base, mlp, f"PointwiseBlock_{i}", "Dense_0",
                             "bias"),
                    take(f"{base}.{mlp}.{i}.composed_module.0.bias"))
                i += 1
        if family == "vote" and f"{base}.vote.weight" in sd:
            # soft-argmax vote conv (pointconv_util_vote.py:1483)
            put(params, (base, "vote", "kernel"),
                _conv_kernel(take(f"{base}.vote.weight")))
            put(params, (base, "vote", "bias"), take(f"{base}.vote.bias"))

    # --- flow heads
    for lvl in range(4):
        base = f"flow{lvl}"
        i = 0
        while f"{base}.pointconv_list.{i}.linear.weight" in sd:
            pc = f"{base}.pointconv_list.{i}"
            for j in range(3):
                put(params, (base, f"PointConv_{i}", "WeightNet_0",
                             f"Dense_{j}", "kernel"),
                    _conv_kernel(take(f"{pc}.weightnet.mlp_convs.{j}.weight")))
                put(params, (base, f"PointConv_{i}", "WeightNet_0",
                             f"Dense_{j}", "bias"),
                    take(f"{pc}.weightnet.mlp_convs.{j}.bias"))
            put(params, (base, f"PointConv_{i}", "Dense_0", "kernel"),
                take(f"{pc}.linear.weight").T.copy())
            put(params, (base, f"PointConv_{i}", "Dense_0", "bias"),
                take(f"{pc}.linear.bias"))
            put(params, (base, f"PointConv_{i}", "BatchNorm_0", "scale"),
                take(f"{pc}.bn_linear.weight"))
            put(params, (base, f"PointConv_{i}", "BatchNorm_0", "bias"),
                take(f"{pc}.bn_linear.bias"))
            put(stats, (base, f"PointConv_{i}", "BatchNorm_0", "mean"),
                take(f"{pc}.bn_linear.running_mean"))
            put(stats, (base, f"PointConv_{i}", "BatchNorm_0", "var"),
                take(f"{pc}.bn_linear.running_var"))
            i += 1
        j = 0
        while f"{base}.mlp_convs.{j}.composed_module.0.weight" in sd:
            put(params, (base, "MLP_0", f"PointwiseBlock_{j}", "Dense_0",
                         "kernel"),
                _conv_kernel(
                    take(f"{base}.mlp_convs.{j}.composed_module.0.weight")))
            put(params, (base, "MLP_0", f"PointwiseBlock_{j}", "Dense_0",
                         "bias"),
                take(f"{base}.mlp_convs.{j}.composed_module.0.bias"))
            j += 1
        # fc is a raw 1×1 Conv1d (pointconv_util.py:2234), not a Linear
        put(params, (base, "Dense_0", "kernel"),
            _conv_kernel(take(f"{base}.fc.weight")))
        put(params, (base, "Dense_0", "bias"), take(f"{base}.fc.bias"))

    # account for every key: the rest must be known-dead params
    dead = re.compile(
        r"(\.weightnet\.mlp_bns\.)|(\.bias[12]$)|(\.num_batches_tracked$)"
        r"|(\.bn_linear\.num_batches_tracked$)")
    leftover = [k for k in sd if k not in used and not dead.search(k)]
    if leftover:
        raise ValueError(f"unmapped checkpoint keys: {leftover[:10]}")
    return params, stats


def load_torch_checkpoint(path: str, family: str = "teacher"
                          ) -> Tuple[Dict, Dict]:
    """Load a reference .pth and convert (torch required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return convert_state_dict(sd, family=family)
