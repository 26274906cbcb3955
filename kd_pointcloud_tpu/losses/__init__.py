"""Loss library: supervised multi-scale flow loss, the 13-loss KD menu, and
the self-supervised Chamfer/smoothness/curvature loss (SURVEY.md §2.1 #6)."""

from .kd import (att_ht_loss, att_iter_loss, attentive_imitation_loss,
                 bidirection_loss, bidirection_loss_ht, bridge_ht_loss,
                 bridge_ht_loss_iter, cross_bidirection_loss_ht, cross_loss,
                 double_bridge_ht_loss, flow_loss_ht, loss_fn_ht, loss_fn_kd_2)
from .multiscale import (ALPHA, downsample_gt, multi_scale_loss,
                        multi_scale_loss_per_sample)
from .selfsup import multi_scale_chamfer_smooth_curvature

__all__ = [
    "att_ht_loss", "att_iter_loss", "attentive_imitation_loss",
    "bidirection_loss", "bidirection_loss_ht", "bridge_ht_loss",
    "bridge_ht_loss_iter", "cross_bidirection_loss_ht", "cross_loss",
    "double_bridge_ht_loss", "flow_loss_ht", "loss_fn_ht", "loss_fn_kd_2",
    "ALPHA", "downsample_gt", "multi_scale_loss",
    "multi_scale_loss_per_sample",
    "multi_scale_chamfer_smooth_curvature",
]
