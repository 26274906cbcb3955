"""Knowledge-distillation loss library.

Rebuild of all 13 losses in the reference loss_functions.py (SURVEY.md §2.1
item 6), channels-last. Argument conventions:

  * `outputs` / `teacher_outputs`: multi-scale flow lists, fine→coarse,
    each (B, Nl, 3) — for the iterative teacher, entries of levels 0..2 are
    per-iteration lists (models_bifeat.py:217).
  * `feat1s`/`feat2s`, `c_feat1s`/`c_feat2s`, `crosses`: the model-output
    feature lists, channels-last.
  * `fps_idxs*`: FPS index chains.

`flow_loss_ht` is broken in the reference (undefined `fps_idxs`/`loss1`,
loss_functions.py:98-120); here it is implemented with the evident intent
(pure flow-matching vs teacher + hints) and documented as a deliberate fix.

att_iter/att_ht ratio indexing: the reference permutes its stacked
distil-ratio tensor to (iters, layers, B) but indexes it [layer][iter]
(loss_functions.py:144-153) — a silent layer↔iter transposition whenever
the counts coincide (an IndexError otherwise). `_distil_ratios` here
returns per-layer (B, iters) matrices indexed per the evident intent;
tests/test_kd_loss_parity.py pins numeric parity for every runnable
reference loss, replicating the transposition where it exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .multiscale import ALPHA, downsample_gt, multi_scale_loss, safe_norm


def _flow0(teacher_outputs):
    """Finest teacher flow; last iteration if the entry is a per-iter list."""
    t0 = teacher_outputs[0]
    return t0[-1] if isinstance(t0, (list, tuple)) else t0


def loss_fn_kd_2(outputs, fps_idxs, gt_flow, teacher_outputs,
                 teacher_fps_idxs, gamma, alpha=ALPHA):
    """Flow-imitation blending (loss_functions.py:27-36)."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs, alpha)
    return gamma * loss1 + (1 - gamma) * loss2


def attentive_imitation_loss(outputs, fps_idxs, gt_flow, teacher_outputs,
                             teacher_fps_idxs, t_history, gamma, alpha=ALPHA):
    """Teacher-error-weighted imitation (loss_functions.py:38-51); t_history
    is the list/array of teacher losses over the train set gathered by the
    pre-pass (distilTrain.py:142)."""
    loss_st = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs, alpha)
    loss_sg = multi_scale_loss(outputs, gt_flow, fps_idxs, alpha)
    loss_tg = multi_scale_loss(teacher_outputs, gt_flow, teacher_fps_idxs, alpha)
    t_history = jnp.asarray(t_history)
    sigma = 1 - loss_tg / (jnp.max(t_history) - jnp.min(t_history))
    return gamma * loss_sg + (1 - gamma) * sigma * loss_st


def bidirection_loss(outputs, fps_idxs1, fps_idxs2, gt_flow, teacher_outputs,
                     teacher_fps_idxs, gamma1, gamma2, beta, alpha=ALPHA):
    """Blend the loss through both clouds' FPS chains (loss_functions.py:53-66)."""
    t0 = _flow0(teacher_outputs)
    g1 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    g2 = multi_scale_loss(outputs, gt_flow, fps_idxs2, alpha)
    k1 = multi_scale_loss(outputs, t0, fps_idxs1, alpha)
    k2 = multi_scale_loss(outputs, t0, fps_idxs2, alpha)
    return (beta * (gamma1 * k1 + (1 - gamma1) * g1)
            + (1 - beta) * (gamma2 * k2 + (1 - gamma2) * g2))


def loss_fn_ht(outputs, feat1s, fps_idxs1, gt_flow, teacher_outputs,
               t_feat1s, gamma, layer=0, alpha=ALPHA):
    """Flow blending + single-layer hint, hint normalized by feat1s[0] size
    (loss_functions.py:69-81)."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs1, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    hint = ((feat1s[layer] - t_feat1s[layer]) ** 2) / 2
    return (gamma * loss1 + (1 - gamma) * loss2
            + jnp.sum(hint) / feat1s[0].size)


def bidirection_loss_ht(outputs, feat1s, feat2s, fps_idxs1, gt_flow,
                        teacher_outputs, t_feat1s, t_feat2s, gamma, beta,
                        layer=0, alpha=ALPHA):
    """Flow blending + both-cloud hints at one layer (loss_functions.py:83-96)."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs1, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    src = jnp.sum(((feat1s[layer] - t_feat1s[layer]) ** 2) / 2)
    tgt = jnp.sum(((feat2s[layer] - t_feat2s[layer]) ** 2) / 2)
    return (beta * (gamma * loss1 + (1 - gamma) * loss2)
            + (1 - beta) * (0.5 * src + 0.5 * tgt))


def flow_loss_ht(outputs, feat1s, feat2s, fps_idxs1, gt_flow, teacher_outputs,
                 t_feat1s, t_feat2s, gamma, beta, layer=0, alpha=ALPHA):
    """Per-level flow matching vs the teacher + both-cloud hints.

    The reference version (loss_functions.py:98-120) is broken as committed
    (undefined `fps_idxs` and `loss1`); rebuilt per evident intent:
    loss1 = GT supervision, loss2 = per-level teacher matching.
    """
    loss1 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    loss2 = jnp.zeros((), jnp.float32)
    for i in range(len(outputs)):
        t_i = teacher_outputs[i]
        t_i = t_i[-1] if isinstance(t_i, (list, tuple)) else t_i
        diff = outputs[i] - t_i
        loss2 += alpha[i] * jnp.mean(jnp.sum(safe_norm(diff), 1))
    src = jnp.sum(((feat1s[layer] - t_feat1s[layer]) ** 2) / 2)
    tgt = jnp.sum(((feat2s[layer] - t_feat2s[layer]) ** 2) / 2)
    return (beta * (gamma * loss1 + (1 - gamma) * loss2)
            + (1 - beta) * (0.5 * src + 0.5 * tgt))


def _distil_ratios(t_outputs, gt_flows, layers):
    """1 − softmax over iterations of the teacher's per-iteration squared
    error (loss_functions.py:136-144). Returns [n_layers][n_iters] of (B,)."""
    ratios = []
    for layer in layers:
        diffs = []
        for t_flow in t_outputs[layer]:
            d = jnp.sum((t_flow - gt_flows[layer]) ** 2, axis=(1, 2))  # (B,)
            diffs.append(d)
        diffs = jnp.stack(diffs, axis=1)                 # (B, iters)
        ratios.append(1 - jax.nn.softmax(diffs, axis=1))
    return ratios


def att_iter_loss(outputs, fps_idxs1, gt_flow, t_outputs, t_fps_idxs1,
                  gamma, layers=(1, 2), alpha=ALPHA):
    """Attentive per-iteration distillation against an iterative teacher
    (loss_functions.py:123-158): each teacher iteration's flow is imitated
    with weight (1 − softmax of its error vs GT)."""
    loss1 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    gt_flows = downsample_gt(gt_flow, t_fps_idxs1)
    ratios = _distil_ratios(t_outputs, gt_flows, layers)

    src_ht = jnp.zeros((), jnp.float32)
    for i, layer in enumerate(layers):
        for it, t_flow in enumerate(t_outputs[layer]):
            diff = jnp.sum(safe_norm(outputs[layer] - t_flow),
                           axis=1)                        # (B,)
            # reference: ratioᵀ @ diff (a batch dot product; the trailing
            # .mean() at loss_functions.py:153 is over a scalar, a no-op)
            src_ht += alpha[layer] * jnp.sum(ratios[i][:, it] * diff)
    return gamma * loss1 + (1 - gamma) * src_ht


def att_ht_loss(outputs, c_feat1s, c_feat2s, fps_idxs1, gt_flow, t_outputs,
                t_c_feat1s, t_c_feat2s, t_fps_idxs1, gamma, layers=(1, 2),
                alpha=ALPHA):
    """Attentive per-iteration feature hints (loss_functions.py:160-199)."""
    loss1 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    gt_flows = downsample_gt(gt_flow, t_fps_idxs1)
    ratios = _distil_ratios(t_outputs, gt_flows, layers)

    src_ht = jnp.zeros((), jnp.float32)
    tgt_ht = jnp.zeros((), jnp.float32)
    for i, layer in enumerate(layers):
        for it in range(len(t_outputs[layer])):
            r = ratios[i][:, it]
            # reference norms over the POINT axis then sums channels
            # (loss_functions.py:188-193: feats are (B, C, N), norm dim=2,
            # sum dim=1) — axis=1 here in channels-last
            d1 = jnp.sum(safe_norm(
                ((c_feat1s[layer] - t_c_feat1s[layer][it]) ** 2) / 2,
                axis=1), axis=-1)                         # (B,)
            src_ht += alpha[layer] * jnp.sum(r * d1)
            d2 = jnp.sum(safe_norm(
                ((c_feat2s[layer] - t_c_feat2s[layer][it]) ** 2) / 2,
                axis=1), axis=-1)
            tgt_ht += alpha[layer] * jnp.sum(r * d2)
    loss2 = 0.5 * (src_ht + tgt_ht)
    return gamma * loss1 + (1 - gamma) * loss2


def cross_bidirection_loss_ht(outputs, feat1s, fps_idxs1, gt_flow,
                              teacher_outputs, t_feat1s, t_feat2s, gamma,
                              beta, layer=(2, 3), alpha=ALPHA):
    """Cross-feature hint: student feat1s[l] mimics concat of teacher's
    both-cloud features (loss_functions.py:201-219 — the loss used by
    distilTrain.py:174 with γ=0.3, β=0.8, layer=[2,3]). The student layer must
    be sized t_feat1+t_feat2 wide for the difference to typecheck."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs1, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    hint = jnp.zeros((), jnp.float32)
    for each in layer:
        t_feats = jnp.concatenate([t_feat1s[each], t_feat2s[each]], axis=-1)
        hint += jnp.sum((feat1s[each] - t_feats) ** 2) / 2
    return beta * (gamma * loss1 + (1 - gamma) * loss2) + (1 - beta) * hint


def cross_loss(outputs, crosses, fps_idxs1, gt_flow, teacher_outputs,
               t_crosses, gamma, beta, alpha=ALPHA):
    """Cost-volume mimic across all levels (loss_functions.py:222-235)."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs1, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    c_loss = jnp.zeros((), jnp.float32)
    for layer in range(len(crosses)):
        c_loss += (jnp.sum(((crosses[layer] - t_crosses[layer]) ** 2) / 2)
                   / crosses[layer].size)
    return beta * (gamma * loss1 + (1 - gamma) * loss2) + (1 - beta) * c_loss


def bridge_ht_loss(outputs, feat1s, feat2s, fps_idxs1, gt_flow,
                   teacher_outputs, br_feat1, br_feat2, gamma, beta,
                   layer=3, alpha=ALPHA):
    """Hints against the Bridge module's mixed features
    (loss_functions.py:238-251; used by distillBridge.py:181 with layer=3)."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs1, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    src = jnp.sum(((feat1s[layer] - br_feat1) ** 2) / 2)
    tgt = jnp.sum(((feat2s[layer] - br_feat2) ** 2) / 2)
    return (beta * (gamma * loss1 + (1 - gamma) * loss2)
            + (1 - beta) * (0.5 * src + 0.5 * tgt))


def bridge_ht_loss_iter(outputs, feat1s, feat2s, fps_idxs1, gt_flow,
                        teacher_outputs, br_feat1s, br_feat2s, gamma, beta,
                        layer=(2, 3), alpha=ALPHA):
    """Multi-layer bridge hints (loss_functions.py:253-270): br_feat*s[i]
    pairs with student feat*s[layer[i]]."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs1, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    src = jnp.zeros((), jnp.float32)
    tgt = jnp.zeros((), jnp.float32)
    for i, each in enumerate(layer):
        src += jnp.sum(((feat1s[each] - br_feat1s[i]) ** 2) / 2)
        tgt += jnp.sum(((feat2s[each] - br_feat2s[i]) ** 2) / 2)
    return (beta * (gamma * loss1 + (1 - gamma) * loss2)
            + (1 - beta) * (0.5 * src + 0.5 * tgt))


def double_bridge_ht_loss(outputs, feat1s, feat2s, fps_idxs1, crosses,
                          gt_flow, teacher_outputs, br_feat1, br_feat2,
                          br_crosses, gamma, beta, layer=3, alpha=ALPHA):
    """Bridge hints + cost-volume mimic, 3-way gamma blend
    (loss_functions.py:274-293); gamma is a 3-sequence."""
    loss1 = multi_scale_loss(outputs, _flow0(teacher_outputs), fps_idxs1, alpha)
    loss2 = multi_scale_loss(outputs, gt_flow, fps_idxs1, alpha)
    loss3 = jnp.zeros((), jnp.float32)
    for i in range(len(br_crosses)):
        loss3 += (jnp.sum(((crosses[i] - br_crosses[i]) ** 2) / 2)
                  / crosses[i].size)
    src = jnp.sum(((feat1s[layer] - br_feat1) ** 2) / 2)
    tgt = jnp.sum(((feat2s[layer] - br_feat2) ** 2) / 2)
    return (beta * (gamma[0] * loss1 + gamma[1] * loss2 + gamma[2] * loss3)
            + (1 - beta) * (0.5 * src + 0.5 * tgt))
