"""KD experiment loops: standard, bridge, and fast/iterative distillation.

Rebuilds of distilTrain.py:25-208, distillBridge.py:27-216, and
fast_distillTrain.py:25-217. Each builds a frozen teacher + trainable
student, runs the epoch loop with the matching KD loss, evaluates the student
per epoch (fast mode: every 5th epoch inside [FROM, UNTIL],
fast_distillTrain.py:142-144, 200), and checkpoints on best EPE.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional

import jax
import numpy as np

from .. import losses as loss_lib
from ..data import DataLoader
from ..models import PRESETS, BidPointFlowNet, Bridge
from ..parallel import (data_parallel_sharding, replicate,
                        resolve_global_batch)
from ..utils import Config, blue, make_experiment_dir, make_logger
from .checkpoints import (full_state_tree, load_checkpoint,
                          restore_train_state, save_checkpoint)
from .distill import (make_bridge_distill_step, make_distill_step,
                      make_fast_distill_step)
from .experiment import build_datasets, init_model
from .loop import batch_to_device, eval_sceneflow, make_eval_step
from .state import TrainState, make_optimizer, set_learning_rate, step_lr

# fast_distillTrain.py:142-144: eval every FAST_RATIO epochs between FROM/UNTIL
FAST_FROM, FAST_UNTIL, FAST_RATIO = 20, 400, 5


def compute_teacher_history(t_model, t_variables, loader, max_batches=None):
    """Pre-pass of the frozen teacher over the train set collecting its
    multiScaleLoss per batch (distilTrain.py:142, feeds
    attentiveImitationLoss's min/max normalization)."""
    from ..losses import multi_scale_loss
    from .loop import batch_to_device

    @jax.jit
    def step(variables, batch):
        out = t_model.apply(variables, batch["pos1"], batch["pos2"],
                            batch["norm1"], batch["norm2"], train=False)
        return multi_scale_loss(out["flows"], batch["flow"], out["fps_idx1"])

    history = []
    for i, batch_np in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        history.append(float(step(t_variables, batch_to_device(batch_np))))
    return history


def make_named_loss(name: str, args):
    """Resolve a KD loss by its reference name with config hyperparams.
    Covers the loss menu the reference entry scripts switch between
    (distilTrain.py:174 and the commented alternatives)."""
    gamma = args.get("gamma", 0.3)
    beta = args.get("beta", 0.8)
    layers = tuple(args.get("hint_layers", (2, 3)))

    def fn(s_out, t_out, batch, t_history=None):
        common = dict(gt_flow=batch["flow"])
        if name == "loss_fn_kd_2":
            return loss_lib.loss_fn_kd_2(s_out["flows"], s_out["fps_idx1"],
                                         batch["flow"], t_out["flows"],
                                         t_out["fps_idx1"], gamma)
        if name == "attentiveImitationLoss":
            return loss_lib.attentive_imitation_loss(
                s_out["flows"], s_out["fps_idx1"], batch["flow"],
                t_out["flows"], t_out["fps_idx1"], t_history, gamma)
        if name == "biDirectionLoss":
            return loss_lib.bidirection_loss(
                s_out["flows"], s_out["fps_idx1"], s_out["fps_idx2"],
                batch["flow"], t_out["flows"], t_out["fps_idx1"],
                gamma, args.get("gamma2", gamma), beta)
        if name == "biDirection_loss_ht":
            return loss_lib.bidirection_loss_ht(
                s_out["flows"], s_out["feat1s"], s_out["feat2s"],
                s_out["fps_idx1"], batch["flow"], t_out["flows"],
                t_out["feat1s"], t_out["feat2s"], gamma, beta,
                layer=layers[0] if len(layers) == 1 else layers[-1])
        if name == "cross_biDirection_loss_ht":
            return loss_lib.cross_bidirection_loss_ht(
                s_out["flows"], s_out["feat1s"], s_out["fps_idx1"],
                batch["flow"], t_out["flows"], t_out["feat1s"],
                t_out["feat2s"], gamma, beta, layers)
        if name == "cross_loss":
            return loss_lib.cross_loss(
                s_out["flows"], s_out["crosses"], s_out["fps_idx1"],
                batch["flow"], t_out["flows"], t_out["crosses"], gamma, beta)
        raise ValueError(f"unknown kd loss {name}")

    return fn


def _load_teacher(model: BidPointFlowNet, ckpt_path: str, batch_np):
    variables = init_model(model, batch_np, seed=1)
    if ckpt_path:
        restored = load_checkpoint(
            ckpt_path, {"params": variables["params"],
                        "batch_stats": variables.get("batch_stats", {})})
        variables = {"params": restored["params"],
                     "batch_stats": restored.get("batch_stats", {})}
    return variables


def distill(args: Config, mode: str = "standard",
            max_epochs: Optional[int] = None,
            max_steps_per_epoch: Optional[int] = None):
    """mode: standard (distilTrain) | bridge (distillBridge) |
    fast (fast_distillTrain)."""
    presets = {
        "standard": ("teacher", "lighttoken_res"),   # distilTrain.py:103-105
        "bridge": ("teacher", "lighttoken_res"),     # distillBridge.py
        "fast": ("bifeat", "fg"),                    # fast_distillTrain.py:103-105
    }
    t_preset, s_preset = presets[mode]
    t_preset = args.get("teacher_preset", t_preset)
    s_preset = args.get("student_preset", s_preset)

    run_dir = make_experiment_dir(args.get("experiment_dir", "./experiment"),
                                  args.model_name, tag=f"-KD-{mode}")
    logger = make_logger(f"{args.model_name}_kd_{mode}",
                         osp.join(run_dir, "logs", "train_kd.txt"))
    logger.info("PARAMETER ... %s", dict(args))

    t_model = BidPointFlowNet(PRESETS[t_preset])
    s_model = BidPointFlowNet(PRESETS[s_preset])

    train_ds, val_ds = build_datasets(args)
    # multi-chip batch story: batch_size_per_device: true gives bs/chip
    # (global = bs x mesh). The KD losses reduce over the batch internally
    # (no per-sample variant), so a non-divisible GLOBAL batch falls back to
    # single-device here — the shipped bs=8 divides a v5e-8 exactly.
    global_bs = resolve_global_batch(
        args.batch_size, args.get("batch_size_per_device", False))
    train_loader = DataLoader(train_ds, global_bs, shuffle=True,
                              drop_last=True, num_workers=args.get("workers", 2))
    val_loader = DataLoader(val_ds, global_bs, shuffle=False,
                            drop_last=False, pad_last=True,
                            num_workers=args.get("workers", 2))

    # same data-parallel mesh as train_teacher (DataParallel gating parity:
    # distilTrain.py:108-114) — teacher + student replicated, batch sharded
    mesh, sharding = data_parallel_sharding(global_bs, logger)

    first = next(iter(train_loader))
    teacher_ckpt = None
    if args.get("ckpt_dir") and args.get("teacher_model"):
        teacher_ckpt = osp.join(args.ckpt_dir, args.teacher_model)
    t_variables = _load_teacher(t_model, teacher_ckpt, first)

    s_variables = init_model(s_model, first)
    tx = make_optimizer(args.learning_rate, args.weight_decay)
    state = TrainState.create(s_variables, tx)

    init_epoch, best_epe = 0, float("inf")
    if args.get("pretrain"):
        state, ckpt_epoch, best_epe, _ = restore_train_state(args.pretrain,
                                                             state)
        init_epoch = (ckpt_epoch + 1 if best_epe != float("inf")
                      else ckpt_epoch)
        logger.info("student resume from %s (epoch %d, best epe %.4f)",
                    args.pretrain, init_epoch, best_epe)

    if sharding is not None:
        t_variables = replicate(mesh, t_variables)
        state = replicate(mesh, state)

    if mode == "standard":
        # loss selectable by reference name (distilTrain.py:174 and its
        # commented alternatives). NB: the reference default
        # cross_biDirection_loss_ht requires the student's hint layers to be
        # 2x the teacher width (it mimics the concat of both teacher clouds)
        # — with the shipped same-width student it is shape-inconsistent, as
        # in the reference itself.
        loss_name = args.get("kd_loss", "cross_biDirection_loss_ht")
        named = make_named_loss(loss_name, args)
        t_history = None
        if loss_name == "attentiveImitationLoss":
            t_history = compute_teacher_history(
                t_model, t_variables, train_loader,
                max_batches=args.get("history_batches"))
        step = make_distill_step(
            t_model, s_model, tx,
            loss_fn=lambda s_out, t_out, b: named(s_out, t_out, b,
                                                  t_history=t_history))
    elif mode == "fast":
        step = make_fast_distill_step(t_model, s_model, tx,
                                      gamma=args.get("gamma", 0.6),
                                      layers=tuple(args.get("hint_layers",
                                                            (1, 2))))
    else:  # bridge
        bridge = Bridge(feat_ch=args.get("bridge_feat_ch", 512))
        b_tx = make_optimizer(args.learning_rate, args.weight_decay)
        t_l3 = jax.eval_shape(
            lambda: t_model.apply(
                t_variables, *[batch_to_device(first)[k] for k in
                               ("pos1", "pos2", "norm1", "norm2")],
                train=False))
        layer = args.get("hint_layer", 3)
        feat_shape = t_l3["feat1s"][layer]
        b_params = bridge.init(
            jax.random.PRNGKey(2),
            np.zeros(feat_shape.shape, np.float32),
            np.zeros(feat_shape.shape, np.float32))["params"]
        b_opt = b_tx.init(b_params)
        if args.get("pretrain"):
            # bridge params/opt travel with the student checkpoint — restore
            # them too when resuming (full_state_tree extra trees)
            _, _, _, extra = restore_train_state(
                args.pretrain, state,
                extra={"bridge_params": b_params, "bridge_opt": b_opt})
            b_params = extra["bridge_params"]
            b_opt = extra["bridge_opt"]
        step = make_bridge_distill_step(t_model, s_model, bridge, tx, b_tx,
                                        gamma=args.get("gamma", 0.3),
                                        beta=args.get("beta", 0.8),
                                        layer=layer)

    eval_step = make_eval_step(s_model)

    epochs = max_epochs if max_epochs is not None else args.epochs
    for epoch in range(init_epoch, epochs):
        lr = step_lr(args.learning_rate, epoch)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

        losses = []
        for i, batch_np in enumerate(train_loader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            batch = batch_to_device(batch_np, sharding)
            if mode == "bridge":
                state, b_params, b_opt, loss = step(state, b_params, b_opt,
                                                    t_variables, batch)
            else:
                state, loss = step(state, t_variables, batch)
            losses.append(loss)
        train_loss = float(np.mean([float(l) for l in losses]))
        logger.info("EPOCH %d %s mean loss: %f", epoch, blue("train"),
                    train_loss)

        do_eval = True
        if mode == "fast" and FAST_FROM <= epoch <= FAST_UNTIL:
            do_eval = (epoch % FAST_RATIO == 0)
        if do_eval:
            eval_epe3d, eval_loss = eval_sceneflow(eval_step, state.variables,
                                                   val_loader, sharding)
            logger.info("EPOCH %d %s mean epe3d: %f  eval loss: %f",
                        epoch, blue("eval"), eval_epe3d, eval_loss)
            if eval_epe3d < best_epe:
                best_epe = eval_epe3d
                extra = ({"bridge_params": b_params, "bridge_opt": b_opt}
                         if mode == "bridge" else None)
                path = save_checkpoint(osp.join(run_dir, "checkpoints"), "S",
                                       epoch, best_epe,
                                       full_state_tree(state, epoch, best_epe,
                                                       extra=extra))
                logger.info("Save model to %s", path)

    return state, best_epe, run_dir
