"""Experiment assembly: config → datasets/loaders/model/optimizer → loops.

The glue the reference spreads across its entry scripts
(train_bid_pointconv.py:20-181, distilTrain.py:25-208, etc.) lives here once;
the CLI scripts are thin wrappers.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional

import jax
import numpy as np

from ..data import DATASETS, Augmentation, DataLoader, ProcessData
from ..models import PRESETS, BidPointFlowNet
from ..parallel import (data_parallel_plan, replicate,
                        resolve_global_batch)
from ..utils import Config, blue, make_experiment_dir, make_logger
from .checkpoints import (full_state_tree,
                          restore_train_state, save_checkpoint)
from .loop import batch_to_device, eval_sceneflow, make_eval_step, make_train_step
from .state import TrainState, lr_for_epoch, make_optimizer, set_learning_rate


def build_transforms(args: Config):
    dp = args.data_process
    train_tf = Augmentation(args.aug_together, args.aug_pc2,
                            depth_threshold=dp["DEPTH_THRESHOLD"],
                            no_corr=dp["NO_CORR"],
                            num_points=args.num_points,
                            allow_less_points=args.allow_less_points) \
        if "aug_together" in args else None
    val_tf = ProcessData(depth_threshold=dp["DEPTH_THRESHOLD"],
                         no_corr=dp["NO_CORR"], num_points=args.num_points,
                         allow_less_points=args.allow_less_points)
    return train_tf, val_tf


def build_datasets(args: Config, need_train: bool = True):
    train_tf, val_tf = build_transforms(args)
    cls = DATASETS[args.dataset]
    kwargs = dict(data_root=args.data_root)
    if args.dataset.startswith("FlyingThings"):
        train_ds = (cls(train=True, transform=train_tf, full=args.get("full", True),
                        **kwargs) if need_train else None)
        val_ds = cls(train=False, transform=val_tf, **kwargs)
    else:
        train_ds = (cls(train=True, transform=train_tf, **kwargs)
                    if need_train else None)
        val_ds = cls(train=False, transform=val_tf, **kwargs)
    return train_ds, val_ds


def build_model(args: Config, preset_key: str = "model_preset",
                default: str = "teacher") -> BidPointFlowNet:
    preset = args.get(preset_key, default)
    return BidPointFlowNet(PRESETS[preset])


def init_model(model, batch_np, seed: int = 0):
    batch = batch_to_device(batch_np)
    return jax.jit(lambda k: model.init(
        k, batch["pos1"], batch["pos2"], batch["norm1"], batch["norm2"],
        train=False))(jax.random.PRNGKey(seed))


def train_teacher(args: Config, max_epochs: Optional[int] = None,
                  max_steps_per_epoch: Optional[int] = None):
    """Teacher training loop (train_bid_pointconv.py:129-181)."""
    run_dir = make_experiment_dir(args.get("experiment_dir", "./experiment"),
                                  args.model_name)
    logger = make_logger(args.model_name,
                         osp.join(run_dir, "logs",
                                  f"train_{args.model_name}_sceneflow.txt"))
    logger.info("PARAMETER ... %s", dict(args))

    model = build_model(args)
    train_ds, val_ds = build_datasets(args)
    # multi-chip batch story: batch_size_per_device: true scales the config
    # batch by the mesh size (bs=3 -> 3/chip); otherwise the global batch is
    # padded to the mesh (pad rows masked out of the loss) so data
    # parallelism engages either way
    global_bs = resolve_global_batch(
        args.batch_size, args.get("batch_size_per_device", False))
    train_loader = DataLoader(train_ds, global_bs, shuffle=True,
                              drop_last=True, num_workers=args.get("workers", 2))
    # eval keeps every sample: short final batch padded, metrics weighted by
    # the real count (fixes the reference's silent drop_last truncation)
    val_loader = DataLoader(val_ds, global_bs, shuffle=False,
                            drop_last=False, pad_last=True,
                            num_workers=args.get("workers", 2))

    mesh, sharding, padded_bs = data_parallel_plan(global_bs, logger)
    train_pad = padded_bs if (sharding is not None
                              and padded_bs != global_bs) else None

    first = next(iter(train_loader))
    variables = init_model(model, first)
    if sharding is not None:
        variables = replicate(mesh, variables)

    tx = make_optimizer(args.learning_rate, args.weight_decay)
    state = TrainState.create(variables, tx)

    init_epoch, best_epe = 0, float("inf")
    if args.get("pretrain"):
        state, ckpt_epoch, best_epe, _ = restore_train_state(args.pretrain,
                                                             state)
        # full checkpoints record the last COMPLETED epoch; bare weight
        # checkpoints fall back to the reference filename convention
        # (train_bid_pointconv.py:115), which restarts that epoch
        init_epoch = (ckpt_epoch + 1 if best_epe != float("inf")
                      else ckpt_epoch)
        if sharding is not None:
            state = replicate(mesh, state)
        logger.info("loaded %s (resume at epoch %d, best epe %.4f)",
                    args.pretrain, init_epoch, best_epe)

    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    epochs = max_epochs if max_epochs is not None else args.epochs
    for epoch in range(init_epoch, epochs):
        lr = lr_for_epoch(args, epoch)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))
        logger.info("Learning rate: %f", lr)

        losses = []
        for i, batch_np in enumerate(train_loader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            batch = batch_to_device(batch_np, sharding, pad_to=train_pad)
            state, loss = train_step(state, batch)
            losses.append(loss)
        train_loss = float(np.mean([float(l) for l in losses]))
        logger.info("EPOCH %d %s mean loss: %f", epoch, blue("train"),
                    train_loss)

        eval_epe3d, eval_loss = eval_sceneflow(
            eval_step, state.variables, val_loader, sharding,
            pad_to=train_pad)
        logger.info("EPOCH %d %s mean epe3d: %f  mean eval loss: %f",
                    epoch, blue("eval"), eval_epe3d, eval_loss)

        if eval_epe3d < best_epe:
            best_epe = eval_epe3d
            path = save_checkpoint(osp.join(run_dir, "checkpoints"),
                                   args.model_name, epoch, best_epe,
                                   full_state_tree(state, epoch, best_epe))
            logger.info("Save model to %s", path)
        logger.info("Best epe loss is: %.5f", best_epe)

    return state, best_epe, run_dir
