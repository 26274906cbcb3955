"""Training: jitted steps, optimizer/schedule, KD steps, checkpoints
(SURVEY.md §3.1, §3.3-3.4, §5 checkpoint/resume)."""

from .checkpoints import (best_checkpoint, load_checkpoint,
                          parse_epoch_from_name, save_checkpoint)
from .distill import (make_bridge_distill_step, make_distill_step,
                      make_fast_distill_step)
from .loop import (batch_to_device, eval_sceneflow, make_eval_step,
                   make_train_step)
from .state import (LEARNING_RATE_CLIP, TrainState, custom_lr,
                    lr_for_epoch, make_optimizer, set_learning_rate, step_lr)

__all__ = [
    "best_checkpoint", "load_checkpoint", "parse_epoch_from_name",
    "save_checkpoint",
    "make_bridge_distill_step", "make_distill_step", "make_fast_distill_step",
    "batch_to_device", "eval_sceneflow", "make_eval_step", "make_train_step",
    "LEARNING_RATE_CLIP", "TrainState", "custom_lr", "lr_for_epoch",
    "make_optimizer", "set_learning_rate", "step_lr",
]
