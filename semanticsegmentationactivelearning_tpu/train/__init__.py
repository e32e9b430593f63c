"""Training runtime: config, optimizer, steps, checkpointing."""

from . import checkpoint, config, optim, steps
from .steps import (TrainState, create_train_state, make_embed_step,
                    make_eval_step, make_group_score_step,
                    make_grouped_train_step,
                    make_mc_score_step, make_pool_score_step,
                    make_predict_step, make_score_step, make_train_step)

__all__ = ["checkpoint", "config", "optim", "steps", "TrainState",
           "create_train_state", "make_train_step", "make_eval_step",
           "make_score_step", "make_pool_score_step", "make_predict_step",
           "make_mc_score_step", "make_embed_step",
           "make_group_score_step", "make_grouped_train_step"]
