"""LR schedules — exact formulas of the reference (utils.py:13-31),
expressed as pure step -> lr functions for optax injection."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def cosine_schedule(init_lr: float, min_lr: float, max_steps: int
                    ) -> Callable:
    """(init-min) * 0.5 * (1 + cos(pi * step / max_steps)) + min
    (utils.py:13-17). The caption/vqa drivers call it per *step*
    (train_caption.py:127); pretrain per *epoch* (train_pretrain.py:112)."""
    def fn(step):
        return ((init_lr - min_lr) * 0.5
                * (1.0 + jnp.cos(jnp.pi * step / max_steps)) + min_lr)
    return fn


def warmup_schedule(init_lr: float, max_lr: float, max_steps: int
                    ) -> Callable:
    """min(max_lr, init + (max-init) * step / max_steps) (utils.py:20-24)."""
    def fn(step):
        return jnp.minimum(max_lr,
                           init_lr + (max_lr - init_lr) * step / max_steps)
    return fn


def step_schedule(init_lr: float, min_lr: float, decay_rate: float
                  ) -> Callable:
    """max(min_lr, init * decay**epoch) (utils.py:27-31)."""
    def fn(epoch):
        return jnp.maximum(min_lr, init_lr * decay_rate ** epoch)
    return fn


def pretrain_schedule(init_lr: float, min_lr: float, warmup_lr: float,
                      warmup_steps: int, steps_per_epoch: int,
                      max_epoch: int) -> Callable:
    """The pretrain driver's composite: per-step warmup inside the first
    `warmup_steps` of epoch 0, per-epoch cosine otherwise
    (train_pretrain.py:110-120)."""
    cos = cosine_schedule(init_lr, min_lr, max_epoch)
    warm = warmup_schedule(warmup_lr, init_lr, warmup_steps)

    def fn(step):
        epoch = step // steps_per_epoch
        in_warmup = (epoch == 0) & (step % steps_per_epoch < warmup_steps)
        return jnp.where(in_warmup, warm(step % steps_per_epoch), cos(epoch))
    return fn


def per_step_cosine(init_lr: float, min_lr: float, steps_per_epoch: int,
                    max_epoch: int) -> Callable:
    """Caption/VQA fine-tune schedule: cosine over total steps
    (train_caption.py:127: cosine(epoch*len(loader)+i, max_epoch*len(loader)))."""
    return cosine_schedule(init_lr, min_lr, steps_per_epoch * max_epoch)
