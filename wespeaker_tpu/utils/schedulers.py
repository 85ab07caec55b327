"""Iteration-granular LR and margin schedules as pure step -> value functions.

Behavioral spec: wespeaker/utils/schedulers.py (MarginScheduler:20,
WarmupLR_withStepDecay:96, WarmupCosineScheduler:171, BaseClass:247,
ExponentialDecrease:317, TriAngular2:339), including the world-size-aware
multi-process warmup coefficient (:275-284).

Everything is written with jnp so a schedule can be evaluated on a traced
iteration counter inside the jitted train step — the schedule ramps without
recompilation and without host round-trips. Works on python floats too.
"""

import dataclasses
import math

import jax.numpy as jnp


def multi_process_coeff(step, warm_up_iter, scale_ratio, warm_from_zero=False):
    """LR scaling warmup for large global batch (schedulers.py:275-284):
    ramp the scale_ratio multiplier in over warm_up_iter iterations."""
    if warm_from_zero:
        warm = scale_ratio * step / warm_up_iter
    elif scale_ratio > 1:
        warm = (scale_ratio - 1) * step / warm_up_iter + 1.0
    else:
        return jnp.asarray(scale_ratio, jnp.float32) * jnp.ones_like(
            jnp.asarray(step, jnp.float32))
    return jnp.where(step < warm_up_iter, warm, scale_ratio)


@dataclasses.dataclass(frozen=True)
class ExponentialDecrease:
    num_epochs: int
    epoch_iter: int
    initial_lr: float
    final_lr: float
    warm_up_epoch: int = 6
    scale_ratio: float = 1.0
    warm_from_zero: bool = False

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        max_iter = self.num_epochs * self.epoch_iter
        coeff = multi_process_coeff(step, self.warm_up_epoch * self.epoch_iter,
                                    self.scale_ratio, self.warm_from_zero)
        return coeff * self.initial_lr * jnp.exp(
            (step / max_iter) * math.log(self.final_lr / self.initial_lr))


@dataclasses.dataclass(frozen=True)
class TriAngular2:
    """Cyclic LR (arXiv:1506.01186) with per-cycle amplitude decay."""
    num_epochs: int
    epoch_iter: int
    initial_lr: float
    final_lr: float
    warm_up_epoch: int = 6
    scale_ratio: float = 1.0
    cycle_step: int = 2
    reduce_lr_diff_ratio: float = 0.5

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        cycle_iter = self.cycle_step * self.epoch_iter
        step_size = cycle_iter // 2
        max_lr0, min_lr = self.initial_lr, self.final_lr
        gap = max_lr0 - min_lr
        point = step % cycle_iter
        cycle_index = step // cycle_iter
        max_lr = min_lr + gap * self.reduce_lr_diff_ratio ** cycle_index
        up = min_lr + (max_lr - min_lr) * point / step_size
        down = max_lr - (max_lr - min_lr) * (point - step_size) / step_size
        lr = jnp.where(point <= step_size, up, down)
        coeff = multi_process_coeff(step, self.warm_up_epoch * self.epoch_iter,
                                    self.scale_ratio)
        return coeff * lr


@dataclasses.dataclass(frozen=True)
class WarmupLRStepDecay:
    """Linear warmup then gamma^k staircase decay (schedulers.py:96-169)."""
    num_epochs: int
    epoch_iter: int
    initial_lr: float
    warmup_epoch: int = 1
    decay_epoch: int = 0
    gamma: float = 0.1
    scale_ratio: float = 1.0

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        warmup = self.warmup_epoch * self.epoch_iter
        decay = self.decay_epoch * self.epoch_iter
        warm = (step + 1) / (warmup + 1)
        if decay > 0:
            post = self.gamma ** jnp.floor((step - warmup) / decay)
        else:
            post = jnp.ones_like(step)
        return self.initial_lr * jnp.where(step < warmup, warm, post)


@dataclasses.dataclass(frozen=True)
class WarmupCosineScheduler:
    """Linear warmup -> cosine to min_lr -> fixed (schedulers.py:171-241)."""
    num_epochs: int
    epoch_iter: int
    min_lr: float
    max_lr: float
    warmup_epoch: int = 1
    fix_epoch: int = 1000
    scale_ratio: float = 1.0

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        warmup = self.warmup_epoch * self.epoch_iter
        fix = self.fix_epoch * self.epoch_iter
        warm_lr = self.max_lr * step / jnp.maximum(warmup, 1)
        denom = jnp.maximum(fix - warmup, 1)
        cos_lr = self.min_lr + 0.5 * (self.max_lr - self.min_lr) * (
            1 + jnp.cos(math.pi * (step - warmup) / denom))
        lr = jnp.where(step < warmup, warm_lr,
                       jnp.where(step < fix, cos_lr, self.min_lr))
        return lr


@dataclasses.dataclass(frozen=True)
class MarginScheduler:
    """Margin fixed -> (exp|linear) ramp -> fixed (schedulers.py:20-94)."""
    epoch_iter: int
    increase_start_epoch: int
    fix_start_epoch: int
    initial_margin: float
    final_margin: float
    increase_type: str = "exp"

    def __call__(self, step):
        step = jnp.asarray(step, jnp.float32)
        inc_start = (self.increase_start_epoch - 1) * self.epoch_iter
        fix_start = (self.fix_start_epoch - 1) * self.epoch_iter
        inc_iter = max(fix_start - inc_start, 1)
        cur = step - inc_start
        if self.increase_type == "exp":
            initial_val, final_val = 1.0, 1e-3
            ratio = 1.0 - jnp.exp(
                (cur / inc_iter) * math.log(final_val / (initial_val + 1e-6))
            ) * initial_val
        else:
            ratio = cur / inc_iter
        ramp = self.initial_margin + (
            self.final_margin - self.initial_margin) * ratio
        return jnp.where(
            step < inc_start, self.initial_margin,
            jnp.where(step >= fix_start, self.final_margin, ramp))


SCHEDULERS = {
    "ExponentialDecrease": ExponentialDecrease,
    "TriAngular2": TriAngular2,
    "WarmupLR_withStepDecay": WarmupLRStepDecay,
    "WarmupCosineScheduler": WarmupCosineScheduler,
}


def get_lr_scheduler(name: str, **kwargs):
    """The trainer injects generic defaults (initial_lr/final_lr/
    warm_up_epoch) that not every scheduler declares (WarmupCosineScheduler
    uses min_lr/max_lr/warmup_epoch) — keep only declared fields."""
    cls = SCHEDULERS[name]
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in kwargs.items() if k in fields})
