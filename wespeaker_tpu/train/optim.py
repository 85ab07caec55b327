"""Optimizer construction from config.

Behavioral spec: wespeaker/bin/train.py:188-204 — torch SGD(momentum=0.9,
weight_decay=...) or Adam/AdamW, LR driven per-iteration by the scheduler
with scale_ratio = world_size * batch_size / 64.

optax translation: inject_hyperparams exposes `learning_rate` as opt_state
data the jitted train step writes each iteration; weight decay matches torch
semantics (SGD: decay added to grad before momentum; AdamW: decoupled).
"""

import optax


def make_optimizer(conf: dict,
                   trainable_mask=None) -> optax.GradientTransformation:
    """trainable_mask: optional params -> bool-pytree; when given, the
    transformation (incl. weight decay) only touches True leaves — the
    frozen-frontend equivalent of torch skipping requires_grad=False params
    (frozen params still get exactly-zero grads from stop_gradient, so the
    masked-out passthrough is a no-op update)."""
    name = conf.get("optimizer", "SGD").lower()
    wd = float(conf.get("optimizer_args", {}).get("weight_decay", 1e-4))
    momentum = float(conf.get("optimizer_args", {}).get("momentum", 0.9))
    nesterov = bool(conf.get("optimizer_args", {}).get("nesterov", True))

    def wrap(inner):
        return optax.masked(inner, trainable_mask) if trainable_mask \
            else inner

    if name == "sgd":
        @optax.inject_hyperparams
        def tx(learning_rate):
            return wrap(optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.sgd(learning_rate, momentum=momentum,
                          nesterov=nesterov),
            ))
        return tx(learning_rate=0.0)
    if name == "adam":
        @optax.inject_hyperparams
        def tx(learning_rate):
            return wrap(optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.adam(learning_rate),
            ))
        return tx(learning_rate=0.0)
    if name == "adamw":
        @optax.inject_hyperparams
        def tx(learning_rate):
            return wrap(optax.adamw(learning_rate, weight_decay=wd))
        return tx(learning_rate=0.0)
    raise ValueError(f"unknown optimizer {name}")


def lr_scale_ratio(world_size: int, batch_size: int) -> float:
    """Linear LR scaling for the global batch (train.py:201-204)."""
    return world_size * batch_size / 64.0
