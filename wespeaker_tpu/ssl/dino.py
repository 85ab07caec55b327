"""DINO self-supervised training, TPU-native.

Behavioral spec: wespeaker/ssl/models/dino_wrapper.py (DINOHead:78,
DINOLoss:132 with teacher centering all-reduce :207-217, DINO:233 with EMA
:271) and wespeaker/ssl/utils/dino_utils.py (cosine_scheduler:105,
clip_gradients:26, cancel_gradients_last_layer:38, get_params_groups:180).

JAX design:
  - student/teacher are the same flax module with two param trees; EMA is a
    tree_map. Teacher center is part of the train state; under a global jit
    over the data mesh the centering mean is already the cross-replica mean
    (the reference needs an explicit dist.all_reduce).
  - schedules (lr, wd, teacher momentum, teacher temp) are pure step->value
    functions evaluated inside the jitted step.
  - the weight-normed last layer keeps (v, g) parametrization with g frozen
    via stop_gradient when norm_last_layer=True.
"""

import dataclasses
import math
from typing import Any, Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax


class DINOHead(nn.Module):
    out_dim: int
    use_bn: bool = False
    norm_last_layer: bool = True
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    normalize_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.normalize_input:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        init = nn.initializers.truncated_normal(0.02)
        if self.nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, kernel_init=init,
                         name="mlp_0")(x)
        elif self.nlayers > 1:
            x = nn.Dense(self.hidden_dim, kernel_init=init, name="mlp_0")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="mlp_bn_0")(x)
            x = nn.gelu(x)
            for i in range(self.nlayers - 2):
                x = nn.Dense(self.hidden_dim, kernel_init=init,
                             name=f"mlp_{i + 1}")(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     name=f"mlp_bn_{i + 1}")(x)
                x = nn.gelu(x)
            x = nn.Dense(self.bottleneck_dim, kernel_init=init,
                         name=f"mlp_{self.nlayers - 1}")(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        # weight-normalized final linear (no bias)
        v = self.param("last_layer_v", init,
                       (x.shape[-1], self.out_dim))
        g = self.param("last_layer_g", nn.initializers.ones, (self.out_dim,))
        if self.norm_last_layer:
            g = jax.lax.stop_gradient(g)
        w = v / jnp.linalg.norm(v, axis=0, keepdims=True) * g
        return x @ w


def cosine_scheduler(base_value, final_value, epochs, iters_per_epoch,
                     warmup_epochs=0, start_warmup_value=0.0):
    """Pure step->value warmup+cosine schedule (dino_utils.py:105-124)."""
    warmup_iters = warmup_epochs * iters_per_epoch
    total_iters = epochs * iters_per_epoch

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_warmup_value + (base_value - start_warmup_value) * (
            step / jnp.maximum(warmup_iters, 1))
        progress = (step - warmup_iters) / jnp.maximum(
            total_iters - warmup_iters, 1)
        cos = final_value + 0.5 * (base_value - final_value) * (
            1 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_iters, warm, cos)

    return fn


def teacher_temp_schedule(warmup_teacher_temp, teacher_temp, nepochs,
                          iters_per_epoch, warmup_ratio=0.2):
    warm_epochs = int(nepochs * warmup_ratio)

    def fn(step):
        epoch = jnp.asarray(step, jnp.float32) / iters_per_epoch
        ramp = warmup_teacher_temp + (teacher_temp - warmup_teacher_temp) * (
            epoch / jnp.maximum(warm_epochs, 1))
        return jnp.where(epoch < warm_epochs, ramp, teacher_temp)

    return fn


def dino_loss(student_out, teacher_out, center, teacher_temp, n_scrops,
              n_tcrops, student_temp=0.1, mode=0):
    """Temp-sharpened CE between teacher and student crop views
    (dino_wrapper.py:164-201). student_out: (n_scrops*B, K);
    teacher_out: (n_tcrops*B, K)."""
    s = student_out / student_temp
    t = jax.nn.softmax((teacher_out - center) / teacher_temp, axis=-1)
    t = jax.lax.stop_gradient(t)
    s_chunks = jnp.split(s, n_scrops)
    t_chunks = jnp.split(t, n_tcrops)
    total, terms = 0.0, 0
    for iq, q in enumerate(t_chunks):
        for v in range(len(s_chunks)):
            if mode == 0 and v == iq:
                continue
            if mode == 1 and v != iq:
                continue
            if mode == 2 and v < 2:
                continue
            ce = jnp.sum(-q * jax.nn.log_softmax(s_chunks[v], axis=-1),
                         axis=-1)
            total = total + ce.mean()
            terms += 1
    return total / max(terms, 1)


def no_weight_decay_mask(params):
    """True where weight decay applies: skip biases and 1-D (norm) params
    (dino_utils.get_params_groups:180-195)."""
    def fn(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if names and names[-1] in ("bias", "scale"):
            return False
        return jnp.ndim(leaf) > 1

    return jax.tree_util.tree_map_with_path(fn, params)


def make_dino_optimizer(kind: str, params, weight_decay: float = 1e-4):
    """SGD / AdamW / LARS with decoupled weight decay masked off biases and
    norm parameters; learning rate injected per-step by the train loop
    (ssl/bin/train_dino.py optimizer block)."""
    mask = no_weight_decay_mask(params)
    wd = optax.masked(optax.add_decayed_weights(weight_decay), mask)
    if kind.lower() == "lars":
        inner = lambda lr: optax.lars(lr, weight_decay=0.0)
    elif kind.lower() == "adamw":
        inner = lambda lr: optax.adam(lr)
    else:
        inner = lambda lr: optax.sgd(lr, momentum=0.9)

    @optax.inject_hyperparams
    def tx(learning_rate):
        return optax.chain(wd, inner(learning_rate))

    return tx(learning_rate=0.0)


class DINOState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    student: Any
    teacher: Any
    student_stats: Any
    teacher_stats: Any
    center: jnp.ndarray
    opt_state: Any
    rng: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    out_dim: int = 65536
    n_global: int = 2
    n_local: int = 4
    student_temp: float = 0.1
    center_momentum: float = 0.9
    freeze_last_layer_iters: int = 0
    clip_grad: float = 3.0
    mode: int = 0


def param_wise_clip(grads, params, clip: float):
    """DINO's per-parameter gradient clipping (dino_utils.py:26-36):
    g *= min(1, clip / (||g|| + 1e-6))."""
    def clip_one(g):
        norm = jnp.linalg.norm(g)
        return g * jnp.minimum(1.0, clip / (norm + 1e-6))
    return jax.tree_util.tree_map(clip_one, grads)


def make_dino_train_step(apply_fn: Callable, tx, lr_fn, momentum_fn, temp_fn,
                         cfg: DINOConfig = DINOConfig(),
                         compute_dtype=jnp.float32):
    """apply_fn(variables, feats, train, mutable) -> (head_out, new_stats):
    the backbone+head composite forward on (B, T, F) features."""
    from wespeaker_tpu.train.train_step import amp_cast

    def loss_fn(student_params, state: DINOState, g_feats, l_feats, temp):
        svars = {"params": amp_cast(student_params, compute_dtype),
                 "batch_stats": state.student_stats}
        g_feats = g_feats.astype(compute_dtype)
        l_feats = l_feats.astype(compute_dtype)
        g_out, st1 = apply_fn(svars, g_feats, True)
        svars = {"params": svars["params"], "batch_stats": st1}
        l_out, st2 = apply_fn(svars, l_feats, True)
        s_out = jnp.concatenate([g_out, l_out]).astype(jnp.float32)
        tvars = {"params": amp_cast(state.teacher, compute_dtype),
                 "batch_stats": state.teacher_stats}
        t_out, _ = apply_fn(tvars, g_feats, False)
        t_out = t_out.astype(jnp.float32)
        t_out = jax.lax.stop_gradient(t_out)
        loss = dino_loss(s_out, t_out, state.center, temp,
                         cfg.n_global + cfg.n_local, cfg.n_global,
                         cfg.student_temp, cfg.mode)
        return loss, (st2, t_out)

    def train_step(state: DINOState, batch):
        step = state.step
        lr = lr_fn(step)
        m = momentum_fn(step)
        temp = temp_fn(step)

        (loss, (new_stats, t_out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.student, state, batch["global_feat"],
                                   batch["local_feat"], temp)
        grads = param_wise_clip(grads, state.student, cfg.clip_grad)
        if cfg.freeze_last_layer_iters > 0:
            def maybe_zero(path, g):
                names = [getattr(p, "key", "") for p in path]
                if any("last_layer" in str(n) for n in names):
                    return jnp.where(step < cfg.freeze_last_layer_iters,
                                     jnp.zeros_like(g), g)
                return g
            grads = jax.tree_util.tree_map_with_path(maybe_zero, grads)

        opt_state = state.opt_state
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, state.student)
        new_student = optax.apply_updates(state.student, updates)
        new_teacher = jax.tree_util.tree_map(
            lambda tk, sk: tk * m + sk * (1.0 - m), state.teacher,
            new_student)
        new_tstats = jax.tree_util.tree_map(
            lambda tk, sk: sk, state.teacher_stats, new_stats)
        batch_center = jnp.mean(t_out, axis=0, keepdims=True)
        new_center = (state.center * cfg.center_momentum
                      + batch_center * (1 - cfg.center_momentum))
        new_state = state.replace(step=step + 1, student=new_student,
                                  teacher=new_teacher,
                                  student_stats=new_stats,
                                  teacher_stats=new_tstats,
                                  center=new_center, opt_state=new_opt)
        metrics = {"loss": loss, "lr": lr, "momentum": m, "teacher_temp": temp}
        return new_state, metrics

    return train_step


def init_dino_state(backbone, head, tx, rng, feat_dim=80,
                    embed_dim=192) -> "DINOState":
    """Build composite student/teacher variables; teacher starts as a copy."""
    k1, k2 = jax.random.split(rng)
    bvars = backbone.init(k1, jnp.zeros((2, 32, feat_dim)), train=False)
    hvars = head.init(k2, jnp.zeros((2, embed_dim)))
    params = {"backbone": bvars["params"], "head": hvars["params"]}
    stats = {"backbone": bvars.get("batch_stats", {}),
             "head": hvars.get("batch_stats", {})}
    center_dim = head.out_dim
    return DINOState(
        step=jnp.zeros((), jnp.int32),
        student=params,
        teacher=jax.tree_util.tree_map(jnp.array, params),
        student_stats=stats,
        teacher_stats=jax.tree_util.tree_map(jnp.array, stats),
        center=jnp.zeros((1, center_dim)),
        opt_state=tx.init(params),
        rng=rng)


def make_apply_fn(backbone, head):
    def apply_fn(variables, feats, train):
        bvars = {"params": variables["params"]["backbone"],
                 "batch_stats": variables["batch_stats"]["backbone"]}
        if train:
            emb, mut = backbone.apply(bvars, feats, train=True,
                                      mutable=["batch_stats"])
            new_bstats = mut["batch_stats"]
        else:
            emb = backbone.apply(bvars, feats, train=False)
            new_bstats = variables["batch_stats"]["backbone"]
        hvars = {"params": variables["params"]["head"]}
        hstats = variables["batch_stats"]["head"]
        if hstats:
            hvars["batch_stats"] = hstats
            if train:
                out, hmut = head.apply(hvars, emb, train=True,
                                       mutable=["batch_stats"])
                hstats = hmut["batch_stats"]
            else:
                out = head.apply(hvars, emb, train=False)
        else:
            out = head.apply(hvars, emb)
        return out, {"backbone": new_bstats, "head": hstats}

    return apply_fn
