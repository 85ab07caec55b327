"""MoCo and SimCLR contrastive SSL, TPU-native.

Behavioral spec: wespeaker/ssl/models/moco_wrapper.py (momentum key encoder,
ring-buffer negative queue with cross-GPU all_gather :193-205) and
simclr_wrapper.py (InfoNCE over n_views).

JAX design: under a single jit over the data mesh the batch is already
global, so the reference's concat_all_gather and DDP batch-shuffle (a
BatchNorm-statistics trick) are unnecessary — BN statistics are computed
globally by XLA. The queue is a fixed-size buffer carried in the train
state with a rolled pointer (static-shape dynamic_update_slice).
"""

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


def l2norm(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True),
                           1e-12)


class MoCoState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    query_params: Any
    key_params: Any
    batch_stats: Any
    key_stats: Any
    queue: jnp.ndarray      # (K, D), L2-normalized negatives
    queue_ptr: jnp.ndarray  # ()
    opt_state: Any
    rng: jnp.ndarray


def moco_loss(q, k, queue, T=0.07):
    """InfoNCE with the current keys as positives and the queue as negatives
    (moco builder semantics). q,k: (B, D); queue: (K, D)."""
    q = l2norm(q)
    k = jax.lax.stop_gradient(l2norm(k))
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)  # (B, 1)
    l_neg = q @ queue.T  # (B, K)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / T
    labels = jnp.zeros(q.shape[0], jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits,
                                                           labels).mean()
    acc = jnp.mean((jnp.argmax(logits, axis=1) == 0).astype(jnp.float32))
    return loss, acc, k


def enqueue(queue, ptr, keys):
    """Ring-buffer insert of (B, D) keys at ptr (static shapes)."""
    b = keys.shape[0]
    queue = jax.lax.dynamic_update_slice(queue, keys, (ptr, 0))
    return queue, (ptr + b) % queue.shape[0]


def make_moco_train_step(encode_fn: Callable, tx, lr_fn, m: float = 0.999,
                         T: float = 0.07, compute_dtype=jnp.float32):
    """encode_fn(params, batch_stats, feats, train) ->
    (embeddings, new_stats)."""
    from wespeaker_tpu.train.train_step import amp_cast

    def loss_fn(params, state: MoCoState, q_feats, k_feats):
        q, new_stats = encode_fn(amp_cast(params, compute_dtype),
                                 state.batch_stats,
                                 q_feats.astype(compute_dtype), True)
        k, _ = encode_fn(amp_cast(state.key_params, compute_dtype),
                         state.key_stats,
                         k_feats.astype(compute_dtype), False)
        loss, acc, k = moco_loss(q.astype(jnp.float32),
                                 k.astype(jnp.float32), state.queue, T)
        return loss, (acc, k, new_stats)

    def train_step(state: MoCoState, batch):
        lr = lr_fn(state.step)
        (loss, (acc, k, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.query_params, state,
                                   batch["q_feat"], batch["k_feat"])
        opt_state = state.opt_state
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, state.query_params)
        new_q = optax.apply_updates(state.query_params, updates)
        new_k = jax.tree_util.tree_map(lambda kk, qq: kk * m + qq * (1 - m),
                                       state.key_params, new_q)
        queue, ptr = enqueue(state.queue, state.queue_ptr, k)
        new_state = state.replace(step=state.step + 1, query_params=new_q,
                                  key_params=new_k, batch_stats=new_stats,
                                  key_stats=new_stats, queue=queue,
                                  queue_ptr=ptr, opt_state=new_opt)
        return new_state, {"loss": loss, "acc": acc, "lr": lr}

    return train_step


def simclr_loss(features, n_views=2, T=0.07):
    """InfoNCE over all views (simclr_wrapper.py:43-86).
    features: (n_views*B, D) ordered view-major."""
    n = features.shape[0]
    bs = n // n_views
    labels = jnp.tile(jnp.arange(bs), n_views)
    same = labels[None, :] == labels[:, None]
    eye = jnp.eye(n, dtype=bool)
    feats = l2norm(features)
    sim = feats @ feats.T / T
    pos_mask = same & ~eye
    neg_mask = ~same
    # log-softmax over [positives ; negatives] with positives first
    pos = jnp.where(pos_mask, sim, -jnp.inf)
    all_mask = pos_mask | neg_mask
    denom = jax.nn.logsumexp(jnp.where(all_mask, sim, -jnp.inf), axis=1)
    pos_logit = jax.nn.logsumexp(pos, axis=1) - jnp.log(n_views - 1.0)
    loss = jnp.mean(denom - pos_logit)
    return loss


class SimCLRState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


def make_simclr_train_step(encode_fn: Callable, tx, lr_fn, n_views=2,
                           T=0.07, compute_dtype=jnp.float32):
    from wespeaker_tpu.train.train_step import amp_cast

    def loss_fn(params, stats, feats):
        emb, new_stats = encode_fn(amp_cast(params, compute_dtype), stats,
                                   feats.astype(compute_dtype), True)
        return simclr_loss(emb.astype(jnp.float32), n_views, T), new_stats

    def train_step(state: SimCLRState, batch):
        lr = lr_fn(state.step)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch["feat"])
        opt_state = state.opt_state
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_state = state.replace(step=state.step + 1,
                                  params=optax.apply_updates(state.params,
                                                             updates),
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss, "lr": lr}

    return train_step
