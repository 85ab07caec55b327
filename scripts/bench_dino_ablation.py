"""DINO step component timing: where do the 41 ms go?

Companion to bench_train_ablation for the SSL trainer (reference workload
wespeaker/ssl/bin/train_dino.py:43-255 at the voxceleb/v3/dino config).
Unlike the knock-out harnesses, the DINO step decomposes cleanly into
jitted sub-programs, so each is timed directly with the on-device loop
timer (utils/bench_timing.py) at the bench config (ECAPA-GLOB-c512,
b=64, 2x3 s + 4x2 s crops, 65536-dim head, bf16). Pieces re-fuse
differently in isolation than inside the whole step, so the parts need
not sum exactly to the whole — each number is that component's
standalone cost, the gap is fusion/overlap.

Variants (one per invocation — tunnel compiles):
  full       whole train step (= bench_dino_step fori-loop number)
  teacher    teacher fwd on the 2 global crops (eval mode)
  student    student fwd on global+local crops (train mode, no grad)
  fwdbwd     value_and_grad of the DINO loss (student+teacher fwd + bwd)
  tail       clip + SGD update + EMA + center update with precomputed
             grads (the step minus fwdbwd, roughly)
  head       head-only fwd+bwd at (384, 192) embeddings

Usage: python scripts/bench_dino_ablation.py [variant] [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import wespeaker_tpu.ssl.dino as D
from wespeaker_tpu.utils.bench_timing import time_fn_on_device

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_dino_step import G_SEC, L_SEC, N_G, N_L, SR, build  # noqa: E402


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    step_fn, state, featurize = build(batch)
    rng = np.random.default_rng(0)
    g_wav = jnp.asarray(rng.uniform(
        -0.5, 0.5, (N_G * batch, int(G_SEC * SR))).astype(np.float32))
    l_wav = jnp.asarray(rng.uniform(
        -0.5, 0.5, (N_L * batch, int(L_SEC * SR))).astype(np.float32))
    feats = {"global_feat": featurize(g_wav), "local_feat": featurize(l_wav)}
    state = jax.device_put(state)

    backbone, head, apply_fn, cfg, tx = _rebuild(batch)
    compute = jnp.bfloat16
    from wespeaker_tpu.train.train_step import amp_cast

    def loss_fn(student_params, g_feats, l_feats):
        svars = {"params": amp_cast(student_params, compute),
                 "batch_stats": state.student_stats}
        g_out, st1 = apply_fn(svars, g_feats.astype(compute), True)
        svars = {"params": svars["params"], "batch_stats": st1}
        l_out, _ = apply_fn(svars, l_feats.astype(compute), True)
        s_out = jnp.concatenate([g_out, l_out]).astype(jnp.float32)
        tvars = {"params": amp_cast(state.teacher, compute),
                 "batch_stats": state.teacher_stats}
        t_out, _ = apply_fn(tvars, g_feats.astype(compute), False)
        t_out = jax.lax.stop_gradient(t_out.astype(jnp.float32))
        return D.dino_loss(s_out, t_out, state.center, 0.05,
                           cfg.n_global + cfg.n_local, cfg.n_global)

    if variant == "full":
        def body(_, st):
            st2, _m = step_fn(st, feats)
            return st2
        import time
        loop = jax.jit(lambda st, n: jax.lax.fori_loop(0, n, body, st))

        def run(n):
            t0 = time.perf_counter()
            st = loop(state, n)
            _ = float(st.step)
            return time.perf_counter() - t0
        run(2)
        lo = min(run(3) for _ in range(2))
        hi = min(run(13) for _ in range(2))
        dt = max(hi - lo, 1e-9) / 10
    elif variant == "teacher":
        tvars = {"params": amp_cast(state.teacher, compute),
                 "batch_stats": state.teacher_stats}
        fn = lambda d: apply_fn(tvars, d["g"].astype(compute), False)[0]  # noqa: E731
        dt = time_fn_on_device(jax.jit(fn), {"g": feats["global_feat"]})
    elif variant == "student":
        svars = {"params": amp_cast(state.student, compute),
                 "batch_stats": state.student_stats}

        def fn(d):
            g, st1 = apply_fn(svars, d["g"].astype(compute), True)
            sv = {"params": svars["params"], "batch_stats": st1}
            l, _ = apply_fn(sv, d["l"].astype(compute), True)
            return jnp.concatenate([g, l])
        dt = time_fn_on_device(jax.jit(fn), {"g": feats["global_feat"],
                                             "l": feats["local_feat"]})
    elif variant == "fwdbwd":
        def fn(d):
            loss, grads = jax.value_and_grad(loss_fn)(state.student,
                                                      d["g"], d["l"])
            return loss + sum(jnp.sum(g.astype(jnp.float32))
                              for g in jax.tree_util.tree_leaves(grads))
        dt = time_fn_on_device(jax.jit(fn), {"g": feats["global_feat"],
                                             "l": feats["local_feat"]})
    elif variant == "tail":
        grads = jax.tree_util.tree_map(
            lambda a: jnp.ones_like(a) * 1e-4, state.student)
        t_out = jnp.asarray(rng.normal(
            size=(N_G * batch, 65536)).astype(np.float32))

        def fn(d):
            g2 = jax.tree_util.tree_map(
                lambda g: g * (1.0 + d["x"][0] * 0), grads)
            g2 = D.param_wise_clip(g2, state.student, cfg.clip_grad)
            updates, _ = tx.update(g2, state.opt_state, state.student)
            new_student = optax.apply_updates(state.student, updates)
            new_teacher = jax.tree_util.tree_map(
                lambda tk, sk: tk * 0.996 + sk * 0.004, state.teacher,
                new_student)
            center = (state.center * 0.9
                      + jnp.mean(t_out, 0, keepdims=True) * 0.1)
            return (sum(jnp.sum(v.astype(jnp.float32))
                        for v in jax.tree_util.tree_leaves(new_teacher))
                    + jnp.sum(center))
        dt = time_fn_on_device(jax.jit(fn), {"x": jnp.zeros(1)})
    elif variant == "head":
        hvars = {"params": amp_cast(state.student["head"], compute)}
        hstats = state.student_stats["head"]
        if hstats:
            hvars["batch_stats"] = hstats
        emb = jnp.asarray(rng.normal(size=(
            (N_G + N_L) * batch, 192)).astype(np.float32))
        t_out = jnp.asarray(rng.normal(
            size=(N_G * batch, 65536)).astype(np.float32))

        def hloss(params, e):
            hv = dict(hvars)
            hv["params"] = amp_cast(params, compute)
            if hstats:
                out, _ = head.apply(hv, e.astype(compute), train=True,
                                    mutable=["batch_stats"])
            else:
                out = head.apply(hv, e.astype(compute))
            return D.dino_loss(out.astype(jnp.float32), t_out, state.center,
                               0.05, cfg.n_global + cfg.n_local,
                               cfg.n_global)

        def fn(d):
            loss, grads = jax.value_and_grad(hloss)(state.student["head"],
                                                    d["e"])
            return loss + sum(jnp.sum(g.astype(jnp.float32))
                              for g in jax.tree_util.tree_leaves(grads))
        dt = time_fn_on_device(jax.jit(fn), {"e": emb})
    else:
        raise SystemExit(f"unknown variant {variant}")

    print(json.dumps({"variant": variant, "batch": batch,
                      "ms": round(dt * 1e3, 2)}))


def _rebuild(batch):
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    backbone = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                          global_context_att=True)
    head = D.DINOHead(out_dim=65536, hidden_dim=2048, bottleneck_dim=256,
                      use_bn=True)
    cfg = D.DINOConfig(out_dim=65536, n_global=N_G, n_local=N_L,
                       freeze_last_layer_iters=1000, clip_grad=3.0)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.0,
                                             momentum=0.9)
    return backbone, head, D.make_apply_fn(backbone, head), cfg, tx


if __name__ == "__main__":
    main()
