"""Perf: fused Res2 Pallas kernel (fp32/bf16) vs XLA chain, standalone and
end-to-end ECAPA. Runs on the ambient (TPU tunnel) backend."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # fetch a scalar: block_until_ready can return early through the tunnel
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def standalone(b=512, t=200, c=512, scale=8, dilation=2):
    from wespeaker_tpu.ops.res2_pallas import fused_res2_chain
    width = c // scale
    nums = scale - 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    kernels = jnp.asarray((rng.normal(size=(nums, 3, width, width)) * 0.1
                           ).astype(np.float32))
    biases = jnp.asarray(rng.normal(size=(nums, width)).astype(np.float32))
    s = jnp.asarray(1 + 0.1 * rng.normal(size=(nums, width)).astype(np.float32))
    h = jnp.asarray(0.1 * rng.normal(size=(nums, width)).astype(np.float32))

    def xla_chain(x, kernels, biases, s, h):
        sp = x[..., 0:width]
        outs = []
        for i in range(nums):
            if i >= 1:
                sp = sp + x[..., i * width:(i + 1) * width]
            taps = [jnp.pad(sp, ((0, 0), (dilation, 0), (0, 0)))[:, :t],
                    sp,
                    jnp.pad(sp, ((0, 0), (0, dilation), (0, 0)))[:, dilation:]]
            acc = sum(tp @ kernels[i, j] for j, tp in enumerate(taps))
            acc = acc + biases[i]
            sp = jnp.maximum(acc, 0.0) * s[i] + h[i]
            sp = sp.astype(x.dtype)
            outs.append(sp)
        outs.append(x[..., nums * width:])
        return jnp.concatenate(outs, axis=-1)

    xla_f = jax.jit(xla_chain)
    for dt, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        xd = x.astype(dt)
        kd = kernels.astype(dt)
        ms_xla = timeit(xla_f, xd, kd, biases, s, h)
        ms_pl = timeit(lambda a: fused_res2_chain(a, kd, biases, s, h,
                                                  dilation), xd)
        print(f"standalone {name}: XLA {ms_xla:.3f} ms  pallas {ms_pl:.3f} ms"
              f"  ({ms_xla/ms_pl:.2f}x)")


def e2e(b=512):
    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.train import make_eval_embed_fn
    chunk = (200 - 1) * 160 + 400
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (b, chunk)).astype(np.float32))
    for fused in (False, True):
        model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                           global_context_att=True, fused_res2=fused)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                               train=False)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables)
        embed_fn = make_eval_embed_fn(model, FbankConfig(),
                                      compute_dtype=jnp.bfloat16)
        fn = jax.jit(lambda w: embed_fn(variables, {"wav": w}))
        ms = timeit(fn, wav)
        asps = b * 2.0 / (ms / 1e3)
        print(f"e2e ECAPA-GLOB-c512 b={b} fused={fused}: {ms:.2f} ms "
              f"= {asps:,.0f} audio-s/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    if "standalone" in sys.argv or len(sys.argv) == 1:
        standalone()
    if "e2e" in sys.argv or len(sys.argv) == 1:
        e2e()
