"""Real-mode (on-chip) correctness check of the fused ECAPA kernels.

Interpret mode does not enforce Mosaic's block-shape rules or real-MXU
numerics, so this drives the fused_block / fused_tail paths against the
standard XLA path on the ambient device — masked and unmasked, bf16 —
and reports max abs error and embedding cosine. Run once after touching
ops/se_block_pallas.py or ops/mfa_astp_pallas.py.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    std = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                     global_context_att=True)
    fused = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                       global_context_att=True, fused_block=True,
                       fused_tail=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 200, 80)).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x[:1, :32])
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(1).normal(size=a.shape)
        .astype(np.float32) if a.ndim else a, variables)
    v16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    x16 = x.astype(jnp.bfloat16)
    m = np.ones((8, 200), np.float32)
    m[0, 150:] = 0.0
    m[3, 60:] = 0.0
    mask = jnp.asarray(m)

    out = {}
    for name, msk in (("unmasked", None), ("masked", mask)):
        want = np.asarray(jax.jit(
            lambda v, a: std.apply(v, a, mask=msk))(v16, x16),
            np.float32)
        got = np.asarray(jax.jit(
            lambda v, a: fused.apply(v, a, mask=msk))(v16, x16),
            np.float32)
        cos = float(np.mean(np.sum(want * got, -1) / np.maximum(
            np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1),
            1e-9)))
        out[name] = {"max_abs_err": float(np.max(np.abs(want - got))),
                     "ref_max_abs": float(np.max(np.abs(want))),
                     "cosine": round(cos, 6)}
    # the full bench fast path (bf16 weights/activations + bf16-conv fbank
    # + fused block) vs the strict-f32 exact path on the same weights
    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.train import make_eval_embed_fn
    wav = jnp.asarray(rng.uniform(
        -0.5, 0.5, (8, (200 - 1) * 160 + 400)).astype(np.float32))
    fast_fn = make_eval_embed_fn(fused, FbankConfig(),
                                 compute_dtype=jnp.bfloat16,
                                 fbank_conv_dtype=jnp.bfloat16)
    with jax.default_matmul_precision("float32"):
        exact = np.asarray(jax.jit(lambda v, b: make_eval_embed_fn(
            std, FbankConfig())(v, b))(variables, {"wav": wav}))
    fast = np.asarray(jax.jit(
        lambda v, b: fast_fn(v, b))(v16, {"wav": wav}))
    cos = float(np.mean(np.sum(exact * fast, -1) / np.maximum(
        np.linalg.norm(exact, axis=-1) * np.linalg.norm(fast, axis=-1),
        1e-9)))
    out["bench_fast_vs_f32_exact"] = {"cosine": round(cos, 6)}

    print(json.dumps(out))
    # fused-vs-standard on the same bf16 weights must hold the documented
    # cos >= 0.9999 (docs/PARITY.md); the bf16 fast path vs the strict-f32
    # exact path is a precision comparison and gets the looser bound.
    ok = (out["unmasked"]["cosine"] >= 0.9999
          and out["masked"]["cosine"] >= 0.9999
          and out["bench_fast_vs_f32_exact"]["cosine"] >= 0.999)
    print("FUSED-TPU-CHECK", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
