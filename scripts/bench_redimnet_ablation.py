"""ReDimNetB2 knock-out ablation: where do the 124 ms go?

Same methodology as bench_ecapa_ablation / bench_train_ablation: replace
one component class with a residual-shaped identity, re-time the full
wav->embedding path end-to-end on the ambient (TPU tunnel) backend, and
read the delta as a lower bound on that component's cost (XLA re-fuses
around the hole, so deltas understate). ReDimNetB2 reference config:
6 stages, block_1d_type="conv+att" (4 ConvNeXt-1d k=7/19/31/59 + a
4-head transformer per time-context block), block_2d_type convnext_like,
per-stage group_divisor 12/12/12/8/8/4, 1D path divisor 8
(wespeaker/models/redimnet.py stages_setup).

Usage: python scripts/bench_redimnet_ablation.py [variant ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import wespeaker_tpu.models.redimnet as R

CHUNK = (200 - 1) * 160 + 400
BATCH = 512


def _identity_subclass(base):
    class _Id(base):
        @nn.compact
        def __call__(self, x, *a, **k):
            return x
    _Id.__name__ = f"Id{base.__name__}"
    return _Id


PATCHES = {
    "full": {},
    "no_transformer": {"TransformerEncoderLayer":
                       _identity_subclass(R.TransformerEncoderLayer)},
    "no_cnx1d": {"ConvNeXtLikeBlock1d":
                 _identity_subclass(R.ConvNeXtLikeBlock1d)},
    "no_cnx2d": {"ConvNeXtLikeBlock2d":
                 _identity_subclass(R.ConvNeXtLikeBlock2d)},
    "no_timeblock": {"TimeContextBlock1d":
                     _identity_subclass(R.TimeContextBlock1d)},
    "no_posenc": {"PosEncConv": _identity_subclass(R.PosEncConv)},
}


def bench_variant(name, iters=10):
    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.train import make_eval_embed_fn
    from wespeaker_tpu.utils.bench_timing import time_fn_on_device

    saved = {}
    for attr, repl in PATCHES[name].items():
        saved[attr] = getattr(R, attr)
        setattr(R, attr, repl)
    try:
        model = R.ReDimNetB2(feat_dim=72, embed_dim=192)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 72)), train=False)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables)
        embed_fn = make_eval_embed_fn(
            model, FbankConfig(num_mel_bins=72), compute_dtype=jnp.bfloat16)
        fn = jax.jit(lambda b: embed_fn(variables, b))
        data = {"wav": jnp.asarray(np.random.default_rng(0).uniform(
            -0.5, 0.5, (BATCH, CHUNK)).astype(np.float32))}
        dt = time_fn_on_device(fn, data, iters=2 * iters)
        print(f"{name:16s} {dt*1e3:8.2f} ms  {BATCH*2.0/dt:10,.0f} a-s/s",
              flush=True)
        return dt
    finally:
        for attr, orig in saved.items():
            setattr(R, attr, orig)


if __name__ == "__main__":
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    for n in sys.argv[1:] or list(PATCHES):
        bench_variant(n)
