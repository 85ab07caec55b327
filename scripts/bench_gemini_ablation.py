"""Gemini-DF-ResNet60 knock-out ablation: where do the 60 ms (B=512) go?

VERDICT r3 item 2 companion to bench_eres2net_ablation. Gemini60
structure (wespeaker/models/gemini_dfresnet.py:30-118): stem + 4 strided
downsample 3x3 convs, then (3,3,9,3) inverted bottlenecks per stage —
1x1 expand to 4*dim, DEPTHWISE 3x3 (feature_group_count=4*dim), 1x1
project back. On TPU the depthwise conv is VPU work (one MAC per output
element reaches the MXU's 128-lane tiles at 1/128 density), so the
hypothesis is that the depthwise stages bound occupancy, not a schedule
bug.

Variants:
  full       complete model
  nodw       depthwise 3x3 -> identity (keeps both 1x1 matmuls)
  no1x1      inverted bottleneck 1x1s -> identity at dim (keeps a
             dim-width depthwise)
  nostages   stages -> identity (stem + downsamples + pool only)
  nopool     TSTP -> TAP
  nofbank    feed precomputed feats
  microdw    depthwise 3x3 vs dense 3x3 at stage-3 shapes: measures the
             VPU-vs-MXU gap directly

Usage: python scripts/bench_gemini_ablation.py [batch] [variant]
Run ONE variant per invocation (tunnel compiles are slow).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import wespeaker_tpu.models.gemini_dfresnet as G
from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.train import make_eval_embed_fn
from wespeaker_tpu.utils.bench_timing import time_fn_on_device

CHUNK_SAMPLES = int((200 - 1) * 160 + 400)


class NoDWBottleneck(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(G._bn(train, "bn1")(
            conv2d(4 * self.dim, 1, bias=False, name="conv1")(x)))
        out = G._bn(train, "bn3")(
            conv2d(self.dim, 1, bias=False, name="conv3")(out))
        return nn.relu(out + x)


class No1x1Bottleneck(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(G._bn(train, "bn2")(
            conv2d(self.dim, 3, padding=1, groups=self.dim,
                   bias=False, name="conv2")(x)))
        return nn.relu(out + x)


class NoStagesBottleneck(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


def _shift_add_dw3x3(x, w):
    """Depthwise 3x3 as 9 shifted broadcast-multiply-adds: pure VPU
    elementwise work XLA fuses into one pass — the candidate replacement
    for the grouped-conv lowering. x: (B, F, T, C), w: (3, 3, C)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    f, t = x.shape[1], x.shape[2]
    out = jnp.zeros_like(x)
    for i in range(3):
        for j in range(3):
            out = out + xp[:, i:i + f, j:j + t, :] * w[i, j]
    return out


def microdw(batch):
    """Stage-3 shaped (B, 10, 100, 256) 3x3: depthwise (grouped-conv
    lowering) vs shift-add formulation vs dense — measures both the MXU
    density gap and whether bypassing the grouped-conv path pays."""
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 10, 100, 256)).astype(np.float32)).astype(jnp.bfloat16)
    results = {}
    for kind, groups in (("depthwise", 256), ("dense", 1)):
        m = conv2d(256, 3, padding=1, groups=groups, bias=False)
        v = m.init(jax.random.PRNGKey(0), x)
        v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
        fn = jax.jit(lambda d, _v=v, _m=m: _m.apply(_v, d["x"]))
        dt = time_fn_on_device(fn, {"x": x}, iters=20)
        results[f"conv3x3_{kind}_ms"] = round(dt * 1e3, 3)
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 3, 256)).astype(np.float32)).astype(jnp.bfloat16)
    fn = jax.jit(lambda d: _shift_add_dw3x3(d["x"], w))
    dt = time_fn_on_device(fn, {"x": x}, iters=20)
    results["conv3x3_shiftadd_ms"] = round(dt * 1e3, 3)
    r = results["conv3x3_dense_ms"] / max(
        results["conv3x3_depthwise_ms"], 1e-9)
    results["dense_over_depthwise"] = round(r, 2)
    # dense does 256x the MACs; if the ratio is << 256 the depthwise conv
    # is paying far above its FLOP share (VPU/memory-bound)
    print(json.dumps({"variant": "microdw", "batch": batch, **results}))


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    variant = sys.argv[2] if len(sys.argv) > 2 else "full"
    iters = 20

    if variant == "microdw":
        microdw(batch)
        return

    kw = dict(feat_dim=80, embed_dim=192)
    if variant == "fused":
        kw["fused_stages"] = True
    elif variant == "nodw":
        G.InvertedBottleneck = NoDWBottleneck
    elif variant == "no1x1":
        G.InvertedBottleneck = No1x1Bottleneck
    elif variant == "nostages":
        G.InvertedBottleneck = NoStagesBottleneck
    elif variant == "nopool":
        kw["pooling_func"] = "TAP"

    model = G.Gemini_DF_ResNet60(**kw)
    from_wav = variant != "nofbank"
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    embed_fn = make_eval_embed_fn(model, FbankConfig(),
                                  compute_dtype=jnp.bfloat16,
                                  from_wav=from_wav)
    fn = jax.jit(lambda b: embed_fn(variables, b))

    rng = np.random.default_rng(0)
    if from_wav:
        data = {"wav": jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32))}
    else:
        data = {"feat": jnp.asarray(rng.normal(
            size=(batch, 200, 80)).astype(np.float32))}

    extra = {}
    if variant == "fused":
        # on-chip numerics gate: interpret-mode tests can't see real-MXU
        # or the pltpu.roll tap path, so pin fused-vs-standard cosine here
        std = G.Gemini_DF_ResNet60(feat_dim=80, embed_dim=192)
        small = jax.tree_util.tree_map(lambda a: a[:8], data)
        want = np.asarray(jax.jit(lambda b: make_eval_embed_fn(
            std, FbankConfig(), compute_dtype=jnp.bfloat16,
            from_wav=from_wav)(variables, b))(small)).astype(np.float32)
        got = np.asarray(fn(small)).astype(np.float32)
        cos = np.sum(want * got, -1) / np.maximum(
            np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1),
            1e-9)
        extra["min_cosine_vs_standard"] = round(float(cos.min()), 5)

    dt = time_fn_on_device(fn, data, iters=iters)
    print(json.dumps({"variant": variant, "batch": batch,
                      "ms": round(dt * 1e3, 2),
                      "audio_s_per_s": round(batch * 2.0 / dt, 1),
                      **extra}))


if __name__ == "__main__":
    main()
