"""ERes2Net34-Base knock-out ablation: where do the 77.7 ms (B=512) go?

Same methodology as bench_ecapa_ablation / bench_redimnet_ablation:
replace one component with an identity/cheap stand-in, re-time the full
wav->embedding path on the ambient (TPU tunnel) backend, read the delta as
a lower bound on that component's cost (XLA re-fuses around the hole, so
deltas understate). VERDICT r3 item 2: the zoo table's 23%-of-peak entry
was asserted "structural", never measured.

ERes2Net34-Base structure (wespeaker/models/eres2net.py:106-240,243-360):
stem 3x3 -> 4 stages of Res2 blocks (scale=2, width 16/32/64/128 per
split, two SEQUENTIAL 3x3 convs per block), stages 3-4 use AFF gates
inside blocks, plus 3 inter-stage AFF fusions over downsample convs.

Variants:
  full       complete model
  noaff      every AFF gate -> plain add (keeps shapes, kills gate convs)
  no3x3      split 3x3 convs -> identity (keeps 1x1s + AFF + shortcut)
  wide3x3    split chain -> ONE full-width 3x3 (parallel counterfactual:
             same receptive work, no hierarchical serialization)
  nopool     TSTP -> mean
  nofbank    feed precomputed feats (isolates device fbank)
  microconv  stage-1-shaped conv2d with C_out 16 vs 128: if the wide conv
             is not ~8x slower, the MXU output-lane padding bound is
             MEASURED, not asserted

Usage: python scripts/bench_eres2net_ablation.py [batch] [variant]
Run ONE variant per invocation (tunnel compiles are slow).
"""

import json
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import wespeaker_tpu.models.eres2net as E
from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.train import make_eval_embed_fn
from wespeaker_tpu.utils.bench_timing import time_fn_on_device

CHUNK_SAMPLES = int((200 - 1) * 160 + 400)


class AddAFF(E.AFF):
    @nn.compact
    def __call__(self, x, ds_y, train: bool = False):
        return x + ds_y


def _patch(monkey):
    """Context-free monkeypatching: the script process is single-use."""
    for name, val in monkey.items():
        setattr(E, name, val)


class Wide3x3Block(nn.Module):
    """Counterfactual Res2 block: one full-width 3x3 instead of the
    hierarchical split chain (same in/out shapes, no serialization)."""
    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out = conv2d(width * self.scale, 1, stride=self.stride, bias=False,
                     name="conv1")(x)
        out = E.relu20(E._bn(train, "bn1")(out))
        out = conv2d(width * self.scale, 3, padding=1, bias=False,
                     name="wide")(out)
        out = E.relu20(E._bn(train, "bnw")(out))
        out = E._bn(train, "bn3")(
            conv2d(self.planes * self.expansion, 1, bias=False,
                   name="conv3")(out))
        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            sc = conv2d(self.planes * self.expansion, 1, stride=self.stride,
                        bias=False, name="shortcut_conv")(x)
            sc = E._bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return E.relu20(out + sc)


class No3x3Block(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out = conv2d(width * self.scale, 1, stride=self.stride, bias=False,
                     name="conv1")(x)
        out = E.relu20(E._bn(train, "bn1")(out))
        out = E._bn(train, "bn3")(
            conv2d(self.planes * self.expansion, 1, bias=False,
                   name="conv3")(out))
        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            sc = conv2d(self.planes * self.expansion, 1, stride=self.stride,
                        bias=False, name="shortcut_conv")(x)
            sc = E._bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return E.relu20(out + sc)


def microconv(batch):
    """Stage-1-shaped 3x3 conv, C_out 16 vs 128: measures the MXU
    output-lane padding penalty directly."""
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 80, 200, 16)).astype(np.float32)).astype(jnp.bfloat16)
    results = {}
    for cout in (16, 128):
        m = conv2d(cout, 3, padding=1, bias=False)
        v = m.init(jax.random.PRNGKey(0), x)
        v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
        fn = jax.jit(lambda d, _v=v, _m=m: _m.apply(_v, d["x"]))
        dt = time_fn_on_device(fn, {"x": x}, iters=20)
        results[f"conv3x3_cout{cout}_ms"] = round(dt * 1e3, 3)
    r = results["conv3x3_cout128_ms"] / max(
        results["conv3x3_cout16_ms"], 1e-9)
    results["cout128_over_cout16"] = round(r, 2)
    print(json.dumps({"variant": "microconv", "batch": batch, **results}))


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    variant = sys.argv[2] if len(sys.argv) > 2 else "full"
    iters = 20

    if variant == "microconv":
        microconv(batch)
        return

    kw = dict(feat_dim=80, embed_dim=192)
    if variant == "noaff":
        _patch({"AFF": AddAFF})
    elif variant == "no3x3":
        _patch({"BasicBlockERes2Net": No3x3Block,
                "BasicBlockERes2NetDiffAFF": No3x3Block})
    elif variant == "wide3x3":
        _patch({"BasicBlockERes2Net": Wide3x3Block,
                "BasicBlockERes2NetDiffAFF": Wide3x3Block})
    elif variant == "nopool":
        kw["pooling_func"] = "TAP"

    model = E.ERes2Net34_Base(**kw)
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

    dt = time_fn_on_device(fn, data, iters=iters)
    print(json.dumps({"variant": variant, "batch": batch,
                      "ms": round(dt * 1e3, 2),
                      "audio_s_per_s": round(batch * 2.0 / dt, 1)}))


if __name__ == "__main__":
    main()
