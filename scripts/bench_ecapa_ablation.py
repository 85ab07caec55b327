"""ECAPA-c512 extraction wall-time breakdown via component ablation.

Times the flagship bf16 extraction forward with individual components
knocked out (numerics change — this is a *timing* ladder, not a model),
isolating where the 13.5 ms (B=512) goes: fbank, Res2 chains, SE blocks,
ASTP tail, MFA conv. Drives the VERDICT round-2 MXU-occupancy
investigation; results recorded in docs/PERF.md.

Usage: python scripts/bench_ecapa_ablation.py [batch] [variant]
  variant in: full nofbank nochain nose notail noastp nomfa matonly
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

from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.ecapa_tdnn import (Conv1dReluBn, Res2Conv1dReluBn,
                                             SE_Connect)
from wespeaker_tpu.models.layers import conv1d
from wespeaker_tpu.models.pooling_layers import get_pooling
from wespeaker_tpu.train import make_eval_embed_fn

CHUNK_SAMPLES = int((200 - 1) * 160 + 400)


class AblatedECAPA(nn.Module):
    """ECAPA_TDNN_GLOB_c512 with switchable components (timing only)."""
    channels: int = 512
    feat_dim: int = 80
    embed_dim: int = 192
    use_chain: bool = True
    use_se: bool = True
    use_astp: bool = True
    use_mfa: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        out1 = Conv1dReluBn(self.channels, 5, padding=2,
                            name="layer1")(x, train)

        def block(h, dil, name):
            out = Conv1dReluBn(self.channels, 1, name=f"{name}_0")(h, train)
            if self.use_chain:
                out = Res2Conv1dReluBn(self.channels, 3, 1, dil, dil, 8,
                                       name=f"{name}_1")(out, train)
            out = Conv1dReluBn(self.channels, 1, name=f"{name}_2")(out,
                                                                   train)
            if self.use_se:
                out = SE_Connect(self.channels, name=f"{name}_3")(out, mask)
            return h + out

        out2 = block(out1, 2, "layer2")
        out3 = block(out2, 3, "layer3")
        out4 = block(out3, 4, "layer4")
        out = jnp.concatenate([out2, out3, out4], axis=-1)
        if self.use_mfa:
            out = conv1d(512 * 3, 1, name="conv")(out)
        out = nn.relu(out)
        if self.use_astp:
            pooled = get_pooling("ASTP", 512 * 3, global_context_att=True,
                                 name="pool")(out, mask, train)
        else:
            pooled = jnp.mean(out, axis=1)
            pooled = jnp.concatenate([pooled, pooled], axis=-1)
        pooled = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name="bn")(pooled)
        return nn.Dense(self.embed_dim, name="linear")(pooled)


class MatmulOnly(nn.Module):
    """The pure-MXU skeleton: just the big pointwise convs at ECAPA shapes
    — an upper bound on what perfectly-fused execution could reach."""
    channels: int = 512
    feat_dim: int = 80
    embed_dim: int = 192

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        h = conv1d(self.channels, 5, padding=2, name="l1")(x)
        for i in range(6):  # 2 pointwise convs per block x 3 blocks
            h = conv1d(self.channels, 1, name=f"pw{i}")(h)
        h3 = jnp.concatenate([h, h, h], axis=-1)
        h3 = conv1d(512 * 3, 1, name="mfa")(h3)
        return nn.Dense(self.embed_dim, name="out")(jnp.mean(h3, axis=1))


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    variant = sys.argv[2] if len(sys.argv) > 2 else "full"
    iters = 20

    kw = dict(use_chain=True, use_se=True, use_astp=True, use_mfa=True)
    if variant == "nochain":
        kw["use_chain"] = False
    elif variant == "nose":
        kw["use_se"] = False
    elif variant == "noastp":
        kw["use_astp"] = False
    elif variant == "nomfa":
        kw["use_mfa"] = False

    model = MatmulOnly() if variant == "matonly" else AblatedECAPA(**kw)
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

    # On-device loop timing: the tunnel's per-dispatch floor (~40 ms some
    # sessions) swamps a Python enqueue loop — see utils/bench_timing.py.
    from wespeaker_tpu.utils.bench_timing import time_fn_on_device
    dt = time_fn_on_device(fn, data, iters=iters)
    print(json.dumps({"variant": variant, "batch": batch,
                      "ms": round(dt * 1e3, 2),
                      "audio_s_per_s": round(batch * 2.0 / dt, 1)}))


if __name__ == "__main__":
    main()
