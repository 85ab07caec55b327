"""Tensor-sharding the whisper SSL frontend over the 'model' mesh axis
(BASELINE config 4: SSL frontends sharded across chips when they exceed one
chip's HBM). Validates that the logically-annotated attention/MLP kernels
shard and that sharded execution matches single-device numerics."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from wespeaker_tpu.frontend.whisper_encoder import AudioEncoder
from wespeaker_tpu.parallel.mesh import make_mesh


def test_whisper_encoder_model_axis_sharding():
    mesh = make_mesh(model=4)  # (2 data, 4 model)
    enc = AudioEncoder(n_mels=16, n_ctx=64, n_state=64, n_head=4, n_layer=2,
                       layer_st=0, layer_ed=1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 128, 16)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)

    # map logical axes -> mesh axes: shard the heads/mlp dims over 'model'
    logical_rules = (("embed", None), ("heads", "model"), ("mlp", "model"))
    with mesh:
        sharded_vars = nn.logical_to_mesh_sharding(
            nn.get_partition_spec(variables), mesh, logical_rules)
    unboxed = nn.meta.unbox(variables)
    placed = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), unboxed, sharded_vars)

    # verify at least one kernel is actually sharded over the model axis:
    # each device shard holds n_state / 4 output columns
    qk = placed["params"]["blocks_0"]["attn"]["query"]["kernel"]
    assert qk.addressable_shards[0].data.shape == (64, 64 // 4)

    want = np.asarray(enc.apply(unboxed, x))
    got = np.asarray(jax.jit(enc.apply)(placed, jax.device_put(
        x, NamedSharding(mesh, P("data")))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_wavlm_frontend_model_axis_sharding():
    """WavLM attention/MLP kernels shard over 'model'; sharded forward
    matches single-device numerics."""
    import dataclasses

    from wespeaker_tpu.frontend.wavlm import WavLMConfig, WavLMFrontend

    mesh = make_mesh(model=4)
    cfg = dataclasses.replace(
        WavLMConfig.base(), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        conv_dim=(16, 16), conv_kernel=(3, 3), conv_stride=(2, 2))
    fe = WavLMFrontend(cfg)
    wav = jnp.asarray(np.random.default_rng(1).uniform(
        -0.5, 0.5, (2, 2000)).astype(np.float32))
    variables = fe.init(jax.random.PRNGKey(0), wav)

    logical_rules = (("embed", None), ("heads", "model"), ("mlp", "model"))
    with mesh:
        shardings = nn.logical_to_mesh_sharding(
            nn.get_partition_spec(variables), mesh, logical_rules)
    unboxed = nn.meta.unbox(variables)
    placed = jax.tree_util.tree_map(jax.device_put, unboxed, shardings)

    qk = placed["params"]["layers_0"]["attention"]["q_proj"]["kernel"]
    assert qk.addressable_shards[0].data.shape == (64, 64 // 4)

    want = np.asarray(fe.apply(unboxed, wav)[-1])
    got = np.asarray(jax.jit(fe.apply)(
        placed, jax.device_put(wav, NamedSharding(mesh, P("data"))))[-1])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_w2vbert_encoder_model_axis_sharding():
    """w2v-bert conformer attention/MLP kernels shard over 'model'."""
    import dataclasses

    from wespeaker_tpu.frontend.w2vbert import (W2VBertConfig,
                                                W2VBertFrontend)

    mesh = make_mesh(model=4)
    cfg = dataclasses.replace(
        W2VBertConfig(), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        feature_projection_input_dim=32)
    enc = W2VBertFrontend(cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 20, 32)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)

    logical_rules = (("embed", None), ("heads", "model"), ("mlp", "model"))
    with mesh:
        shardings = nn.logical_to_mesh_sharding(
            nn.get_partition_spec(variables), mesh, logical_rules)
    unboxed = nn.meta.unbox(variables)
    placed = jax.tree_util.tree_map(jax.device_put, unboxed, shardings)

    found = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc or (hasattr(leaf, "addressable_shards")
                                  and leaf.addressable_shards[0].data.shape
                                  != leaf.shape), placed, False)
    assert found, "no kernel actually sharded"

    out = enc.apply(unboxed, x)
    want = np.asarray(out[-1] if isinstance(out, (tuple, list)) else out)
    got = jax.jit(enc.apply)(placed, jax.device_put(
        x, NamedSharding(mesh, P("data"))))
    got = np.asarray(got[-1] if isinstance(got, (tuple, list)) else got)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
