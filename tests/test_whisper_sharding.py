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


def any_leaf_sharded(tree):
    """True if any leaf's per-device shard is smaller than the full array."""
    return jax.tree_util.tree_reduce(
        lambda acc, leaf: acc or (hasattr(leaf, "addressable_shards")
                                  and leaf.addressable_shards[0].data.shape
                                  != leaf.shape), tree, False)


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

    assert any_leaf_sharded(placed), "no kernel actually sharded"

    out = enc.apply(unboxed, x)
    want = np.asarray(out[-1] if isinstance(out, (tuple, list)) else out)
    got = jax.jit(enc.apply)(placed, jax.device_put(
        x, NamedSharding(mesh, P("data"))))
    got = np.asarray(got[-1] if isinstance(got, (tuple, list)) else got)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_train_step_with_model_sharded_wavlm_frontend():
    """Full supervised train step (fwd + bwd + optax update) with the WavLM
    frontend's attention/MLP kernels sharded over the 'model' axis and the
    batch over 'data' — the BASELINE config-4 scenario (SSL frontend bigger
    than one chip's HBM) exercised through *training*, not just inference.
    The sharded step must reproduce the fully-replicated step's numerics."""
    import optax

    from wespeaker_tpu.models.projections import ArcMarginProduct
    from wespeaker_tpu.train import init_train_state, make_train_step
    from wespeaker_tpu.train.composite import build_model
    from wespeaker_tpu.utils.schedulers import (ExponentialDecrease,
                                                MarginScheduler)

    configs = {
        "model": "ECAPA_TDNN",
        "model_args": {"embed_dim": 16, "channels": 16, "feat_dim": 0},
        "dataset_args": {
            "frontend": "wavlm",
            "wavlm_args": {"hidden_size": 64, "num_hidden_layers": 2,
                           "num_attention_heads": 4,
                           "intermediate_size": 128,
                           "conv_dim": (16, 16), "conv_kernel": (3, 3),
                           "conv_stride": (2, 2)},
        },
    }
    built = build_model(configs)
    projection = ArcMarginProduct(16, 8)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1)
    step_fn = make_train_step(
        built.model, projection, tx,
        ExponentialDecrease(1, 4, 0.1, 0.01, warm_up_epoch=0),
        MarginScheduler(4, 0, 1, 0.1, 0.1),
        featurize_fn=built.featurize_train)
    state = init_train_state(built.model, projection, tx,
                             jax.random.PRNGKey(0), embed_dim=16,
                             example=built.init_example)
    rng = np.random.default_rng(7)
    batch = {"wav": jnp.asarray(rng.uniform(-0.5, 0.5, (4, 4000))
                                .astype(np.float32)),
             "label": jnp.asarray(rng.integers(0, 8, 4).astype(np.int32))}

    ref_state, ref_metrics = jax.jit(step_fn)(state, batch)
    ref_loss = float(ref_metrics["loss"])
    ref_norm = float(optax.global_norm(ref_state.params))

    mesh = make_mesh(model=4)  # (2 data, 4 model)
    # abstract init: we only need the boxed partition metadata, not weights
    boxed = jax.eval_shape(
        lambda: built.model.init(jax.random.PRNGKey(0), built.init_example,
                                 train=False))
    logical_rules = (("embed", None), ("heads", "model"), ("mlp", "model"))
    with mesh:
        mshard = nn.logical_to_mesh_sharding(
            nn.get_partition_spec(boxed), mesh, logical_rules)["params"]
    rep = NamedSharding(mesh, P())
    params = dict(state.params)
    params["model"] = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), state.params["model"],
        mshard)
    params["projection"] = jax.device_put(state.params["projection"], rep)
    sh_state = state.replace(
        params=params,
        batch_stats=jax.device_put(state.batch_stats, rep),
        proj_stats=jax.device_put(state.proj_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep))
    sh_batch = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), batch)

    new_state, metrics = jax.jit(step_fn)(sh_state, sh_batch)

    # a frontend kernel is genuinely sharded, and stays so through the update
    assert any_leaf_sharded(new_state.params["model"])

    # sharded collectives change reduction order — agreement is to f32
    # rounding, not bitwise (same bound as the DP-equivalence harness)
    assert np.isclose(float(metrics["loss"]), ref_loss,
                      rtol=1e-3), (float(metrics["loss"]), ref_loss)
    assert np.isclose(float(optax.global_norm(new_state.params)), ref_norm,
                      rtol=1e-3)
    # per-leaf agreement of updated params: a missing collective on any one
    # kernel would be masked by a tree-global norm but not by this. The
    # bound is relative to each leaf's own update magnitude: sharded
    # reduction-order noise measures ~0.1% of the update here (gradients at
    # random init are huge, so absolute tolerances are meaningless), while
    # a dropped/duplicated psum scales a whole leaf's gradient by the axis
    # size — 50-100% of the update. This check caught a real XLA bug:
    # grouped-conv kernel grads inflated by the model-axis size (see
    # ops/grouped_conv.py).
    def leaf_check(path, new_s, new_r, old):
        upd = np.abs(np.asarray(new_r) - np.asarray(old)).max()
        err = np.abs(np.asarray(new_s) - np.asarray(new_r)).max()
        assert err <= max(1e-4, 0.02 * upd), (
            jax.tree_util.keystr(path), err, upd)

    jax.tree_util.tree_map_with_path(leaf_check, new_state.params,
                                     ref_state.params, state.params)
