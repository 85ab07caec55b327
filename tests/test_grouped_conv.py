"""ops/grouped_conv.py: numerics vs the native lax op, and the GSPMD
regression it exists for — XLA mis-scales the grouped-conv kernel gradient
by the batch's replication factor when a mesh has an axis the batch is not
sharded over (the tensor-parallel layout). See the module docstring."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from wespeaker_tpu.models.layers import GroupedConv, conv1d, conv2d
from wespeaker_tpu.ops.grouped_conv import grouped_conv
from wespeaker_tpu.parallel.mesh import make_mesh


def _native(x, k, strides, padding, dilation, groups):
    dn = ("NWC", "WIO", "NWC") if x.ndim == 3 else ("NHWC", "HWIO", "NHWC")
    return lax.conv_general_dilated(
        x, k, window_strides=strides, padding=padding, rhs_dilation=dilation,
        dimension_numbers=dn, feature_group_count=groups)


CASES = [
    # (spatial_rank, B, in, out, groups, ksize, stride, pad, dilation)
    (1, 3, 8, 8, 4, (5,), (1,), ((2, 2),), (1,)),
    (1, 3, 8, 16, 8, (4,), (1,), ((2, 2),), (1,)),        # even kernel
    (1, 3, 8, 8, 8, (3,), (1,), ((2, 0),), (1,)),         # depthwise causal
    (1, 3, 8, 8, 4, (3,), (2,), ((1, 1),), (1,)),         # strided
    (1, 3, 8, 8, 4, (3,), (1,), ((2, 2),), (2,)),         # dilated
    (2, 2, 8, 8, 4, (3, 3), (1, 1), ((1, 1), (1, 1)), (1, 1)),
    (2, 2, 8, 16, 8, (3, 3), (2, 2), ((1, 1), (1, 1)), (1, 1)),
    (2, 2, 8, 8, 8, (3, 3), (1, 1), ((2, 2), (2, 2)), (2, 2)),
]


@pytest.mark.parametrize("case", CASES)
def test_matches_native_forward_and_grads(case):
    rank, b, cin, cout, groups, ks, st, pad, dil = case
    rng = np.random.default_rng(0)
    sp = (11,) * rank
    x = jnp.asarray(rng.normal(size=(b,) + sp + (cin,)).astype(np.float32))
    k = jnp.asarray(rng.normal(
        size=ks + (cin // groups, cout)).astype(np.float32))

    out = grouped_conv(x, k, st, pad, dil, groups)
    ref = _native(x, k, st, pad, dil, groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def loss_ours(k_, x_):
        return jnp.sum(jnp.sin(grouped_conv(x_, k_, st, pad, dil, groups)))

    def loss_native(k_, x_):
        return jnp.sum(jnp.sin(_native(x_, k_, st, pad, dil, groups)))

    gk, gx = jax.grad(loss_ours, argnums=(0, 1))(k, x)
    gk_ref, gx_ref = jax.grad(loss_native, argnums=(0, 1))(k, x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)


def test_kernel_grad_correct_under_partial_batch_replication():
    """The regression: on a ('data','model') mesh with the batch sharded
    only over 'data', the native op's kernel grad comes back scaled by the
    model-axis size; grouped_conv must match the single-device gradient."""
    rng = np.random.default_rng(1)
    B, T, C, G = 8, 32, 64, 16
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(5, C // G, C)).astype(np.float32) * 0.1)
    st, pad, dil = (1,), ((2, 2),), (1,)

    def loss(k_, x_):
        return jnp.sum(grouped_conv(x_, k_, st, pad, dil, G) ** 2)

    gk_ref = jax.grad(loss)(k, x)

    mesh = make_mesh(model=4)  # (2 data, 4 model)
    k_rep = jax.device_put(k, NamedSharding(mesh, P()))
    x_dp = jax.device_put(x, NamedSharding(mesh, P("data")))
    gk = jax.jit(jax.grad(loss))(k_rep, x_dp)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               atol=1e-4, rtol=1e-4)

    # document the native-op failure this guards against (if XLA fixes it,
    # this sub-check becomes vacuous and the workaround can be retired)
    def loss_native(k_, x_):
        return jnp.sum(_native(x_, k_, st, pad, dil, G) ** 2)

    gk_nat = jax.jit(jax.grad(loss_native))(k_rep, x_dp)
    ratio = float(jnp.linalg.norm(gk_nat) / jnp.linalg.norm(gk_ref))
    if abs(ratio - 1.0) < 1e-3:
        pytest.skip("native grouped-conv gradient is fixed in this XLA; "
                    "workaround retained for older toolchains")


def test_module_matches_nn_conv_init_and_forward():
    """GroupedConv is a drop-in for nn.Conv: identical param shapes, init
    distribution (same rng path), and outputs."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
    ours = GroupedConv(features=8, kernel_size=(3,), strides=(1,),
                       padding=((1, 1),), kernel_dilation=(1,),
                       feature_group_count=4)
    theirs = nn.Conv(features=8, kernel_size=(3,), strides=(1,),
                     padding=[(1, 1)], kernel_dilation=(1,),
                     feature_group_count=4)
    v1 = ours.init(jax.random.PRNGKey(0), x)
    v2 = theirs.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), v1, v2)
    np.testing.assert_allclose(np.asarray(ours.apply(v1, x)),
                               np.asarray(theirs.apply(v2, x)),
                               atol=1e-6, rtol=1e-6)


def test_helper_routing():
    """conv1d/conv2d route groups>1 through GroupedConv, groups==1 through
    nn.Conv."""
    assert isinstance(conv1d(8, 3, groups=4), GroupedConv)
    assert isinstance(conv1d(8, 3), nn.Conv)
    assert isinstance(conv2d(8, 3, groups=8), GroupedConv)
    assert isinstance(conv2d(8, 3), nn.Conv)


def test_train_step_wavlm_grad_scale_on_tp_mesh():
    """End-to-end regression at the spot the bug was found: the WavLM
    positional conv's gradient in a full composite train step must have the
    same magnitude whether the mesh has a model axis or not."""
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

    def pos_conv_update(new_state):
        path = ("model", "frontend", "upstream", "pos_conv_embed_conv",
                "kernel")
        new = new_state.params
        old = state.params
        for p in path:
            new, old = new[p], old[p]
        return np.linalg.norm(np.asarray(old) - np.asarray(new))

    ref_state, _ = jax.jit(step_fn)(state, batch)
    ref_upd = pos_conv_update(ref_state)

    mesh = make_mesh(model=4)
    rep = NamedSharding(mesh, P())
    sh_state = jax.device_put(state, rep)
    sh_batch = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), batch)
    tp_state, _ = jax.jit(step_fn)(sh_state, sh_batch)
    tp_upd = pos_conv_update(tp_state)
    # before the fix this ratio was ~4.0 (the model-axis size)
    assert abs(tp_upd / ref_upd - 1.0) < 0.05, (tp_upd, ref_upd)


def test_kernel_grad_mode_native_matches_safe():
    """'native' mode (used by bin/train.py under pure DP — the safe
    einsum-per-tap path materializes per-tap input slices and measured
    ~9x the structural backward cost for depthwise stages, docs/PERF.md
    round 4) must produce the same gradients on a single device."""
    from wespeaker_tpu.ops import grouped_conv as gc

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 9, 7, 24)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 24)).astype(np.float32))
    st, pad, dil = (1, 1), ((1, 1), (1, 1)), (1, 1)

    def loss(k_, x_):
        return jnp.sum(jnp.sin(grouped_conv(x_, k_, st, pad, dil, 24)))

    assert gc.kernel_grad_mode() == "safe"
    gk_safe, gx_safe = jax.grad(loss, argnums=(0, 1))(k, x)
    try:
        gc.set_kernel_grad_mode("native")
        gk_nat, gx_nat = jax.grad(loss, argnums=(0, 1))(k, x)
    finally:
        gc.set_kernel_grad_mode("safe")
    np.testing.assert_allclose(np.asarray(gk_nat), np.asarray(gk_safe),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_nat), np.asarray(gx_safe),
                               atol=1e-4, rtol=1e-4)
    with pytest.raises(AssertionError):
        gc.set_kernel_grad_mode("fast")
