"""Tap-packed conv2d filter-gradient kernel (ops/conv_dw_pack.py).

The kernel reformulates the 3x3/stride-1 dW as ONE (3*cout, 3*cin)-output
matmul (h-shifts on dy, w-shifts on x — see the module docstring for the
index algebra); these tests pin its numerics against XLA's native
conv-backprop-filter, both standalone and through the model path
(models/layers.py::PackedDWConv under set_conv_dw_mode("packed")).
Pallas runs in interpret mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from wespeaker_tpu.ops.conv_dw_pack import (conv2d_packed_dw, conv_dw_mode,
                                            dw_pack, set_conv_dw_mode)

S1 = ((1, 1), (1, 1))


def _native_loss(x, w, dy):
    y = lax.conv_general_dilated(
        x, w, (1, 1), S1, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.vdot(y, dy)


@pytest.mark.parametrize("shape", [
    (4, 16, 20, 8, 8),     # even H/W
    (2, 9, 13, 8, 16),     # odd H/W, cin != cout
    (3, 8, 8, 16, 8),      # cout < cin
])
def test_dw_pack_matches_native_grad(shape):
    b, h, w_, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w_, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(b, h, w_, co)), jnp.float32)
    dw_native = jax.grad(_native_loss, 1)(x, w, dy)
    dw_k = dw_pack(x, dy, interpret=True)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_native),
                               rtol=2e-5, atol=2e-4)


def test_custom_vjp_fwd_and_both_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(2, 10, 12, 8)), jnp.float32)

    def packed_loss(x_, w_):
        return jnp.vdot(conv2d_packed_dw(x_, w_, (1, 1), S1, (1, 1)), dy)

    y_packed = conv2d_packed_dw(x, w, (1, 1), S1, (1, 1))
    y_native = lax.conv_general_dilated(
        x, w, (1, 1), S1, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_native),
                               rtol=1e-6)
    gx_p, gw_p = jax.grad(packed_loss, (0, 1))(x, w)
    gx_n = jax.grad(_native_loss, 0)(x, w, dy)
    gw_n = jax.grad(_native_loss, 1)(x, w, dy)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_n), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_n),
                               rtol=2e-5, atol=2e-4)


def test_resnet_packed_mode_grads_match_native():
    """ResNet34 layer-path gradients are identical (to f32 tolerance)
    with the packed dW mode on vs off: same params, same loss, compare
    every gradient leaf. Covers PackedDWConv wiring (param names/trees
    unchanged) and the mode's fall-back for ineligible convs."""
    from wespeaker_tpu.models import get_speaker_model

    assert conv_dw_mode() == "native"
    model = get_speaker_model("ResNet18")(feat_dim=40, embed_dim=32)
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(2, 24, 40)), jnp.float32)

    def grads():
        variables = model.init(jax.random.PRNGKey(0), feat[:1], train=True)
        params, stats = variables["params"], variables.get("batch_stats", {})

        def loss(p):
            out = model.apply({"params": p, "batch_stats": stats}, feat,
                              train=True, mutable=["batch_stats"])
            emb = out[0][0] if isinstance(out[0], tuple) else out[0]
            return jnp.sum(emb ** 2)

        return params, jax.grad(loss)(params)

    p_native, g_native = grads()
    set_conv_dw_mode("packed")
    try:
        p_packed, g_packed = grads()
    finally:
        set_conv_dw_mode("native")
    # identical param trees (checkpoint compatibility) ...
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, p_native, p_packed))
    # ... and matching gradients everywhere
    flat_n = jax.tree_util.tree_leaves_with_path(g_native)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_packed))
    assert len(flat_n) == len(flat_p)
    for path, leaf in flat_n:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf), rtol=5e-4, atol=1e-4,
            err_msg=str(path))
