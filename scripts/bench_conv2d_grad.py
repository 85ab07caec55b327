"""dW / dX microbench for a stage-shaped 2D conv (train-step backward
study, round 5). The 2D-conv families (ResNet34/CAM++/ERes2Net/Gemini)
train at 4.5-6.6x their forward vs the ~3x structural fwd+bwd FLOP ratio;
this isolates WHERE the backward loses: for one conv shape it times

  fwd      y = conv(x, w)                     (NHWC, the model layout)
  dx       dX = grad_x <conv(x, w), dy>       (the transposed conv)
  dw       dW = grad_w <conv(x, w), dy>       (the filter gradient)
  dw_tap   explicit per-tap matmul dW: dW[kh,kw,i,o] =
           sum_b,h,w xpad[b, h*s+kh, w*s+kw, i] * dy[b,h,w,o]
           (einsum formulation — the counterfactual: same FLOPs, pure
           batched matmul, no conv-backward lowering)
  fwd_nchw / dx_nchw / dw_nchw   the same ops under NCHW dimension
           numbers (the torch layout) — quantifies what the channels-last
           choice is worth in the backward, not just the forward

Each timing is the on-device fori_loop slope (utils/bench_timing.py) —
tunnel-floor-proof. One shape per invocation; all modes for that shape.

Linearity note: <conv(x,w), dy> is linear in each arg, so grad_x does not
need the forward value and XLA dead-code-eliminates the fwd conv — each
grad timing is that gradient alone. Because each gradient is a function
of only TWO of the three tensors, the loop-timer's perturbation must hit
a tensor the output actually depends on, or XLA hoists the whole body
out of the fori_loop and the "slope" measures nothing: dX = f(w, dy)
(independent of x!), so dx cases perturb dy; dW = f(x, dy) perturbs x.
(The round-5 first run perturbed x everywhere and printed dx at 4000+
"TF/s" — loop-invariant code motion, not speed.)

redmm: the lane-occupancy counterfactual for dW at small channel counts —
the bare reduction matmul einsum("ki,ko->io") at K = B*Ho*Wo with the
same cin/cout, i.e. ONE tap's dW contraction with no conv semantics at
all. If dw_tfs ≈ redmm_tfs, XLA's conv-backprop-filter is already at the
hardware's skinny-output reduction bound and the deficit is structural
(output tile cin x cout covers cin/128 x cout/128 of the MXU).

Usage: python scripts/bench_conv2d_grad.py B H W Cin Cout k stride \
    [dtype] [only=case1,case2]
e.g. the ResNet34 layer1 body shape: 256 80 200 32 32 3 1
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wespeaker_tpu.ops.conv_dw_pack import dw_pack as _dw_pack
from wespeaker_tpu.utils.bench_timing import time_fn_on_device


def conv_nhwc(x, w, stride):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_nchw(x, w, stride):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def dw_tap(x, dy, k, stride):
    """Explicit matmul dW for padding=SAME, odd k: one einsum per tap over
    the zero-padded input (the ops/grouped_conv.py safe-path formulation,
    ungrouped)."""
    p = k // 2
    xpad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    ho, wo = dy.shape[1], dy.shape[2]
    taps = []
    for kh in range(k):
        for kw in range(k):
            sl = lax.slice(
                xpad, (0, kh, kw, 0),
                (x.shape[0], kh + (ho - 1) * stride + 1,
                 kw + (wo - 1) * stride + 1, x.shape[3]),
                (1, stride, stride, 1))
            taps.append(jnp.einsum("bhwi,bhwo->io", sl, dy,
                                   preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(k, k, x.shape[3], dy.shape[3])


def main():
    b, h, w_, cin, cout, k, stride = (int(a) for a in sys.argv[1:8])
    dtype = jnp.float32 if "f32" in sys.argv[8:] else jnp.bfloat16

    rng = np.random.default_rng(0)
    ho, wo = -(-h // stride), -(-w_ // stride)
    x = jnp.asarray(rng.normal(size=(b, h, w_, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, dtype)
    dy = jnp.asarray(rng.normal(size=(b, ho, wo, cout)), dtype)
    xc = jnp.transpose(x, (0, 3, 1, 2))
    wc = jnp.transpose(w, (3, 2, 0, 1))
    dyc = jnp.transpose(dy, (0, 3, 1, 2))

    flops = 2.0 * b * ho * wo * k * k * cin * cout  # same for fwd/dx/dw

    def loss_nhwc(x_, w_arr, dy_):
        return jnp.vdot(conv_nhwc(x_, w_arr, stride).astype(jnp.float32),
                        dy_.astype(jnp.float32))

    def loss_nchw(x_, w_arr, dy_):
        return jnp.vdot(conv_nchw(x_, w_arr, stride).astype(jnp.float32),
                        dy_.astype(jnp.float32))

    # one tap's contraction pairs each OUTPUT position with one input
    # position — stride the input grid so K matches for stride > 1
    xflat = x[:, ::stride, ::stride, :].reshape(-1, cin)
    dyflat = dy.reshape(-1, cout)

    # case -> (fn, data, perturb_key): the perturbed tensor MUST be one the
    # output depends on (see module docstring).
    cases = {
        "fwd": (lambda d: conv_nhwc(d["x"], d["w"], stride),
                {"x": x, "w": w}, "x"),
        "dx": (lambda d: jax.grad(loss_nhwc, 0)(d["x"], d["w"], d["dy"]),
               {"x": x, "w": w, "dy": dy}, "dy"),
        "dw": (lambda d: jax.grad(loss_nhwc, 1)(d["x"], d["w"], d["dy"]),
               {"x": x, "w": w, "dy": dy}, "x"),
        # symmetric-pad tap slicing is only exact for stride-1 SAME convs
        # (stride-2 SAME pads asymmetrically); the stride-1 body convs are
        # where the time goes anyway
        **({"dw_tap": (lambda d: dw_tap(d["x"], d["dy"], k, stride),
                       {"x": x, "dy": dy}, "x")} if stride == 1 else {}),
        "redmm": (lambda d: jnp.einsum("ki,ko->io", d["x"], d["dy"],
                                       preferred_element_type=jnp.float32),
                  {"x": xflat, "dy": dyflat}, "x"),
        # the tap-packed Pallas dW kernel (ops/conv_dw_pack.py): all nine
        # taps as one (3*cout, 3*cin)-output matmul, shifts built in VMEM
        **({"dw_pack": (lambda d: _dw_pack(d["x"], d["dy"]),
                        {"x": x, "dy": dy}, "x")} if stride == 1 else {}),
        "fwd_nchw": (lambda d: conv_nchw(d["x"], d["w"], stride),
                     {"x": xc, "w": wc}, "x"),
        "dx_nchw": (lambda d: jax.grad(loss_nchw, 0)(
            d["x"], d["w"], d["dy"]), {"x": xc, "w": wc, "dy": dyc}, "dy"),
        "dw_nchw": (lambda d: jax.grad(loss_nchw, 1)(
            d["x"], d["w"], d["dy"]), {"x": xc, "w": wc, "dy": dyc}, "x"),
    }
    only = None
    for a in sys.argv[8:]:
        if a.startswith("only="):
            only = a[5:].split(",")

    out = {"shape": [b, h, w_, cin, cout], "k": k, "stride": stride,
           "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
           "gflop": round(flops / 1e9, 2)}
    red_flops = 2.0 * b * ho * wo * cin * cout  # one tap's contraction
    for name, (fn, data, pkey) in cases.items():
        if only is not None and name not in only:
            continue
        dt = time_fn_on_device(fn, data, iters=20, perturb_key=pkey)
        fl = red_flops if name == "redmm" else flops
        out[name + "_ms"] = round(dt * 1e3, 3)
        out[name + "_tfs"] = round(fl / dt / 1e12, 1)
    if stride == 1 and only is None:
        # correctness cross-check: the tap formulation equals the native dW
        dw_native = jax.grad(loss_nhwc, 1)(x, w, dy)
        dw_alt = dw_tap(x, dy, k, stride)
        err = float(jnp.max(jnp.abs(dw_native.astype(jnp.float32)
                                    - dw_alt.astype(jnp.float32))) /
                    (float(jnp.max(jnp.abs(dw_native.astype(jnp.float32))))
                     + 1e-9))
        out["dw_tap_relerr"] = round(err, 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
