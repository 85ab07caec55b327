"""Per-primitive ONNX emitters for export/jaxpr_to_onnx.py.

Each emitter takes an _EqnCtx (builder, flat equation, resolved input
names, fitted output DimExprs, per-probe params) and returns the ONNX
value name(s) of the equation outputs. Opset 14 semantics throughout
(ReduceSum takes axes as an input; ReduceMax still uses the axes attr;
Squeeze takes axes as an input).
"""

from typing import Dict

import numpy as np

from wespeaker_tpu.export import onnx_proto as op
from wespeaker_tpu.export.jaxpr_to_onnx import ConversionError, DimExpr

EMITTERS: Dict[str, callable] = {}


def emitter(*names):
    def deco(fn):
        for n in names:
            EMITTERS[n] = fn
        return fn
    return deco


def _i64(b, values):
    return b.const(np.asarray(values, np.int64))


# ---------------- elementwise ----------------

_BINOP = {"add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
          "max": "Max", "min": "Min", "pow": "Pow", "rem": "Mod",
          "atan2": None, "and": "And", "or": "Or"}


@emitter("add", "sub", "mul", "div", "max", "min", "pow")
def _binop(ctx):
    return ctx.b.add(_BINOP[ctx.eqn.prim], ctx.ins)


_UNOP = {"exp": "Exp", "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
         "sqrt": "Sqrt", "abs": "Abs", "neg": "Neg", "sign": "Sign",
         "floor": "Floor", "ceil": "Ceil", "erf": "Erf",
         "stop_gradient": "Identity", "copy": "Identity"}


@emitter("exp", "log", "tanh", "logistic", "sqrt", "abs", "neg", "sign",
         "floor", "ceil", "erf", "stop_gradient", "copy")
def _unop(ctx):
    return ctx.b.add(_UNOP[ctx.eqn.prim], ctx.ins)


@emitter("rsqrt")
def _rsqrt(ctx):
    return ctx.b.add("Reciprocal", [ctx.b.add("Sqrt", ctx.ins)])


@emitter("square")
def _square(ctx):
    return ctx.b.add("Mul", [ctx.ins[0], ctx.ins[0]])


@emitter("erfc")
def _erfc(ctx):
    one = ctx.b.const(np.float32(1.0))
    return ctx.b.add("Sub", [one, ctx.b.add("Erf", ctx.ins)])


@emitter("integer_pow")
def _integer_pow(ctx):
    y = ctx.eqn.params["y"]
    x = ctx.ins[0]
    if y == 2:
        return ctx.b.add("Mul", [x, x])
    if y == 3:
        return ctx.b.add("Mul", [ctx.b.add("Mul", [x, x]), x])
    if y == -1:
        return ctx.b.add("Reciprocal", [x])
    if y == -2:
        return ctx.b.add("Reciprocal", [ctx.b.add("Mul", [x, x])])
    return ctx.b.add("Pow", [x, ctx.b.const(np.float32(y))])


@emitter("convert_element_type")
def _cast(ctx):
    dt = np.dtype(ctx.eqn.params["new_dtype"])
    if dt == np.float64:
        dt = np.dtype(np.float32)  # export runs in f32
    return ctx.b.add("Cast", ctx.ins, attrs={"to": op.NP_TO_ONNX[dt]})


@emitter("select_n")
def _select_n(ctx):
    if len(ctx.ins) != 3:
        raise ConversionError("select_n with >2 cases")
    pred, on_false, on_true = ctx.ins
    return ctx.b.add("Where", [pred, on_true, on_false])


# ---------------- reductions ----------------

@emitter("reduce_sum")
def _reduce_sum(ctx):
    axes = _i64(ctx.b, list(ctx.eqn.params["axes"]))
    return ctx.b.add("ReduceSum", [ctx.ins[0], axes],
                     attrs={"keepdims": 0})


@emitter("reduce_max")
def _reduce_max(ctx):
    return ctx.b.add("ReduceMax", [ctx.ins[0]],
                     attrs={"axes": list(ctx.eqn.params["axes"]),
                            "keepdims": 0})


@emitter("reduce_min")
def _reduce_min(ctx):
    return ctx.b.add("ReduceMin", [ctx.ins[0]],
                     attrs={"axes": list(ctx.eqn.params["axes"]),
                            "keepdims": 0})


# ---------------- shape ops ----------------

@emitter("reshape")
def _reshape(ctx):
    dims = ctx.param_dims("new_sizes")
    shape = ctx.b.shape_tensor(dims)
    return ctx.b.add("Reshape", [ctx.ins[0], shape])


@emitter("squeeze")
def _squeeze(ctx):
    axes = _i64(ctx.b, list(ctx.eqn.params["dimensions"]))
    return ctx.b.add("Squeeze", [ctx.ins[0], axes])


@emitter("expand_dims")
def _expand_dims(ctx):
    axes = _i64(ctx.b, list(ctx.eqn.params["dimensions"]))
    return ctx.b.add("Unsqueeze", [ctx.ins[0], axes])


@emitter("transpose")
def _transpose(ctx):
    return ctx.b.add("Transpose", ctx.ins,
                     attrs={"perm": list(ctx.eqn.params["permutation"])})


@emitter("broadcast_in_dim")
def _broadcast_in_dim(ctx):
    tgt = ctx.param_dims("shape")
    bcast = list(ctx.eqn.params["broadcast_dimensions"])
    in_dims = ctx.in_dims[0]
    # step 1: reshape the operand so its dims sit at broadcast_dimensions
    # with 1s elsewhere; step 2: Expand to the target shape
    mid = [in_dims[bcast.index(d)] if d in bcast else DimExpr(1)
           for d in range(len(tgt))]
    x = ctx.ins[0]
    if len(in_dims) != len(tgt) or mid != in_dims:
        x = ctx.b.add("Reshape", [x, ctx.b.shape_tensor(mid)])
    if mid == tgt:
        return x
    return ctx.b.add("Expand", [x, ctx.b.shape_tensor(tgt)])


@emitter("concatenate")
def _concat(ctx):
    return ctx.b.add("Concat", ctx.ins,
                     attrs={"axis": int(ctx.eqn.params["dimension"])})


@emitter("slice")
def _slice(ctx):
    starts = ctx.param_dims("start_indices")
    ends = ctx.param_dims("limit_indices")
    strides = ctx.eqn.params.get("strides")
    rank = len(starts)
    axes = _i64(ctx.b, list(range(rank)))
    steps = _i64(ctx.b, [1] * rank if strides is None else list(strides))
    return ctx.b.add("Slice", [
        ctx.ins[0], ctx.b.shape_tensor(starts), ctx.b.shape_tensor(ends),
        axes, steps])


@emitter("rev")
def _rev(ctx):
    dims = list(ctx.eqn.params["dimensions"])
    out = ctx.ins[0]
    for d in dims:
        out = ctx.b.add("Slice", [
            out, _i64(ctx.b, [-1]),
            _i64(ctx.b, [np.iinfo(np.int64).min]),
            _i64(ctx.b, [d]), _i64(ctx.b, [-1])])
    return out


@emitter("pad")
def _pad(ctx):
    cfgs = [p["padding_config"] for p in ctx.params_pp]
    cfg0 = cfgs[0]
    if any(interior != 0 for _, _, interior in cfg0):
        raise ConversionError("interior padding not exportable")
    rank = len(cfg0)
    # pad amounts may vary with T (e.g. CAM++ pads T to a segment
    # multiple): fit each lo/hi across probes
    los = [ctx.fit([int(c[d][0]) for c in cfgs]) for d in range(rank)]
    his = [ctx.fit([int(c[d][1]) for c in cfgs]) for d in range(rank)]

    def sample(e):  # representative sign (DimExprs here are monotone)
        return e.eval(*ctx.probes[0])

    if any(sample(e) < 0 for e in los + his):
        # negative padding = cropping: Slice for the negative parts, then
        # Pad the positive parts (static-only for the mixed case)
        if not all(e.is_const for e in los + his):
            raise ConversionError("dynamic negative padding")
        starts = [max(0, -e.const) for e in los]
        ends = [(-max(0, -e.const)) or np.iinfo(np.int64).max for e in his]
        sliced = ctx.b.add("Slice", [
            ctx.ins[0], _i64(ctx.b, starts), _i64(ctx.b, ends),
            _i64(ctx.b, list(range(rank))), _i64(ctx.b, [1] * rank)])
        pads = [max(0, e.const) for e in los] + \
               [max(0, e.const) for e in his]
        if all(p == 0 for p in pads):
            return sliced
        return ctx.b.add("Pad", [sliced, _i64(ctx.b, pads), ctx.ins[1]])
    pads = ctx.b.shape_tensor(los + his)
    return ctx.b.add("Pad", [ctx.ins[0], pads, ctx.ins[1]])


# ---------------- matmul / conv ----------------

@emitter("dot_general")
def _dot_general(ctx):
    (lc, rc), (lb, rb) = ctx.eqn.params["dimension_numbers"]
    lhs, rhs = ctx.ins
    lrank, rrank = len(ctx.in_dims[0]), len(ctx.in_dims[1])
    if len(lc) != 1 or len(rc) != 1:
        raise ConversionError(
            f"multi-dim contraction {ctx.eqn.params['dimension_numbers']}")
    nb = len(lb)
    if tuple(lb) != tuple(range(nb)) or tuple(rb) != tuple(range(nb)):
        raise ConversionError(
            f"non-leading batch dims {ctx.eqn.params['dimension_numbers']}")
    # arrange lhs (batch..., M..., K) and rhs (batch..., K, N): MatMul
    if lc[0] != lrank - 1:
        perm = [d for d in range(lrank) if d != lc[0]] + [lc[0]]
        lhs = ctx.b.add("Transpose", [lhs], attrs={"perm": perm})
    if rc[0] != rrank - 2:
        perm = [d for d in range(rrank) if d != rc[0]]
        perm.insert(rrank - 2, rc[0])
        rhs = ctx.b.add("Transpose", [rhs], attrs={"perm": perm})
    return ctx.b.add("MatMul", [lhs, rhs])


@emitter("conv_general_dilated")
def _conv(ctx):
    p = ctx.eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    if p.get("batch_group_count", 1) != 1:
        raise ConversionError("batch_group_count != 1")
    if any(d != 1 for d in p.get("lhs_dilation", ())):
        raise ConversionError("lhs_dilation (transposed conv)")
    nsp = len(lhs_spec) - 2
    # jax ConvDimensionNumbers stores specs as index tuples: lhs_spec =
    # (batch_dim, feature_dim, spatial_dims...); transpose to N, C, sp...
    in_perm = [lhs_spec[0], lhs_spec[1]] + list(lhs_spec[2:])
    x = ctx.ins[0]
    if in_perm != list(range(nsp + 2)):
        x = ctx.b.add("Transpose", [x], attrs={"perm": in_perm})
    # weight initializer -> (O, I, spatial...)
    w_perm = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])
    w = ctx.ins[1]
    if w_perm != list(range(nsp + 2)):
        w = ctx.b.add("Transpose", [w], attrs={"perm": w_perm})
    padding = p["padding"]
    pads = [lo for lo, _ in padding] + [hi for _, hi in padding]
    attrs = {
        "strides": list(p["window_strides"]),
        "pads": pads,
        "dilations": list(p.get("rhs_dilation") or [1] * nsp),
        "group": int(p.get("feature_group_count", 1)),
    }
    y = ctx.b.add("Conv", [x, w], attrs=attrs)
    # back to jax output layout
    out_perm = [out_spec[0], out_spec[1]] + list(out_spec[2:])
    inv = [0] * (nsp + 2)
    for i, d in enumerate(out_perm):
        inv[d] = i
    if inv != list(range(nsp + 2)):
        y = ctx.b.add("Transpose", [y], attrs={"perm": inv})
    return y
