"""jaxpr -> ONNX converter with dynamic batch/time dims.

Reference contract (wespeaker/bin/export_onnx.py:64-99): export the eval
forward as ONNX opset 14 with input 'feats' (B, T, F) float32, output
'embs' (B, D), dynamic B/T axes, optional mean-subtraction baked in.

Design (no `onnx`/`jax2onnx` packages exist in the toolchain):

1. The forward is traced to a jaxpr at several *static* probe shapes
   (different B and T). pjit/custom_jvp sub-jaxprs are inlined into one
   flat equation list; all probes must produce the identical op sequence
   (true for these models — no shape-dependent control flow).
2. Any integer that differs across probes (reshape targets, broadcast
   shapes, slice limits) and any float literal that differs (e.g. the 1/T
   factor inside a mean) is fitted to a closed form over (B, T):
   affine c0 + cB*B + cT*T + cBT*B*T, its floor-division by a small
   constant (strided convs), or the reciprocal of such a form (mean
   factors). The fit must reproduce every probe exactly.
3. Equations are emitted as ONNX nodes. Fitted dims become runtime
   int64 scalars computed from Shape(feats) (Gather/Mul/Add/Div nodes),
   concatenated into shape tensors for Reshape/Expand/Slice — so the
   artifact is genuinely dynamic, not a static-shape dump.

The op subset emitted: Conv, MatMul, Einsum (rare), Add, Sub, Mul, Div,
Max, Reciprocal, Sqrt, Exp, Tanh, Sigmoid, Pow, ReduceSum, ReduceMax,
Concat, Slice, Pad, Reshape, Expand, Squeeze, Transpose, Cast, Identity,
Shape, Gather. export/onnx_numpy.py executes exactly this subset for
offline parity tests.
"""

import itertools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from wespeaker_tpu.export import onnx_proto as op

# probe (B, T) assignments; T values deliberately span residues mod 2/4/8/16
# so floor-division chains (strided convs) are identifiable, several B
# values to separate batch from time
PROBES = [(2, 48), (3, 48), (5, 48), (2, 64), (3, 64), (2, 96), (2, 53),
          (2, 71), (2, 80)]

_INLINE_PRIMS = {"pjit", "jit", "custom_jvp_call", "custom_vjp_call",
                 "closed_call", "core_call", "remat", "checkpoint",
                 "custom_vjp_call_jaxpr"}


# ---------------- symbolic dims over (B, T) ----------------

@dataclass(frozen=True)
class DimExpr:
    """value = mul * ((c0 + cB*B + cT*T + cBT*B*T) // den) + add, or the
    float reciprocal of that when `recip` (mean factors). The
    post-multiplier/offset cover dims like 20*floor((T+1)/2) - 1
    (channel-folded padded time, ddof=1 variance counts)."""
    c0: int
    cB: int = 0
    cT: int = 0
    cBT: int = 0
    den: int = 1
    mul: int = 1
    add: int = 0
    recip: bool = False

    def eval(self, b, t):
        v = self.mul * ((self.c0 + self.cB * b + self.cT * t
                         + self.cBT * b * t) // self.den) + self.add
        return 1.0 / v if self.recip else v

    @property
    def is_const(self):
        return self.cB == 0 and self.cT == 0 and self.cBT == 0

    @property
    def const(self):
        assert self.is_const
        v = self.mul * (self.c0 // self.den) + self.add
        return 1.0 / v if self.recip else v


def fit_dim(samples: List[int], probes=None) -> DimExpr:
    """Fit an integer sequence observed across probes to a DimExpr."""
    probes = probes or PROBES
    vals = np.asarray(samples, np.int64)
    if np.all(vals == vals[0]):
        return DimExpr(int(vals[0]))
    A = np.asarray([[1, b, t, b * t] for b, t in probes], np.float64)
    # prefer the simplest explanation: fewer active terms first, so a
    # degenerate probe design can't smuggle in spurious B-dependence
    col_sets = ([0, 2], [0, 1], [0, 3], [0, 1, 2], [0, 2, 3], [0, 1, 2, 3])
    for den in (1, 2, 3, 4, 5, 6, 8, 16):
        # with floor-div: den*v <= num < den*(v+1); the lstsq pins the
        # slope coefficients, the intercept is searched exhaustively
        # (nested strided convs collapse to (c0 + cT*T) // den with c0
        # possibly outside [0, den))
        for cols in col_sets:
            coef, *_ = np.linalg.lstsq(A[:, cols], vals * den, rcond=None)
            full = np.zeros(4, np.int64)
            full[list(cols)] = np.round(coef).astype(np.int64)
            base = A.astype(np.int64) @ np.array([0, *full[1:]], np.int64)
            lo = int(full[0]) - 4 * den
            for off in range(lo, int(full[0]) + 4 * den + 1):
                if np.all((base + off) // den == vals):
                    return DimExpr(int(off), int(full[1]), int(full[2]),
                                   int(full[3]), den)
    # factor out a common multiplier and offset: e.g. 20*floor((T+1)/2)
    # or 20*floor((T+1)/2) - 1 (ddof=1 counts)
    g = int(np.gcd.reduce(np.abs(vals - vals[0]))) if len(vals) > 1 else 0
    if g > 1:
        r = int(vals[0]) % g
        for add in (0, r, r - g):
            shifted = vals - add
            if np.all(shifted % g == 0):
                try:
                    inner = fit_dim([int(v) // g for v in shifted], probes)
                except ValueError:
                    continue
                if inner.mul == 1 and inner.add == 0:
                    return DimExpr(inner.c0, inner.cB, inner.cT,
                                   inner.cBT, inner.den, mul=g, add=add)
    raise ValueError(f"cannot fit dim samples {samples} over {probes}")


def fit_float(samples: List[float], probes=None) -> Optional[DimExpr]:
    """Fit a float literal that varies across probes as 1/affine (mean
    factors). Returns None if constant (caller keeps the literal)."""
    probes = probes or PROBES
    vals = np.asarray(samples, np.float64)
    if np.all(vals == vals[0]):
        return None
    direct = np.round(vals).astype(np.int64)
    if np.allclose(vals, direct, rtol=1e-6):
        return fit_dim(list(direct), probes)  # e.g. a T factor in a std
    inv = 1.0 / vals
    ivals = np.round(inv).astype(np.int64)
    if not np.allclose(inv, ivals, rtol=1e-4):
        raise ValueError(f"cannot fit float literal {samples}")
    expr = fit_dim(list(ivals), probes)
    return DimExpr(expr.c0, expr.cB, expr.cT, expr.cBT, expr.den,
                   expr.mul, expr.add, recip=True)


# ---------------- jaxpr flattening ----------------

@dataclass
class FlatEqn:
    prim: str
    invals: List[Any]        # var key (str) or ("lit", np.ndarray)
    outvals: List[str]
    params: Dict[str, Any]
    in_shapes: List[Tuple[int, ...]]
    out_shapes: List[Tuple[int, ...]]
    out_dtypes: List[Any]


def flatten_jaxpr(closed) -> Tuple[List[FlatEqn], List[str], List[str],
                                   Dict[str, np.ndarray]]:
    """Inline pjit/custom_jvp/... and return (eqns, input_keys, output_keys,
    consts {key: array})."""
    from jax.extend.core import Literal

    eqns: List[FlatEqn] = []
    counter = itertools.count()
    consts: Dict[str, np.ndarray] = {}

    def walk(jaxpr, in_keys, const_keys):
        env: Dict[Any, Any] = {}
        for v, k in zip(jaxpr.invars, in_keys):
            env[v] = k
        for v, k in zip(jaxpr.constvars, const_keys):
            env[v] = k

        def read(atom):
            if isinstance(atom, Literal):
                return ("lit", np.asarray(atom.val))
            return env[atom]

        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            ins = [read(a) for a in eqn.invars]
            if name in _INLINE_PRIMS:
                inner = None
                for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                    if key in eqn.params:
                        inner = eqn.params[key]
                        break
                assert inner is not None, f"no sub-jaxpr in {name}"
                if hasattr(inner, "jaxpr"):  # ClosedJaxpr
                    ckeys = []
                    for c in inner.consts:
                        k = f"c{next(counter)}"
                        consts[k] = np.asarray(c)
                        ckeys.append(k)
                    outs = walk(inner.jaxpr, ins, ckeys)
                else:
                    outs = walk(inner, ins, [])
                for v, k in zip(eqn.outvars, outs):
                    env[v] = k
                continue
            outs = []
            for v in eqn.outvars:
                k = f"t{next(counter)}"
                env[v] = k
                outs.append(k)
            eqns.append(FlatEqn(
                name, ins, outs, dict(eqn.params),
                [tuple(np.shape(a.val)) if isinstance(a, Literal)
                 else tuple(a.aval.shape) for a in eqn.invars],
                [tuple(v.aval.shape) for v in eqn.outvars],
                [v.aval.dtype for v in eqn.outvars]))
        return [read(v) for v in jaxpr.outvars]

    const_keys = []
    for c in closed.consts:
        k = f"c{next(counter)}"
        consts[k] = np.asarray(c)
        const_keys.append(k)
    in_keys = [f"in{i}" for i in range(len(closed.jaxpr.invars))]
    out_keys = walk(closed.jaxpr, in_keys, const_keys)
    return eqns, in_keys, out_keys, consts


# ---------------- converter ----------------

class _Builder:
    """Accumulates ONNX nodes/initializers and the runtime dim scalars."""

    def __init__(self, input_name: str):
        self.nodes: List[op.Node] = []
        self.inits: List[op.Tensor] = []
        self._count = itertools.count()
        self._dim_cache: Dict[Any, str] = {}
        self._const_cache: Dict[Any, str] = {}
        self.input_name = input_name
        self._shape_of_input: Optional[str] = None

    def fresh(self, hint="n"):
        return f"{hint}_{next(self._count)}"

    def add(self, op_type, inputs, n_out=1, attrs=None, hint=None):
        outs = [self.fresh(hint or op_type.lower()) for _ in range(n_out)]
        self.nodes.append(op.Node(op_type, list(inputs), outs, attrs or {},
                                  name=self.fresh(op_type)))
        return outs[0] if n_out == 1 else outs

    def const(self, array: np.ndarray, hint="const"):
        array = np.asarray(array)
        key = (array.dtype.str, array.shape, array.tobytes())
        if key in self._const_cache:
            return self._const_cache[key]
        name = self.fresh(hint)
        self.inits.append(op.Tensor(name, array))
        self._const_cache[key] = name
        return name

    # -- runtime dim scalars (1-D int64 tensors of length 1) --

    def _base_dim(self, axis: int) -> str:
        key = ("base", axis)
        if key not in self._dim_cache:
            if self._shape_of_input is None:
                self._shape_of_input = self.add(
                    "Shape", [self.input_name], hint="feats_shape")
            idx = self.const(np.asarray([axis], np.int64), "axis")
            self._dim_cache[key] = self.add(
                "Gather", [self._shape_of_input, idx],
                attrs={"axis": 0}, hint=f"dim{axis}")
        return self._dim_cache[key]

    def dim_tensor(self, expr: DimExpr) -> str:
        """1-D int64 [1] tensor computing the (non-recip) DimExpr."""
        assert not expr.recip
        key = expr
        if key in self._dim_cache:
            return self._dim_cache[key]
        if expr.is_const:
            out = self.const(np.asarray([expr.const], np.int64), "dimc")
        else:
            terms = []
            if expr.c0:
                terms.append(self.const(np.asarray([expr.c0], np.int64)))
            for coef, builder in ((expr.cB, lambda: self._base_dim(0)),
                                  (expr.cT, lambda: self._base_dim(1))):
                if coef == 0:
                    continue
                base = builder()
                if coef == 1:
                    terms.append(base)
                else:
                    terms.append(self.add("Mul", [
                        self.const(np.asarray([coef], np.int64)), base]))
            if expr.cBT:
                bt = self.add("Mul", [self._base_dim(0), self._base_dim(1)])
                if expr.cBT == 1:
                    terms.append(bt)
                else:
                    terms.append(self.add("Mul", [
                        self.const(np.asarray([expr.cBT], np.int64)), bt]))
            out = terms[0]
            for t in terms[1:]:
                out = self.add("Add", [out, t])
            if expr.den != 1:
                out = self.add("Div", [
                    out, self.const(np.asarray([expr.den], np.int64))])
            if expr.mul != 1:
                out = self.add("Mul", [
                    out, self.const(np.asarray([expr.mul], np.int64))])
            if expr.add != 0:
                out = self.add("Add", [
                    out, self.const(np.asarray([expr.add], np.int64))])
        self._dim_cache[key] = out
        return out

    def shape_tensor(self, dims: List[DimExpr]) -> str:
        parts = [self.dim_tensor(d) for d in dims]
        if len(parts) == 1:
            return parts[0]
        return self.add("Concat", parts, attrs={"axis": 0}, hint="shape")

    def float_dim(self, expr: DimExpr, dtype=np.float32) -> str:
        """Scalar float tensor for a recip DimExpr (mean factor)."""
        base = self.dim_tensor(DimExpr(expr.c0, expr.cB, expr.cT, expr.cBT,
                                       expr.den, expr.mul, expr.add))
        f = self.add("Cast", [base],
                     attrs={"to": op.NP_TO_ONNX[np.dtype(dtype)]})
        # reshape [1] -> scalar, so elementwise broadcast matches jax's
        # scalar literal semantics
        f = self.add("Reshape",
                     [f, self.const(np.zeros((0,), np.int64), "scalar")])
        if expr.recip:
            f = self.add("Reciprocal", [f])
        return f


class ConversionError(NotImplementedError):
    pass


def convert(fn, feat_dim: int, probes=None,
            input_name="feats", output_name="embs") -> bytes:
    """Trace `fn(feats)` (feats (B, T, feat_dim) float32 -> (B, D)) at the
    probe shapes and emit a dynamic-shape ONNX model (serialized bytes)."""
    import jax
    import jax.numpy as jnp

    probes = probes or PROBES
    flats = []
    for b, t in probes:
        closed = jax.make_jaxpr(fn)(
            jax.ShapeDtypeStruct((b, t, feat_dim), jnp.float32))
        flats.append(flatten_jaxpr(closed))
    eqns0, in_keys, out_keys, consts = flats[0]
    for i, (eqns_i, _, _, _) in enumerate(flats[1:], 1):
        sig0 = [e.prim for e in eqns0]
        sigi = [e.prim for e in eqns_i]
        if sig0 != sigi:
            raise ConversionError(
                f"probe {probes[i]} traced a different op sequence than "
                f"{probes[0]} — shape-dependent control flow is not "
                "exportable")

    assert len(in_keys) == 1 and len(out_keys) == 1
    b0 = _Builder(input_name)
    env: Dict[str, str] = {in_keys[0]: input_name}

    def fit_shape(shapes_per_probe) -> List[DimExpr]:
        rank = len(shapes_per_probe[0])
        return [fit_dim([s[d] for s in shapes_per_probe], probes)
                for d in range(rank)]

    def val_in(idx_eqn: int, idx_in: int) -> str:
        """ONNX name for an equation input (var or literal)."""
        v = eqns0[idx_eqn].invals[idx_in]
        if isinstance(v, tuple) and v[0] == "lit":
            # literal: may vary across probes (e.g. 1/T mean factor)
            vals = [f[0][idx_eqn].invals[idx_in][1] for f in flats]
            arr0 = np.asarray(vals[0])
            if arr0.dtype.kind == "f" and arr0.ndim == 0:
                expr = fit_float([float(x) for x in vals], probes)
                if expr is not None:
                    return b0.float_dim(expr, arr0.dtype)
            if not all(np.array_equal(arr0, a) for a in vals[1:]):
                raise ConversionError(
                    f"literal varies across probes: {vals}")
            if arr0.dtype == np.float64:
                arr0 = arr0.astype(np.float32)
            return b0.const(arr0, "lit")
        return env[v]

    # weights as initializers
    for k, arr in consts.items():
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        env[k] = b0.const(arr, "w")

    from wespeaker_tpu.export.onnx_ops import EMITTERS

    for i, eqn in enumerate(eqns0):
        emitter = EMITTERS.get(eqn.prim)
        if emitter is None:
            raise ConversionError(f"primitive {eqn.prim} not supported "
                                  "by the ONNX exporter")
        ins = [val_in(i, j) for j in range(len(eqn.invals))]
        out_shapes_pp = [[f[0][i].out_shapes[o] for f in flats]
                         for o in range(len(eqn.outvals))]
        in_shapes_pp = [[f[0][i].in_shapes[j] for f in flats]
                        for j in range(len(eqn.invals))]
        ctx = _EqnCtx(b0, eqn, ins, probes,
                      [fit_shape(sp) for sp in out_shapes_pp],
                      [fit_shape(sp) for sp in in_shapes_pp],
                      [f[0][i].params for f in flats],
                      lambda seq: fit_dim(seq, probes))
        outs = emitter(ctx)
        if isinstance(outs, str):
            outs = [outs]
        for k, o in zip(eqn.outvals, outs):
            env[k] = o

    out_src = env[out_keys[0]]
    b0.nodes.append(op.Node("Identity", [out_src], [output_name],
                            name="final_identity"))

    # output embedding dim: static D, dynamic B
    d_out = None
    for eqn in reversed(eqns0):
        if out_keys[0] in eqn.outvals:
            d_out = eqn.out_shapes[eqn.outvals.index(out_keys[0])][-1]
            break
    graph = op.Graph(
        "wespeaker_tpu",
        b0.nodes,
        [op.ValueInfo(input_name, op.FLOAT, ["B", "T", feat_dim])],
        [op.ValueInfo(output_name, op.FLOAT, ["B", d_out])],
        b0.inits)
    return op.encode_model(graph, opset=14)


@dataclass
class _EqnCtx:
    b: _Builder
    eqn: FlatEqn
    ins: List[str]
    probes: List[Tuple[int, int]]
    out_dims: List[List[DimExpr]]   # per output, fitted DimExpr per axis
    in_dims: List[List[DimExpr]]    # per input, fitted DimExpr per axis
    params_pp: List[Dict]           # eqn params per probe
    fit: Any                        # fit_dim bound to probes

    def param_dims(self, key) -> List[DimExpr]:
        """Fit an integer-sequence param (e.g. reshape new_sizes) across
        probes into DimExprs."""
        seqs = [p[key] for p in self.params_pp]
        rank = len(seqs[0])
        return [self.fit([int(s[d]) for s in seqs]) for d in range(rank)]
