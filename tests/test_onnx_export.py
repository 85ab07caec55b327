"""ONNX export: jaxpr -> dynamic-shape ONNX (opset 14) for the speaker
models, verified against the jax forward through an *independent* decode +
numpy execution path (no onnx/onnxruntime packages exist in this
toolchain). This is the offline stand-in for the reference's pt<->onnx
EER-identity contract (runtime/onnxruntime/README.md:109-110); the emitted
artifact follows wespeaker/bin/export_onnx.py:92-99 (input 'feats'
(B, T, F), output 'embs' (B, D), dynamic B/T, opset 14, baked
mean-subtract)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.export import onnx_numpy, onnx_proto
from wespeaker_tpu.export.jaxpr_to_onnx import DimExpr, convert, fit_dim


def _convert_and_check(model, feat_dim, shapes=((3, 77), (1, 200)),
                       rtol=1e-4):
    x0 = jnp.zeros((2, 48, feat_dim))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    def fn(f):
        return model.apply(variables, f, train=False)

    blob = convert(fn, feat_dim=feat_dim)
    rng = np.random.default_rng(0)
    for (b, t) in shapes:
        feats = rng.normal(size=(b, t, feat_dim)).astype(np.float32)
        want = np.asarray(fn(jnp.asarray(feats)))
        got = onnx_numpy.run(blob, {"feats": feats})["embs"]
        assert got.shape == want.shape
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < rtol, (model.__class__.__name__, b, t, rel)
    return blob


def test_ecapa_roundtrip():
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    blob = _convert_and_check(
        ECAPA_TDNN(channels=32, feat_dim=24, embed_dim=16,
                   global_context_att=True), 24)
    # structural contract: names, dynamic dims, opset
    m = onnx_proto.decode_model(blob)
    assert m.opset == 14
    (inp,), (out,) = m.graph.inputs, m.graph.outputs
    assert inp.name == "feats" and out.name == "embs"
    assert inp.dims == ["B", "T", 24]
    assert out.dims == ["B", 16]


def test_resnet34_roundtrip():
    """Strided 2D convs: time dims become floor-division expressions that
    must generalize beyond the probe shapes."""
    from wespeaker_tpu.models.resnet import ResNet34
    _convert_and_check(ResNet34(feat_dim=40, embed_dim=16), 40)


def test_campplus_roundtrip():
    """CAM layer: dynamic pad-to-segment-multiple + slices."""
    from wespeaker_tpu.models.campplus import CAMPPlus
    _convert_and_check(CAMPPlus(feat_dim=40, embed_dim=16), 40)


@pytest.mark.parametrize("name", ["xvec", "res2net", "eres2net", "gemini",
                                  "samresnet", "repvgg"])
def test_zoo_roundtrip(name):
    from wespeaker_tpu.models.eres2net import ERes2Net34_Base
    from wespeaker_tpu.models.gemini_dfresnet import Gemini_DF_ResNet60
    from wespeaker_tpu.models.repvgg import REPVGG_TINY_A0
    from wespeaker_tpu.models.res2net import Res2Net34_Base
    from wespeaker_tpu.models.samresnet import SimAM_ResNet34_ASP
    from wespeaker_tpu.models.tdnn import XVEC
    model = {
        "xvec": lambda: XVEC(feat_dim=40, embed_dim=16),
        "res2net": lambda: Res2Net34_Base(feat_dim=40, embed_dim=16),
        "eres2net": lambda: ERes2Net34_Base(feat_dim=40, embed_dim=16),
        "gemini": lambda: Gemini_DF_ResNet60(feat_dim=40, embed_dim=16),
        "samresnet": lambda: SimAM_ResNet34_ASP(feat_dim=40, embed_dim=16),
        "repvgg": lambda: REPVGG_TINY_A0(feat_dim=40, embed_dim=16),
    }[name]()
    _convert_and_check(model, 40, shapes=((3, 77),))


def test_mean_subtract_baked(tmp_path):
    """export_onnx CLI path: the training-set mean is subtracted inside the
    graph (reference export_onnx.py:64-78)."""
    import yaml

    from wespeaker_tpu.bin.export_model import export_onnx
    from wespeaker_tpu.utils.checkpoint import save_checkpoint

    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    model = ECAPA_TDNN(channels=32, feat_dim=24, embed_dim=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 48, 24)),
                           train=False)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(str(ckpt), dict(variables))
    mean = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)
    np.save(tmp_path / "mean.npy", mean)
    config = {"model": "ECAPA_TDNN",
              "model_args": {"feat_dim": 24, "embed_dim": 16,
                             "channels": 32}}
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    out = export_onnx(str(cfg_path), str(ckpt), str(tmp_path / "m.onnx"),
                      mean_vec_path=str(tmp_path / "mean.npy"))
    feats = np.random.default_rng(2).normal(size=(2, 60, 24)) \
        .astype(np.float32)
    with open(out, "rb") as f:
        got = onnx_numpy.run(f.read(), {"feats": feats})["embs"]
    want = np.asarray(model.apply(variables, jnp.asarray(feats),
                                  train=False)) - mean
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fit_dim_forms():
    """The symbolic-dim fitter recovers constants, affine, floor-division
    (strided convs), and multiplier/offset forms from probe samples."""
    probes = [(2, 48), (3, 48), (5, 48), (2, 64), (3, 64), (2, 96),
              (2, 53), (2, 71), (2, 80)]

    def samples(fn):
        return [fn(b, t) for b, t in probes]

    cases = [
        lambda b, t: 7,
        lambda b, t: t,
        lambda b, t: b,
        lambda b, t: b * t,
        lambda b, t: 3 * t + 5,
        lambda b, t: (t + 7) // 8,          # ceil(T/8): resnet stride chain
        lambda b, t: (t - 1) // 2 + 1,
        lambda b, t: 20 * ((t + 1) // 2),   # channel-folded padded time
        lambda b, t: 20 * ((t + 1) // 2) - 1,  # ddof=1 count
    ]
    for fn in cases:
        expr = fit_dim(samples(fn), probes)
        for (b, t) in [(1, 199), (4, 77), (7, 111)]:
            assert expr.eval(b, t) == fn(b, t), (fn(1, 199), expr)


def test_proto_roundtrip():
    """Writer -> reader round-trip preserves graph structure and arrays."""
    w = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
    g = onnx_proto.Graph(
        "g",
        [onnx_proto.Node("MatMul", ["x", "w"], ["y"], name="mm"),
         onnx_proto.Node("Transpose", ["y"], ["z"], {"perm": [1, 0]})],
        [onnx_proto.ValueInfo("x", onnx_proto.FLOAT, ["B", 3])],
        [onnx_proto.ValueInfo("z", onnx_proto.FLOAT, [4, "B"])],
        [onnx_proto.Tensor("w", w)])
    blob = onnx_proto.encode_model(g, opset=14)
    m = onnx_proto.decode_model(blob)
    assert m.opset == 14 and m.producer == "wespeaker-tpu"
    assert [n.op_type for n in m.graph.nodes] == ["MatMul", "Transpose"]
    assert m.graph.nodes[1].attrs["perm"] == [1, 0]
    np.testing.assert_array_equal(m.graph.initializers[0].array, w)
    assert m.graph.inputs[0].dims == ["B", 3]


@pytest.mark.parametrize("name", ["redimnet", "redimnet2"])
def test_redimnet_roundtrip(name):
    """ReDimNet(2): learned per-stage input weighting (softmax stage
    mixing), 1d<->2d dim reshapes, and the max-stride time truncation
    (an explicit lax.slice so the op sequence is probe-stable)."""
    from wespeaker_tpu.models.redimnet import ReDimNetB0
    from wespeaker_tpu.models.redimnet2 import ReDimNet2B0
    model = {"redimnet": lambda: ReDimNetB0(feat_dim=72, embed_dim=16),
             "redimnet2": lambda: ReDimNet2B0(feat_dim=72, embed_dim=16),
             }[name]()
    _convert_and_check(model, 72)
