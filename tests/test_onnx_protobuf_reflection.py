"""Third-party decode of the exported ONNX artifact (VERDICT r3 item 8).

No `onnx`/`onnxruntime` package exists in this toolchain, so the strongest
available independent decoder is Google protobuf itself: protoc compiles
the vendored public schema (export/onnx.proto3 — field numbers transcribed
from onnx/onnx.proto3, NOT from our writer) to a descriptor set, and the
google.protobuf runtime's wire parser — a codebase that shares nothing
with export/onnx_proto.py — parses the artifact through reflection. A
protobuf-encoding quirk in the hand-rolled writer (bad varint, wrong wire
type, truncated length) fails ParseFromString here even though the
in-repo decode+numpy round trip (tests/test_onnx_export.py) would survive
it. The checks then mirror onnx.checker's core: SSA well-formedness,
typed graph IO, raw_data sizes, attribute type-tag consistency.

Finally the protobuf runtime RE-serializes the model (canonical proto3:
packed repeated scalars, ascending field order) and our own reader +
numpy executor must accept that encoding too and produce identical
embeddings — cross-codec agreement in both directions.

Reference contract: wespeaker/bin/export_onnx.py:92-99 (opset 14, input
'feats' (B,T,F), output 'embs' (B,D), dynamic B/T).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.export import onnx_numpy, onnx_proto  # noqa: E402
from wespeaker_tpu.export.jaxpr_to_onnx import convert  # noqa: E402

PROTO_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "wespeaker_tpu", "export", "onnx.proto3")


@pytest.fixture(scope="module")
def onnx_messages(tmp_path_factory):
    """protoc-compiled descriptor pool -> dynamic message classes."""
    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    google_protobuf = pytest.importorskip("google.protobuf")  # noqa: F841
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)
    d = tmp_path_factory.mktemp("onnx_proto")
    src = os.path.join(d, "onnx.proto")  # protoc requires .proto suffix
    shutil.copy(PROTO_SRC, src)
    out = os.path.join(d, "onnx.desc")
    subprocess.run(["protoc", f"--proto_path={d}",
                    f"--descriptor_set_out={out}", "onnx.proto"],
                   check=True)
    with open(out, "rb") as f:
        fds = descriptor_pb2.FileDescriptorSet.FromString(f.read())
    pool = descriptor_pool.DescriptorPool()
    for fd in fds.file:
        pool.Add(fd)

    def cls(name):
        return message_factory.GetMessageClass(
            pool.FindMessageTypeByName(f"onnx.{name}"))

    return {"ModelProto": cls("ModelProto")}


@pytest.fixture(scope="module")
def exported_blob():
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    feat_dim = 24
    model = ECAPA_TDNN(channels=32, feat_dim=feat_dim, embed_dim=16,
                       global_context_att=True)
    x0 = jnp.zeros((2, 48, feat_dim))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    def fn(f):
        return model.apply(variables, f, train=False)

    return convert(fn, feat_dim=feat_dim), feat_dim


def test_protobuf_reflection_accepts_artifact(onnx_messages, exported_blob):
    blob, feat_dim = exported_blob
    m = onnx_messages["ModelProto"]()
    # the wire-format gate: google.protobuf's parser, not our reader
    m.ParseFromString(blob)

    assert m.ir_version == 8
    assert any(o.version == 14 and o.domain == ""
               for o in m.opset_import)
    g = m.graph
    assert len(g.node) > 0 and len(g.initializer) > 0

    # typed graph IO with the reference's dynamic-dim contract
    (inp,), (out,) = g.input, g.output
    assert inp.name == "feats" and out.name == "embs"
    in_dims = inp.type.tensor_type.shape.dim
    assert [d.dim_param or d.dim_value for d in in_dims] == \
        ["B", "T", feat_dim]
    assert inp.type.tensor_type.elem_type == 1  # FLOAT

    # onnx.checker core: SSA — every node input is a graph input, an
    # initializer, or a previous node's output; every op_type nonempty
    defined = {v.name for v in g.input} | {t.name for t in g.initializer}
    for node in g.node:
        assert node.op_type, node
        for name in node.input:
            assert name == "" or name in defined, (node.op_type, name)
        defined.update(node.output)
    assert out.name in defined

    # initializer payload sizes match dims x dtype width
    itemsize = {1: 4, 6: 4, 7: 8, 9: 1, 10: 2, 11: 8}
    for t in g.initializer:
        n = int(np.prod(list(t.dims), dtype=np.int64)) if t.dims else 1
        assert len(t.raw_data) == n * itemsize[t.data_type], t.name

    # attribute type tags are set and consistent with the populated field
    for node in g.node:
        for a in node.attribute:
            assert a.type != 0, (node.op_type, a.name)
            if a.type == 2:       # INT
                assert not a.ints
            elif a.type == 7:     # INTS
                assert len(a.ints) >= 1 or True  # empty INTS legal
            elif a.type == 4:     # TENSOR
                assert a.t.data_type != 0


def test_canonical_reserialization_roundtrips(onnx_messages, exported_blob):
    """protobuf's canonical re-encoding (packed repeated scalars) must
    execute identically through our reader + numpy executor."""
    blob, feat_dim = exported_blob
    m = onnx_messages["ModelProto"]()
    m.ParseFromString(blob)
    canonical = m.SerializeToString()

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 77, feat_dim)).astype(np.float32)
    want = onnx_numpy.run(blob, {"feats": feats})["embs"]
    got = onnx_numpy.run(canonical, {"feats": feats})["embs"]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # structural agreement between the two decoders
    ours = onnx_proto.decode_model(canonical)
    assert [n.op_type for n in ours.graph.nodes] == \
        [n.op_type for n in m.graph.node]
    assert ours.opset == 14 and ours.ir_version == 8
