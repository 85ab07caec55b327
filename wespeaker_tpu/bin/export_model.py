"""Model export for deployment (the export_{onnx,jit,mnn} equivalent).

TPU-native interop format is StableHLO via jax.export: a serialized,
self-contained artifact with signature feats (B, T, F) -> embs (B, D) and
symbolic (dynamic) batch/time dims, runnable from any PJRT plugin or
re-imported into JAX (`load_exported`). Mirrors the reference contract
(wespeaker/bin/export_onnx.py:92-99: names feats->embs, dynamic B/T, and
optional mean-subtraction baked into the graph).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from wespeaker_tpu.bin.extract import load_model_for_eval
from wespeaker_tpu.utils.config import parse_config_or_kwargs


def export_stablehlo(config, checkpoint_path, out_path, mean_vec_path=None,
                     overrides=None, static_shape=None, **kwargs):
    """Serialize the eval forward (feats -> embedding, optional mean
    subtraction) as a StableHLO artifact with dynamic (B, T)."""
    from jax import export as jexport

    configs = parse_config_or_kwargs(config, overrides, **kwargs)
    built, variables = load_model_for_eval(configs, checkpoint_path)
    model = built.model
    feat_dim = configs["model_args"].get("feat_dim", 80)
    mean_vec = (jnp.asarray(np.load(mean_vec_path))
                if mean_vec_path else None)

    def forward(feats):
        emb = model.apply(variables, feats, train=False)
        if mean_vec is not None:
            emb = emb - mean_vec
        return emb

    if static_shape is not None:
        args_spec = jax.ShapeDtypeStruct(tuple(static_shape) + (feat_dim,),
                                         jnp.float32)
    else:
        b, t = jexport.symbolic_shape("b, t")
        args_spec = jax.ShapeDtypeStruct((b, t, feat_dim), jnp.float32)
    exported = jexport.export(jax.jit(forward))(args_spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def load_exported(path: str):
    """Re-import a serialized artifact as a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def export_onnx(config, checkpoint_path, out_path, mean_vec_path=None,
                overrides=None, **kwargs):
    """Serialize the eval forward as a dynamic-shape ONNX model
    (feats (B, T, F) float32 -> embs (B, D), opset 14), matching the
    reference contract wespeaker/bin/export_onnx.py:64-99 — including the
    baked mean-subtraction. Implemented by the in-repo jaxpr->ONNX
    converter (export/jaxpr_to_onnx.py); verify offline with
    export/onnx_numpy.py or any third-party ONNX runtime."""
    from wespeaker_tpu.export.jaxpr_to_onnx import convert

    configs = parse_config_or_kwargs(config, overrides, **kwargs)
    built, variables = load_model_for_eval(configs, checkpoint_path)
    model = built.model
    feat_dim = configs["model_args"].get("feat_dim", 80)
    mean_vec = (jnp.asarray(np.load(mean_vec_path))
                if mean_vec_path else None)

    def forward(feats):
        emb = model.apply(variables, feats, train=False)
        if mean_vec is not None:
            emb = emb - mean_vec
        return emb

    blob = convert(forward, feat_dim=feat_dim)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def export_mnn(config, checkpoint_path, out_path, mean_vec_path=None,
               overrides=None, num_frames: int = 0, **kwargs):
    """Mobile deployment artifact: emit the ONNX model, then drive
    MNNConvert over it — the reference handoff
    (wespeaker/bin/export_mnn.py:66-77; --saveStaticModel when a fixed
    num_frames is requested). When MNNConvert is not on PATH (it is not
    part of this toolchain), the ONNX input is still written next to the
    target and the exact conversion command is printed/returned so the
    handoff can run on any machine with MNN installed."""
    import shutil
    import subprocess

    onnx_path = (out_path[:-4] if out_path.endswith(".mnn")
                 else out_path) + ".onnx"
    export_onnx(config, checkpoint_path, onnx_path, mean_vec_path,
                overrides, **kwargs)
    cmd = ["MNNConvert", "-f", "ONNX", "--modelFile", onnx_path,
           "--MNNModel", out_path, "--bizCode", "MNN"]
    if num_frames > 0:
        cmd.append("--saveStaticModel")
    if shutil.which("MNNConvert") is None:
        print(f"MNNConvert not found; ONNX written to {onnx_path}. "
              "Convert with:\n  " + " ".join(cmd))
        return onnx_path, cmd
    subprocess.run(cmd, check=True)
    subprocess.run(["MNNConvert", "-f", "MNN", "--modelFile", out_path,
                    "--info"], check=False)
    print("Exported MNN model to", out_path)
    return out_path, cmd


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output_model", required=True)
    ap.add_argument("--mean_vec", default=None)
    ap.add_argument("--format", default="stablehlo",
                    choices=["stablehlo", "onnx", "mnn"])
    ap.add_argument("--num_frames", type=int, default=0,
                    help="mnn: fix T and pass --saveStaticModel")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    if args.format == "onnx":
        export_onnx(args.config, args.checkpoint, args.output_model,
                    args.mean_vec, args.overrides)
    elif args.format == "mnn":
        export_mnn(args.config, args.checkpoint, args.output_model,
                   args.mean_vec, args.overrides,
                   num_frames=args.num_frames)
    else:
        export_stablehlo(args.config, args.checkpoint, args.output_model,
                         args.mean_vec, args.overrides)


if __name__ == "__main__":
    main()
