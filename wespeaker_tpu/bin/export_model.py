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


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output_model", required=True)
    ap.add_argument("--mean_vec", default=None)
    ap.add_argument("--format", default="stablehlo",
                    choices=["stablehlo", "onnx"])
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    if args.format == "onnx":
        export_onnx(args.config, args.checkpoint, args.output_model,
                    args.mean_vec, args.overrides)
    else:
        export_stablehlo(args.config, args.checkpoint, args.output_model,
                         args.mean_vec, args.overrides)


if __name__ == "__main__":
    main()
