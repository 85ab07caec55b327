"""Convert a reference (wespeaker torch) checkpoint into this framework's
checkpoint format.

The structural torch->flax converter (utils/torch_compat.py) drives the
conversion from the flax variable tree, so released `.pt` checkpoints from
the reference model zoo load bit-faithfully (the same machinery every
golden parity test uses). Frontend-composite checkpoints (WavLM / whisper /
w2v-bert attached under `frontend.`) convert too: keys are split on the
composite's child-module prefixes.

Usage:
  python -m wespeaker_tpu.bin.convert_torch_ckpt \\
      --config conf/ecapa.yaml --torch_ckpt avg_model.pt --output model.ckpt
"""

import argparse
import logging

import jax
import numpy as np

from wespeaker_tpu.train.composite import build_model
from wespeaker_tpu.utils import checkpoint as ckpt
from wespeaker_tpu.utils.config import parse_config_or_kwargs
from wespeaker_tpu.utils.torch_compat import (rules_for,
                                              torch_to_flax_variables)


def load_torch_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return out


def convert(config, torch_ckpt, output, strict=True, overrides=None,
            **kwargs):
    import flax
    import flax.linen as nn

    configs = parse_config_or_kwargs(config, overrides, **kwargs)
    built = build_model(configs)
    variables = nn.meta.unbox(
        built.model.init(jax.random.PRNGKey(0), built.init_example,
                         train=False))
    sd = load_torch_state_dict(torch_ckpt)
    # reference checkpoints may carry the projection head; the eval model
    # tree has no projection, so drop it (utils/checkpoint.py:33-67
    # tolerant-load behavior)
    sd = {k: v for k, v in sd.items() if not k.startswith("projection.")}
    converted = torch_to_flax_variables(sd, variables,
                                        rules=rules_for(configs["model"]),
                                        strict=strict)
    converted = flax.core.unfreeze(converted)
    out = {"params": converted["params"],
           "batch_stats": converted.get("batch_stats", {})}
    ckpt.save_checkpoint(output, out)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(out["params"]))
    logging.info("wrote %s (%.2fM params)", output, n / 1e6)
    return output


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--no_strict", action="store_true",
                    help="ignore missing/extra torch keys")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    convert(args.config, args.torch_ckpt, args.output,
            strict=not args.no_strict, overrides=args.overrides)


if __name__ == "__main__":
    main()
