"""RepVGG train->deploy checkpoint conversion CLI
(wespeaker/models/convert_repvgg.py equivalent)."""

import argparse

from wespeaker_tpu.models.repvgg import convert_repvgg_variables
from wespeaker_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def convert(config, checkpoint_path, save_path, block="RepVGG"):
    variables = load_checkpoint(checkpoint_path)
    deploy = convert_repvgg_variables(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}, block=block)
    save_checkpoint(save_path, dict(deploy))
    print(f"fused deploy checkpoint -> {save_path}")
    return save_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--block", default="RepVGG",
                    choices=["RepVGG", "RepSPK"])
    args = ap.parse_args()
    convert(args.config, args.checkpoint, args.save_path, args.block)


if __name__ == "__main__":
    main()
