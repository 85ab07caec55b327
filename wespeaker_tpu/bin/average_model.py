"""Average the last-N epoch checkpoints (wespeaker/bin/average_model.py:48-76)."""

import argparse

from wespeaker_tpu.utils.checkpoint import (average_checkpoints,
                                            find_epoch_checkpoints,
                                            save_checkpoint)


def average_model(src_dir, dst_model, num: int = 5):
    paths = find_epoch_checkpoints(src_dir)[-num:]
    assert paths, f"no checkpoints in {src_dir}"
    avg = average_checkpoints(paths)
    save_checkpoint(dst_model, avg)
    print(f"averaged {len(paths)} checkpoints -> {dst_model}")
    return dst_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_path", required=True)
    ap.add_argument("--dst_model", required=True)
    ap.add_argument("--num", type=int, default=5)
    args = ap.parse_args()
    average_model(args.src_path, args.dst_model, args.num)


if __name__ == "__main__":
    main()
