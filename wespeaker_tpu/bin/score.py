"""Cosine trial scoring CLI (wespeaker/bin/score.py:38-95): optional
train-set mean subtraction, batched device cosine, `.score` files with
`enroll test score [label]` lines."""

import argparse
import os

import numpy as np

from wespeaker_tpu.backend.scoring import TrialScorer, compute_mean_vec, read_trials
from wespeaker_tpu.utils.kaldi_io import read_vec_scp, read_vec_scp_dict


def score(exp_dir, eval_scp_path, cal_mean_dir=None, trials=(),
          store_dir=None):
    mean_vec = None
    if cal_mean_dir:
        scp = os.path.join(cal_mean_dir, "xvector.scp")
        mean_vec = compute_mean_vec(read_vec_scp(scp))
        np.save(os.path.join(cal_mean_dir, "mean_vec.npy"), mean_vec)
    emb = read_vec_scp_dict(eval_scp_path)
    scorer = TrialScorer(emb, mean_vec)
    store_dir = store_dir or os.path.join(exp_dir, "scores")
    os.makedirs(store_dir, exist_ok=True)
    outputs = []
    for trial in trials:
        pairs, labels = read_trials(trial)
        scores = scorer.score_trials(pairs)
        out = os.path.join(store_dir, os.path.basename(trial) + ".score")
        with open(out, "w") as f:
            for (a, b), s, lab in zip(pairs, scores, labels):
                line = f"{a} {b} {s:.5f}"
                f.write(line + (f" {lab}\n" if lab else "\n"))
        outputs.append(out)
    return outputs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp_dir", required=True)
    ap.add_argument("--eval_scp_path", required=True)
    ap.add_argument("--cal_mean_dir", default=None)
    ap.add_argument("trials", nargs="+")
    args = ap.parse_args()
    score(args.exp_dir, args.eval_scp_path, args.cal_mean_dir, args.trials)


if __name__ == "__main__":
    main()
