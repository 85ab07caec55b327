"""EER/minDCF CLI (wespeaker/bin/compute_metrics.py:26-59)."""

import argparse

import numpy as np

from wespeaker_tpu.backend.metrics import compute_metrics, labels_from_strings


def metrics_for_file(score_file, p_target=0.01, c_miss=1, c_fa=1):
    scores, labels = [], []
    with open(score_file) as f:
        for line in f:
            seg = line.split()
            scores.append(float(seg[2]))
            labels.append(seg[3])
    scores = np.asarray(scores)
    y = labels_from_strings(labels)
    e, thr, dcf = compute_metrics(scores, y, p_target, c_miss, c_fa)
    print(f"---- {score_file} -----")
    print(f"EER = {e:.3f} %")
    print(f"threshold = {thr:.5f}")
    print(f"minDCF (p_target:{p_target} c_miss:{c_miss} c_fa:{c_fa}) = "
          f"{dcf:.3f}")
    return e, thr, dcf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p_target", type=float, default=0.01)
    ap.add_argument("--c_miss", type=float, default=1)
    ap.add_argument("--c_fa", type=float, default=1)
    ap.add_argument("scores", nargs="+")
    args = ap.parse_args()
    for f in args.scores:
        metrics_for_file(f, args.p_target, args.c_miss, args.c_fa)


if __name__ == "__main__":
    main()
