"""AS-Norm / S-Norm CLI (wespeaker/bin/score_norm.py:54-116): z-normalize
trial scores against top-N cohort statistics; emit magnitudes + cohort means
for QMF."""

import argparse

import numpy as np

from wespeaker_tpu.backend.scoring import (asnorm_scores, cohort_mean_std)
from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict


def score_norm(score_norm_method, top_n, trial_score_file, score_norm_file,
               cohort_emb_scp, eval_emb_scp, mean_vec_path=None):
    mean_vec = np.load(mean_vec_path) if mean_vec_path else 0.0

    lines = []
    with open(trial_score_file) as f:
        for line in f:
            seg = line.split()
            lines.append(seg)
    enroll_list = sorted({seg[0] for seg in lines})
    test_list = sorted({seg[1] for seg in lines})

    eval_emb = read_vec_scp_dict(eval_emb_scp)
    cohort_emb_d = read_vec_scp_dict(cohort_emb_scp)
    enroll = np.stack([eval_emb[k] - mean_vec for k in enroll_list])
    test = np.stack([eval_emb[k] - mean_vec for k in test_list])
    cohort = np.stack([v - mean_vec for v in cohort_emb_d.values()])

    if score_norm_method == "snorm":
        top_n = cohort.shape[0]
    e_mean, e_std = cohort_mean_std(enroll, cohort, top_n)
    t_mean, t_std = cohort_mean_std(test, cohort, top_n)
    e_idx = {k: i for i, k in enumerate(enroll_list)}
    t_idx = {k: i for i, k in enumerate(test_list)}

    ei = np.asarray([e_idx[seg[0]] for seg in lines])
    ti = np.asarray([t_idx[seg[1]] for seg in lines])
    raw = np.asarray([float(seg[2]) for seg in lines])
    normed = np.asarray(asnorm_scores(raw, e_mean, e_std, t_mean, t_std,
                                      ei, ti))
    e_mag = np.linalg.norm(enroll, axis=1)
    t_mag = np.linalg.norm(test, axis=1)
    e_mean_np, t_mean_np = np.asarray(e_mean), np.asarray(t_mean)

    with open(score_norm_file, "w") as fout:
        for i, seg in enumerate(lines):
            label = seg[3] if len(seg) > 3 else ""
            fout.write(
                f"{seg[0]} {seg[1]} {normed[i]:.5f} {label} "
                f"{e_mag[ei[i]]:.4f} {t_mag[ti[i]]:.4f} "
                f"{e_mean_np[ei[i]]:.4f} {t_mean_np[ti[i]]:.4f}\n")
    return score_norm_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score_norm_method", default="asnorm",
                    choices=["asnorm", "snorm"])
    ap.add_argument("--top_n", type=int, default=300)
    ap.add_argument("--trial_score_file", required=True)
    ap.add_argument("--score_norm_file", required=True)
    ap.add_argument("--cohort_emb_scp", required=True)
    ap.add_argument("--eval_emb_scp", required=True)
    ap.add_argument("--mean_vec_path", default=None)
    args = ap.parse_args()
    score_norm(args.score_norm_method, args.top_n, args.trial_score_file,
               args.score_norm_file, args.cohort_emb_scp, args.eval_emb_scp,
               args.mean_vec_path)


if __name__ == "__main__":
    main()
