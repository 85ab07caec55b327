"""PLDA CLIs: train / eval / adapt (wespeaker/bin/{train,eval,adapt}_plda.py)."""

import argparse

import numpy as np

from wespeaker_tpu.backend.metrics import compute_metrics, labels_from_strings
from wespeaker_tpu.backend.plda import TwoCovPLDA
from wespeaker_tpu.backend.scoring import read_trials
from wespeaker_tpu.utils.kaldi_io import read_vec_scp, read_vec_scp_dict


def _spk2emb(scp, utt2spk_path):
    utt2spk = {}
    with open(utt2spk_path) as f:
        for line in f:
            u, s = line.split()
            utt2spk[u] = s
    out = {}
    for utt, vec in read_vec_scp(scp):
        if utt in utt2spk:
            out.setdefault(utt2spk[utt], []).append(vec)
    return {k: np.vstack(v) for k, v in out.items()}


def train_plda(scp_path, utt2spk, model_path, embed_dim, num_iters=5,
               normalize_length=True, subtract_train_set_mean=False):
    spk2emb = _spk2emb(scp_path, utt2spk)
    plda = TwoCovPLDA(dim=embed_dim, normalize_length=normalize_length,
                      subtract_train_set_mean=subtract_train_set_mean)
    plda.train(spk2emb, num_iters)
    plda.save(model_path)
    return model_path


def eval_plda(enroll_scp, enroll_utt2spk, test_scp, trials_path, score_file,
              model_path, from_kaldi=False, indomain_scp=None):
    plda = (TwoCovPLDA.load_kaldi(model_path) if from_kaldi
            else TwoCovPLDA.load(model_path))
    enroll = _spk2emb(enroll_scp, enroll_utt2spk)
    test = read_vec_scp_dict(test_scp)
    mean_vec = None
    if indomain_scp:
        vals = list(read_vec_scp_dict(indomain_scp).values())
        mean_vec = np.vstack(vals).mean(0)
    pairs, labels = read_trials(trials_path)
    scores = plda.score_trials(enroll, test, pairs, mean_vec=mean_vec)
    with open(score_file, "w") as f:
        for (a, b), s, lab in zip(pairs, scores, labels):
            f.write(f"{a} {b} {s:.5f} {lab}\n")
    if all(labels):
        y = labels_from_strings(labels)
        e, thr, dcf = compute_metrics(np.asarray(scores), y)
        print(f"PLDA EER = {e:.3f}% minDCF = {dcf:.3f}")
    return score_file


def adapt_plda(model_path, adapt_scp, out_model, ac_scale=0.5, wc_scale=0.5):
    plda = TwoCovPLDA.load(model_path)
    data = np.vstack(list(read_vec_scp_dict(adapt_scp).values()))
    adapted = plda.adapt(data, ac_scale, wc_scale)
    adapted.save(out_model)
    return out_model


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("train")
    t.add_argument("--scp_path", required=True)
    t.add_argument("--utt2spk", required=True)
    t.add_argument("--model_path", required=True)
    t.add_argument("--embed_dim", type=int, required=True)
    t.add_argument("--num_iters", type=int, default=5)
    e = sub.add_parser("eval")
    e.add_argument("--enroll_scp_path", required=True)
    e.add_argument("--enroll_utt2spk", required=True)
    e.add_argument("--test_scp_path", required=True)
    e.add_argument("--trials", required=True)
    e.add_argument("--score_path", required=True)
    e.add_argument("--model_path", required=True)
    e.add_argument("--from_kaldi", action="store_true")
    e.add_argument("--indomain_scp", default=None)
    a = sub.add_parser("adapt")
    a.add_argument("--model_path", required=True)
    a.add_argument("--adapt_scp_path", required=True)
    a.add_argument("--out_model", required=True)
    a.add_argument("--ac_scale", type=float, default=0.5)
    a.add_argument("--wc_scale", type=float, default=0.5)
    args = ap.parse_args()
    if args.cmd == "train":
        train_plda(args.scp_path, args.utt2spk, args.model_path,
                   args.embed_dim, args.num_iters)
    elif args.cmd == "eval":
        eval_plda(args.enroll_scp_path, args.enroll_utt2spk,
                  args.test_scp_path, args.trials, args.score_path,
                  args.model_path, args.from_kaldi, args.indomain_scp)
    else:
        adapt_plda(args.model_path, args.adapt_scp_path, args.out_model,
                   args.ac_scale, args.wc_scale)


if __name__ == "__main__":
    main()
