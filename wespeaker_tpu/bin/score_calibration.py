"""QMF calibration CLI (wespeaker/bin/score_calibration.py): build quality
factors from AS-Norm output (+optional durations), train the Cllr-linear
model, apply it."""

import argparse

import numpy as np

from wespeaker_tpu.backend.calibration import QMFCalibrator, build_factors


def _read_norm_file(path, wav2dur=None, max_dur=20.0):
    rows = []
    with open(path) as f:
        for line in f:
            seg = line.split()
            rows.append(seg)
    scores = np.asarray([float(r[2]) for r in rows])
    labels = [r[3] for r in rows]
    e_mag = np.asarray([float(r[4]) for r in rows])
    t_mag = np.asarray([float(r[5]) for r in rows])
    e_cm = np.asarray([float(r[6]) for r in rows])
    t_cm = np.asarray([float(r[7]) for r in rows])
    kw = dict(enroll_mag=e_mag, test_mag=t_mag, enroll_cohort_mean=e_cm,
              test_cohort_mean=t_cm, max_dur=max_dur)
    if wav2dur:
        kw["enroll_dur"] = np.asarray([wav2dur[r[0]] for r in rows])
        kw["test_dur"] = np.asarray([wav2dur[r[1]] for r in rows])
    factors = build_factors(scores, **kw)
    return rows, factors, labels


def read_wav2dur(path):
    out = {}
    with open(path) as f:
        for line in f:
            k, d = line.split()
            out[k] = float(d)
    return out


def train_qmf(score_norm_file, save_model_path, wav_dur_scp=None,
              max_dur=20.0):
    wav2dur = read_wav2dur(wav_dur_scp) if wav_dur_scp else None
    rows, factors, labels = _read_norm_file(score_norm_file, wav2dur, max_dur)
    y = np.asarray([l in ("target", "tgt") for l in labels])
    cal = QMFCalibrator().fit(factors, y)
    cal.save(save_model_path)
    return save_model_path


def infer_qmf(score_norm_file, model_path, out_score_file, wav_dur_scp=None,
              max_dur=20.0):
    wav2dur = read_wav2dur(wav_dur_scp) if wav_dur_scp else None
    rows, factors, labels = _read_norm_file(score_norm_file, wav2dur, max_dur)
    cal = QMFCalibrator.load(model_path)
    out = cal(factors)
    with open(out_score_file, "w") as f:
        for r, s in zip(rows, out):
            f.write(f"{r[0]} {r[1]} {s:.5f} {r[3]}\n")
    return out_score_file


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("train")
    t.add_argument("--score_norm_file", required=True)
    t.add_argument("--save_model_path", required=True)
    t.add_argument("--wav_dur_scp", default=None)
    i = sub.add_parser("infer")
    i.add_argument("--score_norm_file", required=True)
    i.add_argument("--model_path", required=True)
    i.add_argument("--out_score_file", required=True)
    i.add_argument("--wav_dur_scp", default=None)
    args = ap.parse_args()
    if args.cmd == "train":
        train_qmf(args.score_norm_file, args.save_model_path,
                  args.wav_dur_scp)
    else:
        infer_qmf(args.score_norm_file, args.model_path, args.out_score_file,
                  args.wav_dur_scp)


if __name__ == "__main__":
    main()
