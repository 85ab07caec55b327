"""RTTM IO: subsegment labels -> merged segments -> RTTM lines, oracle SAD,
and a python DER scorer.

Behavioral spec: wespeaker/diar/make_rttm.py:33-86 (merge same-label
contiguous subsegments, split conflicts at the midpoint) and
wespeaker/diar/make_oracle_sad.py (RTTM -> merged speech segments). The
reference scores DER with SCTK md-eval.pl; here a frame-based DER with
collar and optimal speaker mapping (Hungarian) is provided.
"""

from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

RTTM_LINE = "SPEAKER {} {} {:.3f} {:.3f} <NA> <NA> {} <NA> <NA>"


def read_labels(labels_file, frame_shift=10):
    utt_to_subseg_labels = OrderedDict()
    with open(labels_file) as f:
        for line in f:
            subseg, label = line.split()
            utt, begin_ms, end_ms, begin_frames, end_frames = \
                subseg.rsplit("-", 4)
            begin = (int(begin_ms) + int(begin_frames) * frame_shift) / 1000.0
            end = (int(begin_ms) + int(end_frames) * frame_shift) / 1000.0
            utt_to_subseg_labels.setdefault(utt, []).append(
                (begin, end, label))
    return utt_to_subseg_labels


def merge_segments(utt_to_subseg_labels):
    """Merge contiguous same-label subsegments; midpoint-split conflicts."""
    merged = []
    for utt, segs in utt_to_subseg_labels.items():
        if not segs:
            continue
        begin, end, label = segs[0]
        e = end
        for (b, e, lab) in segs[1:]:
            if b <= end and lab == label:
                end = e
            elif b > end:
                merged.append((utt, begin, end, label))
                begin, end, label = b, e, lab
            else:  # overlap with different label: split at midpoint
                pivot = (b + end) / 2.0
                merged.append((utt, begin, pivot, label))
                begin, end, label = pivot, e, lab
        merged.append((utt, begin, e, label))
    return merged


def write_rttm(merged, fout, channel=1):
    for (utt, begin, end, label) in merged:
        print(RTTM_LINE.format(utt, channel, begin, end - begin, label),
              file=fout)


def read_rttm(path) -> Dict[str, List[Tuple[float, float, str]]]:
    out: Dict[str, List[Tuple[float, float, str]]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "SPEAKER":
                continue
            utt, begin, dur, spk = parts[1], float(parts[3]), \
                float(parts[4]), parts[7]
            out.setdefault(utt, []).append((begin, begin + dur, spk))
    return out


def oracle_sad(rttm_path, min_duration=0.255) -> Dict[str, List[Tuple[float, float]]]:
    """RTTM -> merged speech segments per utterance
    (wespeaker/diar/make_oracle_sad.py:50)."""
    out = {}
    for utt, segs in read_rttm(rttm_path).items():
        ivs = sorted((b, e) for b, e, _ in segs)
        merged = []
        for b, e in ivs:
            if merged and b <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((b, e))
        out[utt] = [(b, e) for b, e in merged if e - b >= min_duration]
    return out


def compute_der(ref: Dict[str, List[Tuple[float, float, str]]],
                hyp: Dict[str, List[Tuple[float, float, str]]],
                collar: float = 0.25, step: float = 0.01) -> float:
    """Frame-based diarization error rate (MISS + FA + speaker confusion)
    with a no-score collar around reference boundaries and optimal speaker
    mapping per recording (Hungarian assignment)."""
    from scipy.optimize import linear_sum_assignment

    total_err, total_ref = 0.0, 0.0
    for utt, ref_segs in ref.items():
        hyp_segs = hyp.get(utt, [])
        t_end = max([e for _, e, _ in ref_segs + hyp_segs] or [0.0])
        n = int(np.ceil(t_end / step)) + 1
        ref_spks = sorted({s for _, _, s in ref_segs})
        hyp_spks = sorted({s for _, _, s in hyp_segs})
        r = np.zeros((len(ref_spks), n), bool)
        h = np.zeros((len(hyp_spks), n), bool)
        for b, e, s in ref_segs:
            r[ref_spks.index(s), int(b / step):int(e / step)] = True
        for b, e, s in hyp_segs:
            h[hyp_spks.index(s), int(b / step):int(e / step)] = True
        score = np.ones(n, bool)
        for b, e, _ in ref_segs:
            for t in (b, e):
                lo = max(0, int((t - collar) / step))
                hi = min(n, int((t + collar) / step))
                score[lo:hi] = False

        rs = r[:, score]
        hs = h[:, score]
        # optimal speaker mapping maximizing overlap
        if len(ref_spks) and len(hyp_spks):
            overlap = rs.astype(np.float64) @ hs.T.astype(np.float64)
            ri, hi_ = linear_sum_assignment(-overlap)
            mapped = np.zeros_like(rs)
            for a, b2 in zip(ri, hi_):
                mapped[a] = hs[b2]
            ncorrect = (rs & mapped).sum(axis=0)
        else:
            ncorrect = np.zeros(rs.shape[1], np.int64)
        nref_t = rs.sum(axis=0)
        nhyp_t = hs.sum(axis=0)
        # per-frame error = max(Nref, Nhyp) - Ncorrect (miss+fa+confusion)
        total_err += float(np.sum(np.maximum(nref_t, nhyp_t) - ncorrect))
        total_ref += float(nref_t.sum())
    return float(total_err / max(total_ref, 1))
