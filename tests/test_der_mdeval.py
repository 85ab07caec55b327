"""Golden tests pinning diar/rttm.py::compute_der to md-eval.pl arithmetic.

The reference publishes DERs from `md-eval.pl -c 0.25 -r ref -s hyp`
(examples/voxconverse/v2/run.sh:170-173): exact interval arithmetic, a
no-score collar of +-0.25 s around every reference boundary, overlapping
speech fully scored, optimal per-file speaker mapping, and a single
time-weighted DER across files. Each case below is hand-computed with that
arithmetic (worked in the comments), exercising collar edges, overlap,
mapping optimality, and multi-file accumulation.
"""

import pytest

from wespeaker_tpu.diar.rttm import compute_der


def test_perfect_match_is_zero():
    ref = {"u": [(0.0, 10.0, "A")]}
    hyp = {"u": [(0.0, 10.0, "A")]}
    assert compute_der(ref, hyp) == 0.0


def test_total_miss_is_one():
    # scored ref time [0.25, 9.75] = 9.5 s, all missed -> DER 1.0
    ref = {"u": [(0.0, 10.0, "A")]}
    assert compute_der(ref, {"u": []}) == pytest.approx(1.0)


def test_false_alarm_outside_speech():
    # hyp Y [20, 25] lies outside every collar zone: FA 5.0.
    # scored ref = 9.5 -> DER = 5.0 / 9.5
    ref = {"u": [(0.0, 10.0, "A")]}
    hyp = {"u": [(0.0, 10.0, "X"), (20.0, 25.0, "Y")]}
    assert compute_der(ref, hyp) == pytest.approx(5.0 / 9.5)


def test_false_alarm_absorbed_by_collar():
    # hyp extends 0.2 s past each ref edge -- inside the +-0.25 collar,
    # so nothing is scored as error
    ref = {"u": [(1.0, 9.0, "A")]}
    hyp = {"u": [(0.8, 9.2, "X")]}
    assert compute_der(ref, hyp) == 0.0


def test_false_alarm_beyond_collar():
    # hyp starts 0.5 s early: [0.5, 0.75] is scored FA (0.25 s);
    # scored ref = [1.25, 8.75] = 7.5 -> DER = 0.25 / 7.5
    ref = {"u": [(1.0, 9.0, "A")]}
    hyp = {"u": [(0.5, 9.0, "X")]}
    assert compute_der(ref, hyp) == pytest.approx(0.25 / 7.5)


def test_speaker_confusion_with_collar():
    # ref A [0,10], B [10,20]; hyp X [0,12], Y [12,20].
    # collars at 0, 10, 20. Mapping: X->A (9.5 scored overlap),
    # Y->B (7.75). Error: [10.25, 12] ref=B hyp=X -> confusion 1.75.
    # scored ref = 9.5 + 9.5 = 19 -> DER = 1.75 / 19
    ref = {"u": [(0.0, 10.0, "A"), (10.0, 20.0, "B")]}
    hyp = {"u": [(0.0, 12.0, "X"), (12.0, 20.0, "Y")]}
    assert compute_der(ref, hyp) == pytest.approx(1.75 / 19.0)


def test_overlapping_speech_is_scored():
    # ref A [0,10] and B [5,10] overlap; hyp one speaker X [0,10].
    # collars at 0, 5, 10 (B's boundaries too). Scored:
    #  [0.25, 4.75]: Nref=1 Nhyp=1 correct -> 0 error, ref time 4.5
    #  [5.25, 9.75]: Nref=2 Nhyp=1 -> max(2,1)-1 = 1 missed, 4.5 s,
    #                ref time 9.0
    # DER = 4.5 / 13.5
    ref = {"u": [(0.0, 10.0, "A"), (5.0, 10.0, "B")]}
    hyp = {"u": [(0.0, 10.0, "X")]}
    assert compute_der(ref, hyp) == pytest.approx(4.5 / 13.5)


def test_optimal_mapping_prefers_larger_overlap():
    # ref A [0,10]; hyp X [0,4], Y [4,10]. A<->Y overlap (5.75) beats
    # A<->X (3.75), so X's scored span [0.25, 4) is confusion.
    # DER = 3.75 / 9.5
    ref = {"u": [(0.0, 10.0, "A")]}
    hyp = {"u": [(0.0, 4.0, "X"), (4.0, 10.0, "Y")]}
    assert compute_der(ref, hyp) == pytest.approx(3.75 / 9.5)


def test_mapping_is_one_to_one():
    # two ref speakers, one hyp speaker covering both: the single hyp
    # speaker maps to A only; B's scored time is all confusion/miss.
    # ref A [0,10] B [20,30]; hyp X [0,30].
    # collars at 0,10,20,30. Scored: [0.25,9.75] correct (A=X);
    # [10.25,19.75] FA 9.5 (no ref); [20.25,29.75] ref B vs X->A:
    # confusion 9.5. DER = (9.5 + 9.5) / 19
    ref = {"u": [(0.0, 10.0, "A"), (20.0, 30.0, "B")]}
    hyp = {"u": [(0.0, 30.0, "X")]}
    assert compute_der(ref, hyp) == pytest.approx(19.0 / 19.0)


def test_multi_file_time_weighted_accumulation():
    # md-eval pools error and ref time across files, not per-file DERs:
    # u1: ref 9.5, err 0; u2: ref 4.5, err 4.5 (total miss).
    # DER = 4.5 / 14 (a DER-mean would give 0.5)
    ref = {"u1": [(0.0, 10.0, "A")], "u2": [(0.0, 5.0, "B")]}
    hyp = {"u1": [(0.0, 10.0, "X")], "u2": []}
    assert compute_der(ref, hyp) == pytest.approx(4.5 / 14.0)


def test_exact_arithmetic_no_frame_quantization():
    # boundaries off the 10 ms grid must score exactly: hyp ends 1.337 s
    # early; scored miss = [8.663 - ...]... ref [0,10] collar at 10 ->
    # scored miss is [8.663, 9.75] = 1.087 exactly.
    ref = {"u": [(0.0, 10.0, "A")]}
    hyp = {"u": [(0.0, 8.663, "X")]}
    assert compute_der(ref, hyp) == pytest.approx(1.087 / 9.5, abs=1e-12)


def test_adjacent_same_speaker_segments_gap_inside_collar():
    # split-utterance edge: ref A written as two abutting turns
    # [0,5],[5,10] -- the collar around the internal boundary (4.75-5.25)
    # is no-score, so a continuous hyp scores DER 0 and the denominator
    # drops the 0.5 s inside the internal collar.
    ref = {"u": [(0.0, 5.0, "A"), (5.0, 10.0, "A")]}
    hyp = {"u": [(0.0, 10.0, "X")]}
    assert compute_der(ref, hyp) == 0.0
    # and a miss of the second turn scores only its scored span
    hyp2 = {"u": [(0.0, 5.0, "X")]}
    # scored: [0.25,4.75] correct; [5.25,9.75] miss 4.5; ref = 9.0
    assert compute_der(ref, hyp2) == pytest.approx(4.5 / 9.0)


def test_empty_reference_all_false_alarm():
    # md-eval reports DER as error/ref-time; with zero scored ref time the
    # ratio is degenerate -- we only require a large positive value, not
    # a crash
    ref = {"u": []}
    hyp = {"u": [(0.0, 5.0, "X")]}
    assert compute_der(ref, hyp) > 1.0
