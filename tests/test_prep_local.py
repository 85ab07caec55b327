"""Recipe-local prep utilities (reference examples/*/local/*.py).

The combine cases golden-test against the reference script itself
(examples/cnceleb/v2/local/choose_utts_to_combine.py), which is stdlib-only
and runnable as a subprocess.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from wespeaker_tpu.bin.prep_local import (combine_audio,
                                          combine_short_utterances,
                                          combine_spans,
                                          filter_by_voice_duration,
                                          format_trials_cnceleb,
                                          group_utterances, main,
                                          make_aug_copies, system_sad_scp,
                                          utt2voice_duration)
from wespeaker_tpu.data.wav_io import read_wav, write_wav

REF_COMBINE = ("/root/reference/examples/cnceleb/v2/local/"
               "choose_utts_to_combine.py")


def test_combine_spans_reference_cases():
    # behavior spec: choose_utts_to_combine.py SelfTest (:214-227)
    assert combine_spans([5.0, 6.0, 7.0], 0.1) == [(0, 1), (1, 2), (2, 3)]
    assert combine_spans([0.1, 6.0, 7.0], 0.5) == [(0, 2), (2, 3)]
    assert combine_spans([6.0, 7.0, 0.1], 0.5) == [(0, 1), (1, 3)]
    # merges toward the shorter neighbor when both satisfy the minimum
    assert combine_spans([6.0, 0.1, 7.0], 0.5) == [(0, 2), (2, 3)]
    assert combine_spans([7.0, 0.1, 6.0], 0.5) == [(0, 2), (2, 3)]
    # merges toward the side that reaches the minimum when only one does
    assert combine_spans([1.0, 0.5, 0.1, 6.0], 1.0) == [(0, 3), (3, 4)]


def test_combine_spans_properties():
    rng = np.random.RandomState(0)
    for _ in range(100):
        durs = (0.01 * rng.randint(1, 11, size=rng.randint(1, 16))).tolist()
        spans = combine_spans(durs, 0.05)
        assert [s for s, _ in spans[1:]] == [e for _, e in spans[:-1]]
        assert spans[0][0] == 0 and spans[-1][1] == len(durs)
        if len(spans) > 1:
            for s, e in spans:
                assert sum(durs[s:e]) >= 0.05 - 1e-5
        # grouping is impervious to sub-tolerance jitter (:243-248)
        jittered = [d + 1e-7 * rng.randint(-5, 6) for d in durs]
        assert combine_spans(jittered, 0.05) == spans


def _write_combine_inputs(d, spk2utt_rows, utt2dur_rows):
    spk2utt = os.path.join(d, "spk2utt")
    utt2dur = os.path.join(d, "utt2dur")
    with open(spk2utt, "w") as f:
        for row in spk2utt_rows:
            print(*row, file=f)
    with open(utt2dur, "w") as f:
        for row in utt2dur_rows:
            print(*row, file=f)
    return spk2utt, utt2dur


def _random_combine_case(rng):
    spk2utt_rows, utt2dur_rows = [], []
    u = 0
    for s in range(rng.randint(1, 5)):
        utts = [f"u{u + i:03d}" for i in range(rng.randint(1, 6))]
        u += len(utts)
        spk2utt_rows.append([f"spk{s}"] + utts)
        for utt in utts:
            utt2dur_rows.append([utt, round(0.3 * rng.randint(1, 9), 2)])
    return spk2utt_rows, utt2dur_rows


@pytest.mark.parametrize("within_only", [False, True])
def test_combine_matches_reference_script(tmp_path, within_only):
    if not os.path.exists(REF_COMBINE):
        pytest.skip("reference checkout not available")
    rng = np.random.RandomState(7 if within_only else 3)
    for case in range(8):
        d = tmp_path / f"case{case}"
        d.mkdir()
        spk2utt, utt2dur = _write_combine_inputs(
            str(d), *_random_combine_case(rng))
        ours = [str(d / n) for n in ("utt2utts", "utt2spk", "utt2dur.out")]
        theirs = [str(d / (n + ".ref")) for n in ("utt2utts", "utt2spk",
                                                  "utt2dur.out")]
        flag = "true" if within_only else "false"
        combine_short_utterances(spk2utt, utt2dur, *ours, min_duration=1.55,
                                 within_speaker_only=within_only)
        subprocess.run(
            [sys.executable, REF_COMBINE, "--min-duration", "1.55",
             "--merge-within-speakers-only", flag, spk2utt, utt2dur] + theirs,
            check=True, capture_output=True)
        for mine, ref in zip(ours, theirs):
            got = open(mine).read().split("\n")
            want = open(ref).read().split("\n")
            if mine.endswith("utt2dur.out"):
                got = [(l.split()[0], float(l.split()[1]))
                       for l in got if l]
                want = [(l.split()[0], float(l.split()[1]))
                        for l in want if l]
                assert [g[0] for g in got] == [w[0] for w in want]
                np.testing.assert_allclose([g[1] for g in got],
                                           [w[1] for w in want], atol=1e-6)
            else:
                assert got == want, f"{mine} differs for case {case}"


def test_majority_speaker_assignment():
    # cross-speaker group goes to the speaker with the most duration
    spk2utt = [("a", ["u1"]), ("b", ["u2"])]
    utt2dur = {"u1": 0.3, "u2": 0.9}
    groups = group_utterances(spk2utt, utt2dur, min_duration=1.0)
    assert groups == [["u1", "u2"]]


def test_combine_audio_concatenates(tmp_path):
    sr = 16000
    src = tmp_path / "src"
    (src / "spkA").mkdir(parents=True)
    w1 = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    w2 = np.sin(2 * np.pi * 220 * np.arange(sr // 2) / sr).astype(np.float32)
    write_wav(str(src / "spkA/u1.wav"), w1, sr)
    write_wav(str(src / "spkA/u2.wav"), w2, sr)
    utt2utts = tmp_path / "utt2utts"
    utt2utts.write_text("spkA/u1-comb2 spkA/u1 spkA/u2\n")
    out = tmp_path / "out"
    n = combine_audio(str(utt2utts), str(src), str(out))
    assert n == 1
    data, got_sr = read_wav(str(out / "spkA/u1-comb2.wav"))
    assert got_sr == sr and len(data) == len(w1) + len(w2)
    np.testing.assert_allclose(data[:len(w1)], w1, atol=1e-3)


def test_format_trials_cnceleb(tmp_path):
    lists = tmp_path / "eval/lists"
    lists.mkdir(parents=True)
    (lists / "enroll.lst").write_text(
        "id001 enroll/id001.wav\nid002 enroll/id002.wav\n")
    (lists / "trials.lst").write_text(
        "id001 test/x.wav 1\nid002 test/y.wav 0\n")
    dst = tmp_path / "trials"
    assert format_trials_cnceleb(str(tmp_path), str(dst)) == 2
    assert dst.read_text() == ("enroll/id001.wav test/x.wav target\n"
                               "enroll/id002.wav test/y.wav nontarget\n")


def test_voice_duration_and_filter(tmp_path):
    vad = tmp_path / "vad"
    # 'seg utt beg end' rows (the sre system-sad shape)
    vad.write_text("u1-0-1 u1 0.0 1.0\nu1-2-9 u1 2.0 9.0\nu2-0-3 u2 0.0 3.0\n")
    u2vd = tmp_path / "utt2voice_dur"
    assert utt2voice_duration(str(vad), str(u2vd)) == 2
    assert dict((l.split()[0], float(l.split()[1]))
                for l in u2vd.read_text().splitlines()) == {
                    "u1": 8.0, "u2": 3.0}
    scp = tmp_path / "wav.scp"
    scp.write_text("u1 /w/u1.wav\nu2 /w/u2.wav\nu3 /w/u3.wav\n")
    out = tmp_path / "filtered.scp"
    assert filter_by_voice_duration(str(scp), str(u2vd), str(out),
                                    dur_thres=5.0) == 1
    assert out.read_text() == "u1 /w/u1.wav\n"


def test_aug_copies(tmp_path):
    ori = tmp_path / "ori"
    ori.mkdir()
    (ori / "wav.scp").write_text("u1 /w/u1.wav\n")
    (ori / "utt2spk").write_text("u1 spkA\n")
    (ori / "vad").write_text("u1-00-01 u1 0.0 1.0\n")
    aug = tmp_path / "aug"
    assert make_aug_copies(str(ori), str(aug), aug_copy_num=2) == 3
    assert (aug / "wav.scp").read_text() == (
        "u1_copy-0 /w/u1.wav\nu1_copy-1 /w/u1.wav\nu1_copy-2 /w/u1.wav\n")
    # speaker label is NOT suffixed (generate_sre_aug.py:38-43)
    assert (aug / "utt2spk").read_text() == (
        "u1_copy-0 spkA\nu1_copy-1 spkA\nu1_copy-2 spkA\n")
    # vad rows suffix both the segment and utterance ids (:45-55)
    assert (aug / "vad").read_text() == (
        "u1-00-01_copy-0 u1_copy-0 0.0 1.0\n"
        "u1-00-01_copy-1 u1_copy-1 0.0 1.0\n"
        "u1-00-01_copy-2 u1_copy-2 0.0 1.0\n")


def test_system_sad_scp_format(tmp_path):
    sr = 16000
    rng = np.random.RandomState(0)
    sig = np.zeros(3 * sr, np.float32)
    sig[sr:2 * sr] = 0.5 * rng.randn(sr).astype(np.float32)
    wav = tmp_path / "u1.wav"
    write_wav(str(wav), sig, sr)
    scp = tmp_path / "wav.scp"
    scp.write_text(f"u1 {wav}\n")
    out = tmp_path / "vad"
    n = system_sad_scp(str(scp), str(out), min_duration=0.25)
    assert n >= 1
    for line in out.read_text().splitlines():
        seg, utt, beg, end = line.split()
        beg, end = float(beg), float(end)
        assert utt == "u1" and end - beg >= 0.25
        assert seg == f"u1-{int(beg * 1000):08d}-{int(end * 1000):08d}"
        # the speech burst sits in the middle second
        assert 0.5 <= beg <= 2.5 and end <= 3.1


def test_cli_entry(tmp_path):
    vad = tmp_path / "vad"
    vad.write_text("u1-0-1 u1 0.0 1.0\n")
    out = tmp_path / "out"
    main(["voice-dur", str(vad), str(out)])
    assert out.read_text() == "u1 1.0\n"
