"""Kaldi-style data-dir utilities (reference tools/*.sh, tools/*.pl)."""

import os
import subprocess
import sys

import pytest

from wespeaker_tpu.bin.data_dir import (combine_data_dirs, copy_data_dir,
                                        filter_rows, fix_data_dir,
                                        read_table, spk2utt_to_utt2spk,
                                        subset_data_dir, utt2spk_to_spk2utt,
                                        write_table)


def _write_dir(d, utts, extra_tables=()):
    """utts: list of (utt, spk)."""
    os.makedirs(d, exist_ok=True)
    write_table(os.path.join(d, "wav.scp"),
                [[u, f"/wav/{u}.wav"] for u, _ in utts])
    write_table(os.path.join(d, "utt2spk"), [[u, s] for u, s in utts])
    for t, rows in extra_tables:
        write_table(os.path.join(d, t), rows)
    return d


def test_spk2utt_round_trip():
    u2s = [["u3", "b"], ["u1", "a"], ["u2", "a"]]
    s2u = utt2spk_to_spk2utt(u2s)
    assert s2u == [["a", "u1", "u2"], ["b", "u3"]]
    assert spk2utt_to_utt2spk(s2u) == sorted(u2s)


def test_filter_rows_field_and_exclude():
    rows = [["seg1", "uA", "0", "1"], ["seg2", "uB", "1", "2"],
            ["seg3", "uA", "2", "3"]]
    # -f 2 filtering, the sre recipe's vad use (prepare_data.sh:52)
    assert filter_rows(["uA"], rows, field=2) == [rows[0], rows[2]]
    assert filter_rows(["uA"], rows, field=2, exclude=True) == [rows[1]]
    assert filter_rows(["seg2"], rows) == [rows[1]]


def test_fix_data_dir_intersects_sorts_dedups(tmp_path):
    d = str(tmp_path / "data")
    _write_dir(d, [("u2", "a"), ("u1", "a"), ("u3", "b"), ("u2", "a")],
               extra_tables=[("utt2dur", [["u1", "1.0"], ["u2", "2.0"]])])
    n = fix_data_dir(d)
    assert n == 2  # u3 has no dur, dup u2 dropped
    assert read_table(os.path.join(d, "wav.scp")) == [
        ["u1", "/wav/u1.wav"], ["u2", "/wav/u2.wav"]]
    assert read_table(os.path.join(d, "spk2utt")) == [["a", "u1", "u2"]]


def test_subset_by_utt_list_spk_list_first(tmp_path):
    src = _write_dir(str(tmp_path / "src"),
                     [("u1", "a"), ("u2", "a"), ("u3", "b"), ("u4", "c")])
    lst = str(tmp_path / "utts")
    write_table(lst, [["u2"], ["u4"]])
    assert subset_data_dir(src, str(tmp_path / "d1"), utt_list=lst) == 2
    assert [r[0] for r in
            read_table(str(tmp_path / "d1" / "utt2spk"))] == ["u2", "u4"]

    spks = str(tmp_path / "spks")
    write_table(spks, [["a"]])
    assert subset_data_dir(src, str(tmp_path / "d2"), spk_list=spks) == 2
    assert subset_data_dir(src, str(tmp_path / "d3"), first=3) == 3
    assert subset_data_dir(src, str(tmp_path / "d4"), last=1) == 1
    with pytest.raises(ValueError):
        subset_data_dir(src, str(tmp_path / "d5"))


def test_combine_and_duplicate_detection(tmp_path):
    a = _write_dir(str(tmp_path / "a"), [("u1", "s1")])
    b = _write_dir(str(tmp_path / "b"), [("u2", "s2")])
    dest = str(tmp_path / "ab")
    assert combine_data_dirs(dest, [a, b]) == 2
    assert read_table(os.path.join(dest, "spk2utt")) == [
        ["s1", "u1"], ["s2", "u2"]]
    with pytest.raises(ValueError, match="duplicate"):
        combine_data_dirs(str(tmp_path / "aa"), [a, a])


def test_copy_with_prefixes(tmp_path):
    src = _write_dir(str(tmp_path / "src"), [("u1", "s1")])
    dest = str(tmp_path / "dst")
    copy_data_dir(src, dest, utt_prefix="gsm-", spk_prefix="gsm-")
    assert read_table(os.path.join(dest, "utt2spk")) == [["gsm-u1",
                                                          "gsm-s1"]]
    assert read_table(os.path.join(dest, "wav.scp")) == [["gsm-u1",
                                                          "/wav/u1.wav"]]
    assert read_table(os.path.join(dest, "spk2utt")) == [["gsm-s1",
                                                          "gsm-u1"]]


def test_cli_surface(tmp_path):
    d = _write_dir(str(tmp_path / "d"), [("u1", "a"), ("u2", "b")])
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "wespeaker_tpu.bin.data_dir", "spk2utt",
         os.path.join(d, "utt2spk")],
        capture_output=True, text=True, env=env, check=True)
    assert out.stdout.splitlines() == ["a u1", "b u2"]
    subprocess.run(
        [sys.executable, "-m", "wespeaker_tpu.bin.data_dir", "fix", d],
        capture_output=True, text=True, env=env, check=True)
    assert os.path.isfile(os.path.join(d, "spk2utt"))
