"""Golden pins for the silero-VAD port (diar/vad.py).

The silero_vad package is not installable in this environment, so — as
with the md-eval DER goldens (tests/test_der_mdeval.py) — the expected
segments are HAND-TRACED through the reference segmenter's published
algorithm (silero-vad utils_vad.get_speech_timestamps: trigger at
threshold, release below threshold-0.15 sustained min_silence, drop
< min_speech, split > max_speech at the last >98 ms silence, pad /
meet-in-the-middle). Each case pins one edge of that state machine on a
synthetic probability trace; window = 512 samples @ 16 kHz (silero's
native hop), so probabilities map to sample positions exactly.

Defaults used: threshold .5, neg_threshold .35, min_speech 4000 samples,
min_silence 1600, pad 480.
"""

import numpy as np
import pytest

from wespeaker_tpu.diar.vad import (TorchJitVad, energy_probs,
                                    get_speech_timestamps, system_sad)

W = 512
SR = 16000


def seg(probs, num_windows=None, **kw):
    p = np.asarray(probs, np.float32)
    n = (num_windows or len(p)) * W
    return get_speech_timestamps(p, W, n, SR, **kw)


def trace(*spans):
    """[(count, prob), ...] -> prob array."""
    return np.concatenate([np.full(c, v, np.float32) for c, v in spans])


def test_basic_segment_with_release_and_pad():
    # trigger at window 10; release: silence from window 110 sustains
    # min_silence (1600 = 3.125 windows) at window 114 -> end 56320
    p = trace((10, 0.1), (100, 0.9), (100, 0.1))
    assert seg(p) == [(5120 - 480, 56320 + 480)]


def test_below_min_speech_dropped():
    # 5 high windows = 2560 samples < min_speech 4000
    p = trace((5, 0.1), (5, 0.9), (50, 0.1))
    assert seg(p) == []


def test_hysteresis_dip_above_neg_threshold_holds():
    # 0.4 is below threshold but above neg_threshold (0.35): no release
    p = trace((50, 0.9), (10, 0.4), (50, 0.9), (50, 0.1))
    assert seg(p) == [(0, (110 * W) + 480)]


def test_short_dip_below_neg_threshold_merges():
    # 2 low windows (1024) < min_silence (1600): segment continues
    p = trace((50, 0.9), (2, 0.1), (50, 0.9), (50, 0.1))
    assert seg(p) == [(0, (102 * W) + 480)]


def test_tail_while_triggered_runs_to_end():
    p = trace((10, 0.1), (40, 0.9))
    n = 50 * W
    assert seg(p) == [(5120 - 480, n)]  # end pad clamped to num_samples


def test_max_speech_split_at_last_sustained_silence():
    # a 0.224 s dip (7 windows) sets prev_end (> 98 ms) without releasing
    # (min_silence 0.5 s); when accumulated speech exceeds max_speech
    # (3 s) the segment splits there and restarts at next_start
    p = trace((40, 0.9), (7, 0.2), (73, 0.9), (20, 0.1))
    got = seg(p, min_silence_s=0.5, max_speech_s=3.0)
    # raw splits: (0, 20480) and (24064, 61440); gap 3584 >= 2*pad so
    # plain +-480 padding applies
    assert got == [(0, 20480 + 480), (24064 - 480, 61440 + 480)]


def test_max_speech_hard_cut_without_silence():
    # no qualifying silence before the cap: hard cut at max_speech, the
    # next high window restarts a segment; 512-sample gap < 2*pad ->
    # boundaries meet in the middle
    p = trace((100, 0.9), (40, 0.1))
    got = seg(p, max_speech_s=2.0)
    assert got == [(0, 30720 + 256), (30720 + 256, 51200 + 480)]


def test_energy_fallback_system_sad_roundtrip():
    rng = np.random.default_rng(0)
    wav = np.zeros(SR * 4, np.float32)
    wav[SR:SR * 3] = 0.5 * rng.standard_normal(SR * 2).astype(np.float32)
    spans = system_sad(wav, SR)
    assert len(spans) == 1
    b, e = spans[0]
    assert abs(b - 1.0) < 0.1 and abs(e - 3.0) < 0.1


def test_torch_jit_vad_adapter_matches_energy_gate():
    """TorchJitVad drives any silero-style scripted module: per-512-window
    call signature model(chunk[1, 512], sr) -> prob."""
    torch = pytest.importorskip("torch")

    class FakeSilero(torch.nn.Module):
        def forward(self, x, sr: int):
            return (x.abs().mean() > 0.1).float().reshape(1)

    import tempfile
    m = torch.jit.script(FakeSilero())
    with tempfile.NamedTemporaryFile(suffix=".jit") as f:
        m.save(f.name)
        vad = TorchJitVad(f.name)
        wav = np.zeros(W * 10, np.float32)
        wav[:W * 4] = 0.7
        probs = vad.speech_probs(wav, SR)
    assert probs.shape == (10,)
    assert probs[:4].min() == 1.0 and probs[4:].max() == 0.0
    # trailing partial window is zero-padded and still scored
    wav2 = np.full(W * 2 + 100, 0.7, np.float32)
    with tempfile.NamedTemporaryFile(suffix=".jit") as f:
        m.save(f.name)
        probs2 = TorchJitVad(f.name).speech_probs(wav2, SR)
    assert probs2.shape == (3,)


def test_torch_jit_vad_adapter_stateful_silero_signature():
    """Silero's real contract is STATEFUL: forward(chunk[1,512], sr) -> prob
    carries recurrent (LSTM) state across windows and exposes
    reset_states() to clear it between recordings (the reference scores
    per-window exactly this way, make_system_sad.py:44). Round-3's
    stand-in was a stateless energy gate, so a broken reset, wrong window
    ordering, or per-window re-instantiation in TorchJitVad would have
    passed. This fake smooths window energy through a persistent tensor
    attribute (h <- 0.5 h + 0.5 gate), so every prob depends on the whole
    history; expected probs are computed independently in numpy and the
    segments pinned through system_sad."""
    torch = pytest.importorskip("torch")

    class StatefulFakeSilero(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.h = torch.zeros(1)

        @torch.jit.export
        def reset_states(self):
            self.h = torch.zeros(1)

        def forward(self, x, sr: int):
            gate = (x.abs().mean() > 0.1).float().reshape(1)
            self.h = 0.5 * self.h + 0.5 * gate
            return self.h

    import tempfile
    m = torch.jit.script(StatefulFakeSilero())
    n_win = 20
    speech = range(4, 12)  # windows 4..11 active
    wav = np.zeros(W * n_win, np.float32)
    for i in speech:
        wav[i * W:(i + 1) * W] = 0.7

    # independent numpy trace of the same recurrence
    expected = np.zeros(n_win, np.float32)
    h = 0.0
    for i in range(n_win):
        h = 0.5 * h + 0.5 * (1.0 if i in speech else 0.0)
        expected[i] = h

    with tempfile.NamedTemporaryFile(suffix=".jit") as f:
        m.save(f.name)
        vad = TorchJitVad(f.name)
        probs = vad.speech_probs(wav, SR)
        # state must be reset between recordings: a second pass over the
        # same wav through the SAME adapter instance is identical
        probs_again = vad.speech_probs(wav, SR)
        spans = system_sad(wav, SR, model_path=f.name)

    assert np.allclose(probs, expected, atol=1e-6), (probs, expected)
    assert np.array_equal(probs, probs_again)
    # segments from the torch.jit path == segments from the numpy trace
    # (pins the adapter end-to-end without re-tracing the state machine)
    spans_np = system_sad(wav, SR, prob_fn=lambda w, s: expected)
    assert spans == spans_np and len(spans) == 1
    # onset at the first >=0.5 prob (window 4: h=0.5 triggers), release
    # after the smoothed tail decays below neg_threshold=0.35 (window 13)
    b, e = spans[0]
    assert abs(b - 4 * W / SR) < 0.05, spans
    assert 12 * W / SR < e < n_win * W / SR, spans


def test_energy_probs_shapes_and_range():
    wav = np.zeros(W * 3 + 17, np.float32)
    p = energy_probs(wav, SR)
    assert p.shape == (4,)
    assert np.all((p >= 0) & (p <= 1))
