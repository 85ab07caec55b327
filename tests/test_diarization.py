"""Diarization subsystem tests: subsegmentation, clustering, RTTM merge,
DER, and the full pipeline on synthetic two-speaker audio."""

import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from wespeaker_tpu.diar import rttm as R
from wespeaker_tpu.diar.pipeline import diarize_wav, energy_vad
from wespeaker_tpu.diar.spectral_clusterer import cluster as spectral_cluster
from wespeaker_tpu.diar.subsegment import segment_id, subsegment
from wespeaker_tpu.diar.umap_clusterer import PAHC, cluster as umap_cluster


def test_subsegment_windows():
    fbank = np.random.default_rng(0).normal(size=(300, 40)).astype(np.float32)
    sid = segment_id("utt1", 0.0, 3.02)
    subsegs, banks = subsegment(fbank, sid, window_fs=150, period_fs=75)
    assert banks.shape[1:] == (150, 40)
    assert all(s.startswith("utt1-") for s in subsegs)
    # short segment: single repeat-padded window
    sid2 = segment_id("utt1", 0.0, 1.0)
    subsegs2, banks2 = subsegment(fbank[:98], sid2, 150, 75)
    assert len(subsegs2) == 1 and banks2.shape == (1, 150, 40)
    np.testing.assert_array_equal(banks2[0][:98], fbank[:98])
    np.testing.assert_array_equal(banks2[0][98:], fbank[:52])


def _blob_embeddings(n_per=40, dim=32, k=3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 5
    embs, labels = [], []
    for i, c in enumerate(centers):
        embs.append(c + rng.normal(size=(n_per, dim)))
        labels += [i] * n_per
    return np.concatenate(embs), np.asarray(labels)


def _cluster_accuracy(pred, want):
    from scipy.optimize import linear_sum_assignment
    pred, want = np.asarray(pred), np.asarray(want)
    k = max(pred.max(), want.max()) + 1
    conf = np.zeros((k, k))
    for p, w in zip(pred, want):
        conf[p, w] += 1
    ri, ci = linear_sum_assignment(-conf)
    return conf[ri, ci].sum() / len(pred)


def test_spectral_clustering_recovers_speakers():
    embs, want = _blob_embeddings()
    labels = spectral_cluster(embs)
    assert _cluster_accuracy(labels, want) > 0.95


def test_pahc_attaches_noise_and_absorbs_minors():
    """Reference semantics: labeled-labeled merges are forbidden (cost -inf,
    umap_clusterer.py:137-139); PAHC attaches noise points to clusters and
    absorbs minor (<3) clusters into the closest major one."""
    embs, want = _blob_embeddings(n_per=30, k=2, seed=1)
    fake = np.where(np.arange(60) < 30, 0, 1)
    noise_idx = [3, 17, 40, 55]
    for i in noise_idx:
        fake[i] = -1
    labels = PAHC(merge_cutoff=0.3).fit_predict(list(fake), embs)
    # noise points must end up in the cluster of their true speaker
    assert _cluster_accuracy(labels, want) == 1.0
    assert len(set(labels)) == 2


def test_umap_cluster_native_recovers_speakers():
    """Native UMAP -> HDBSCAN -> PAHC recovers the speaker structure
    without the third-party umap-learn/hdbscan packages."""
    embs, want = _blob_embeddings()
    labels = umap_cluster(embs)
    assert len(labels) == len(embs)
    assert _cluster_accuracy(labels, want) > 0.95


def test_silero_post_processing_segments():
    """get_speech_timestamps hysteresis: trigger/release thresholds, min
    speech/silence durations, boundary padding (silero semantics driven by
    a synthetic probability track)."""
    from wespeaker_tpu.diar.vad import get_speech_timestamps
    sr, w = 16000, 512
    probs = np.zeros(300, np.float32)
    probs[20:80] = 0.9     # ~1.9 s speech
    probs[82:84] = 0.2     # 2-window dip below neg_threshold: too short
    probs[84:120] = 0.9    # same segment continues
    probs[200:205] = 0.9   # ~0.16 s blip < min_speech: dropped
    stamps = get_speech_timestamps(probs, w, 300 * w, sr, threshold=0.5)
    assert len(stamps) == 1
    b, e = stamps[0]
    assert abs(b - (20 * w - 0.03 * sr)) <= w  # padded start
    assert 119 * w <= e <= 121 * w + 0.03 * sr

    # a sustained gap >= min_silence splits segments
    probs2 = np.zeros(300, np.float32)
    probs2[10:60] = 0.9
    probs2[70:130] = 0.9   # 10-window gap = 0.32 s > min_silence 0.1 s
    stamps2 = get_speech_timestamps(probs2, w, 300 * w, sr, threshold=0.5)
    assert len(stamps2) == 2


def test_system_sad_energy_fallback_and_min_duration():
    from wespeaker_tpu.diar.vad import system_sad
    sr = 16000
    rng = np.random.default_rng(0)
    wav = np.zeros(sr * 6, np.float32)
    wav[sr:3 * sr] = 0.5 * np.sin(2 * np.pi * 300 * np.arange(2 * sr) / sr)
    wav += 1e-4 * rng.standard_normal(len(wav))
    segs = system_sad(wav, sr)
    assert len(segs) == 1
    b, e = segs[0]
    assert abs(b - 1.0) < 0.1 and abs(e - 3.0) < 0.1
    # min_duration filters the segment out entirely
    assert system_sad(wav, sr, min_duration=5.0) == []


def test_torch_jit_vad_adapter(tmp_path):
    """A scripted stand-in with the silero interface (forward(chunk, sr),
    reset_states) drives the same post-processing end to end."""
    torch = pytest.importorskip("torch")

    class EnergyVad(torch.nn.Module):
        def reset_states(self):
            pass

        def forward(self, chunk, sr: int):
            rms = torch.sqrt(torch.mean(chunk * chunk) + 1e-12)
            return torch.sigmoid((20.0 * torch.log10(rms) + 20.0)).reshape(1)

    path = str(tmp_path / "vad.jit")
    torch.jit.script(EnergyVad()).save(path)

    from wespeaker_tpu.diar.vad import system_sad
    sr = 16000
    wav = np.zeros(sr * 4, np.float32)
    wav[sr:2 * sr] = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    segs = system_sad(wav, sr, model_path=path, threshold=0.5)
    assert len(segs) == 1
    b, e = segs[0]
    assert abs(b - 1.0) < 0.1 and abs(e - 2.0) < 0.1


def test_merge_segments_and_der():
    labels = {
        "u": [(0.0, 1.5, "0"), (0.75, 2.25, "0"), (2.5, 4.0, "1")],
    }
    merged = R.merge_segments(labels)
    assert merged == [("u", 0.0, 2.25, "0"), ("u", 2.5, 4.0, "1")]

    buf = io.StringIO()
    R.write_rttm(merged, buf)
    buf.seek(0)
    text = buf.read()
    assert "SPEAKER u 1 0.000 2.250" in text

    ref = {"u": [(0.0, 2.0, "A"), (2.5, 4.0, "B")]}
    hyp = {"u": [(0.0, 2.0, "x"), (2.5, 4.0, "y")]}
    assert R.compute_der(ref, hyp) < 1e-6
    hyp_bad = {"u": [(0.0, 4.0, "x")]}
    assert R.compute_der(ref, hyp_bad, collar=0.0) > 0.1


def test_full_diarization_pipeline():
    """Two synthetic 'speakers' alternating; DER must be small."""
    sr = 16000
    rng = np.random.default_rng(0)
    seg_sec = 4.0
    t = np.arange(int(sr * seg_sec)) / sr

    def make_spk(freqs):
        # amplitude-modulated so that per-segment CMN doesn't flatten the
        # (stationary) spectral signature into pure noise
        sig = sum(np.sin(2 * np.pi * f * t) for f in freqs)
        sig = sig * (0.55 + 0.45 * np.sin(2 * np.pi * 3.0 * t))
        return (0.3 * sig / np.max(np.abs(sig))
                + rng.normal(0, 0.005, len(t))).astype(np.float32)

    segs = []
    ref = {"utt": []}
    wav_parts = []
    cur = 0.0
    # 8 alternating segments -> ~40 subsegments, enough for the reference's
    # top-10-neighbor affinity pruning to form a sensible graph
    for i in range(8):
        spk = i % 2
        wav_parts.append(make_spk([300, 500] if spk == 0 else [900, 1400]))
        ref["utt"].append((cur, cur + seg_sec, f"spk{spk}"))
        segs.append((cur, cur + seg_sec))
        cur += seg_sec
    wav = np.concatenate(wav_parts)

    # mock embedder: per-bin temporal std survives CMN and peaks at each
    # "speaker's" tone bins
    def embed_fn(banks):
        return banks.std(axis=1)

    merged, sublabels = diarize_wav(
        "utt", wav, sr, embed_fn, sad_segments=segs,
        fbank_cfg=__import__("wespeaker_tpu.frontend",
                             fromlist=["FbankConfig"]).FbankConfig(
            num_mel_bins=40),
        clusterer="spectral", num_spks=2)
    assert merged
    hyp = {"utt": [(b, e, lab) for (u, b, e, lab) in merged]}
    der = R.compute_der(ref, hyp)
    assert der < 0.15, der


def test_energy_vad():
    sr = 16000
    silence = np.zeros(sr, np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(
        np.float32)
    wav = np.concatenate([silence, tone, silence, tone])
    segs = energy_vad(wav, sr)
    assert len(segs) == 2
    assert abs(segs[0][0] - 1.0) < 0.1 and abs(segs[0][1] - 2.0) < 0.1


@pytest.mark.slow
def test_diarize_cli(tmp_path):
    """End-to-end offline diarization CLI with a tiny trained-free model."""
    import yaml
    from wespeaker_tpu.bin.diarize import diarize
    from wespeaker_tpu.data.wav_io import write_wav
    from wespeaker_tpu.models import get_speaker_model
    from wespeaker_tpu.utils.checkpoint import save_checkpoint

    configs = {"model": "ECAPA_TDNN",
               "model_args": {"feat_dim": 40, "embed_dim": 32,
                              "channels": 32}}
    model = get_speaker_model("ECAPA_TDNN")(**configs["model_args"])
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 40), np.float32))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(str(ckpt), {"params": variables["params"],
                                "batch_stats": variables["batch_stats"]})
    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(configs, f)

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr * 4) / sr
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)
           * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + rng.normal(0, 0.01, len(t))).astype(np.float32)
    wav_path = tmp_path / "rec.wav"
    write_wav(wav_path, sig, sr)
    scp = tmp_path / "wav.scp"
    scp.write_text(f"rec {wav_path}\n")

    sad = tmp_path / "sad.rttm"
    sad.write_text("SPEAKER rec 1 0.100 3.800 <NA> <NA> spkA <NA> <NA>\n")
    out, der = diarize(str(cfg_path), str(ckpt), str(scp),
                       str(tmp_path / "out.rttm"), sad_rttm=str(sad),
                       num_spks=1, ref_rttm=str(sad))
    text = (tmp_path / "out.rttm").read_text()
    assert text.startswith("SPEAKER rec")
    assert der is not None and der < 0.2
