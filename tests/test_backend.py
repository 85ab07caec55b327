"""Backend tests: scoring/AS-Norm/metrics vs reference math, PLDA EM +
scoring + adaptation parity vs the reference implementation, QMF, kaldi IO,
embedding-processing chain."""

import numpy as np
import pytest

from tests.conftest import reference_available
from wespeaker_tpu.backend import (
    EmbeddingProcessingChain,
    QMFCalibrator,
    TrialScorer,
    TwoCovPLDA,
    build_factors,
    cllr,
    compute_metrics,
    labels_from_strings,
)
from wespeaker_tpu.utils.kaldi_io import (
    read_vec_ark,
    read_vec_scp_dict,
    write_vec_ark_scp,
)


def _synth_embeddings(n_spk=20, per_spk=10, dim=32, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_spk, dim)) * 3.0
    spk2emb, flat = {}, {}
    for s in range(n_spk):
        embs = centers[s] + rng.normal(size=(per_spk, dim)) * spread
        spk2emb[f"spk{s}"] = embs
        for i in range(per_spk):
            flat[f"spk{s}_utt{i}"] = embs[i]
    return spk2emb, flat


def test_kaldi_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    items = [(f"utt{i}", rng.normal(size=16).astype(np.float32))
             for i in range(5)]
    prefix = str(tmp_path / "xvector")
    ark, scp = write_vec_ark_scp(prefix, iter(items))
    got = read_vec_scp_dict(scp)
    for k, v in items:
        np.testing.assert_array_equal(got[k], v)
    got2 = dict(read_vec_ark(ark))
    for k, v in items:
        np.testing.assert_array_equal(got2[k], v)


def test_cosine_scoring_and_metrics():
    _, flat = _synth_embeddings()
    keys = list(flat.keys())
    scorer = TrialScorer(flat)
    rng = np.random.default_rng(1)
    trials, labels = [], []
    for _ in range(500):
        a, b = rng.choice(keys, 2, replace=False)
        trials.append((a, b))
        labels.append("target" if a.split("_")[0] == b.split("_")[0]
                      else "nontarget")
    scores = scorer.score_trials(trials)
    # sanity vs numpy cosine
    a0, b0 = trials[0]
    want = np.dot(flat[a0], flat[b0]) / (
        np.linalg.norm(flat[a0]) * np.linalg.norm(flat[b0]))
    np.testing.assert_allclose(scores[0], want, rtol=1e-5)

    y = labels_from_strings(labels)
    if y.sum() > 3 and (1 - y).sum() > 3:
        e, thr, dcf = compute_metrics(scores, y)
        assert e < 20.0  # well-separated synthetic speakers
        assert 0 <= dcf <= 1.0


def test_asnorm_matches_reference_math():
    _, flat = _synth_embeddings(n_spk=8, per_spk=4)
    keys = list(flat.keys())
    cohort = np.random.default_rng(2).normal(size=(50, 32))
    scorer = TrialScorer(flat)
    trials = [(keys[0], keys[5]), (keys[3], keys[10])]
    raw = scorer.score_trials(trials)
    out = scorer.asnorm(trials, raw, cohort, top_n=10)

    # independent numpy reimplementation of score_norm.py:26-36
    emb = np.stack([flat[k] for k in keys])
    embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cohn = cohort / np.linalg.norm(cohort, axis=1, keepdims=True)
    sc = embn @ cohn.T
    top = np.sort(sc, axis=1)[:, ::-1][:, :10]
    mean, std = top.mean(1), top.std(1)
    for ti, (a, b) in enumerate(trials):
        ia, ib = keys.index(a), keys.index(b)
        want = 0.5 * ((raw[ti] - mean[ia]) / std[ia]
                      + (raw[ti] - mean[ib]) / std[ib])
        np.testing.assert_allclose(out["score"][ti], want, rtol=1e-4)


def test_plda_train_and_separation():
    spk2emb, flat = _synth_embeddings(n_spk=24, per_spk=12, spread=1.0)
    plda = TwoCovPLDA(dim=32, normalize_length=True).train(spk2emb, 5)
    enroll = {s: e[:6] for s, e in spk2emb.items()}
    trials = []
    labels = []
    keys = list(spk2emb.keys())
    test_dict = {}
    for s in keys:
        test_dict[s + "_t"] = spk2emb[s][7]
    for s in keys:
        trials.append((s, s + "_t"))
        labels.append(1)
        other = keys[(keys.index(s) + 1) % len(keys)]
        trials.append((s, other + "_t"))
        labels.append(0)
    scores = plda.score_trials(enroll, test_dict, trials)
    labels = np.asarray(labels)
    assert scores[labels == 1].mean() > scores[labels == 0].mean() + 5


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_plda_parity_with_reference():
    from tests.torch_ref import import_reference_module
    ref_mod = import_reference_module("wespeaker.utils.plda.two_cov_plda")

    spk2emb, _ = _synth_embeddings(n_spk=16, per_spk=8, dim=24)

    # drive the reference estimator through its internals (its ctor only
    # adds file IO around exactly these calls)
    ref = ref_mod.TwoCovPLDA(embed_dim=24)
    for s, emb in spk2emb.items():
        ref.stats.add_samples(1.0, np.asarray(emb, np.float64))
    ref.mu = ref.stats.sum_ / ref.stats.class_weight
    for _ in range(4):
        ref.em_one_iter()
    ref.get_output()

    mine = TwoCovPLDA(dim=24)
    mine.accumulate(spk2emb)
    for _ in range(4):
        mine.em_one_iter()
    mine.get_output()

    np.testing.assert_allclose(mine.psi, ref.psi, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(mine.transform, ref.transform, rtol=1e-5,
                               atol=1e-7)

    # scoring parity
    rng = np.random.default_rng(3)
    e = rng.normal(size=(5, 24))
    t = rng.normal(size=(5, 24))
    et = mine.transform_embeddings(e)
    tt = mine.transform_embeddings(t)
    got = mine.llr_scores(et, tt, np.ones(5))
    for i in range(5):
        want = ref.log_likelihood_ratio(et[i], tt[i], 1)
        np.testing.assert_allclose(got[i], want, rtol=1e-4)

    # adaptation parity
    adapt_data = rng.normal(size=(200, 24)) * 2.0
    mine_ad = mine.adapt(adapt_data, 0.5, 0.5)
    ref_mod.read_vec_scp_file = lambda scp: {
        f"u{i}": adapt_data[i] for i in range(adapt_data.shape[0])}
    ref_ad = ref.adapt("dummy.scp", 0.5, 0.5)
    np.testing.assert_allclose(mine_ad.psi, ref_ad.psi, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(mine_ad.transform, ref_ad.transform,
                               rtol=1e-5, atol=1e-7)


def test_qmf_calibration_reduces_cllr():
    rng = np.random.default_rng(0)
    n = 2000
    y = rng.uniform(size=n) < 0.3
    score = np.where(y, rng.normal(3.0, 1.0, n), rng.normal(-2.0, 1.5, n))
    mag_e = rng.uniform(5, 15, n)
    mag_t = rng.uniform(5, 15, n)
    factors = build_factors(score, enroll_mag=mag_e, test_mag=mag_t)
    assert factors.shape == (n, 5)
    cal = QMFCalibrator().fit(factors, y)
    out = cal(factors)
    assert cllr(out[y], out[~y]) <= cllr(score[y], score[~y]) + 1e-9
    assert np.isfinite(out).all()


def test_embedding_processing_chain():
    spk2emb, flat = _synth_embeddings(n_spk=10, per_spk=6, dim=16)
    allv = np.vstack(list(flat.values()))
    loaders = {
        "mean-subtract": lambda args: allv,
        "lda": lambda args: spk2emb,
        "whitening": lambda args: allv,
    }
    chain = EmbeddingProcessingChain(
        "mean-subtract --scp x | length-norm | "
        "lda --scp x --utt2spk y --dim 8 | length-norm", loaders=loaders)
    out = chain(allv)
    assert out.shape == (allv.shape[0], 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)

    # estimated links see the prefix-transformed data: mean of the
    # mean-subtracted input must be ~0 through the first link only
    ms = chain.links[0]
    np.testing.assert_allclose(ms(allv).mean(0), 0.0, atol=1e-9)


def test_eer_perfect_separation():
    """Degenerate score files (no EER crossing) must not crash
    (all targets above all nontargets -> EER 0)."""
    from wespeaker_tpu.backend.metrics import compute_metrics

    scores = np.asarray([0.9, 0.8, 0.7, 0.2, 0.1], np.float32)
    labels = np.asarray([1, 1, 1, 0, 0])
    eer_pct, _thr, mdcf = compute_metrics(scores, labels)
    assert eer_pct == 0.0
    assert mdcf >= 0.0
