"""Two-covariance PLDA (Kaldi-compatible parametrization).

Behavioral spec: wespeaker/utils/plda/two_cov_plda.py (PldaStats:38,
em_one_iter:112, get_output:142, log_likelihood_ratio:165, eval_sv:186,
adapt:258) and plda_utils.py (kaldi-style length norm x sqrt(dim),
Cholesky-whitening normalizing transform).

Design: EM runs on host in float64 (matrices are only D x D; TPU f64 is
emulated — SURVEY.md §7 hard part 7), while *scoring* is batched jnp: the
per-trial LLR is a closed-form diagonal Gaussian ratio, evaluated for the
whole trial list at once on device.
"""

import math
import struct
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

M_LOG_2PI = 1.8378770664093454835606594728112


def norm_embeddings(emb, kaldi_style=True):
    """Unit-length (optionally x sqrt(dim)) normalization
    (plda_utils.py:46-59)."""
    scale = math.sqrt(emb.shape[-1]) if kaldi_style else 1.0
    return scale * emb / np.linalg.norm(emb, axis=-1, keepdims=True)


def _cholesky_whitener(covar):
    try:
        c = np.linalg.cholesky(covar)
    except np.linalg.LinAlgError:
        c = np.linalg.cholesky(covar + np.eye(covar.shape[0]) * 1e-6)
    return np.linalg.inv(c)


class PldaStats:
    """Per-speaker sufficient statistics (two_cov_plda.py:38-63)."""

    def __init__(self, dim):
        self.dim = dim
        self.num_classes = 0
        self.class_weight = 0.0
        self.example_weight = 0.0
        self.sum_ = np.zeros(dim)
        self.offset_scatter = np.zeros((dim, dim))
        self.weights = []
        self.counts = []
        self.means = []

    def add_samples(self, weight, spk_embeddings):
        emb = np.asarray(spk_embeddings, np.float64)
        n = emb.shape[0]
        mean = emb.mean(axis=0)
        centered = emb - mean
        self.offset_scatter += weight * centered.T @ centered
        self.weights.append(weight)
        self.counts.append(n)
        self.means.append(mean)
        self.num_classes += 1
        self.class_weight += weight
        self.example_weight += weight * n
        self.sum_ += weight * mean


class TwoCovPLDA:
    def __init__(self, dim: int = 256, normalize_length: bool = False,
                 subtract_train_set_mean: bool = False):
        self.dim = dim
        self.normalize_length = normalize_length
        self.subtract_train_set_mean = subtract_train_set_mean
        self.mu = np.zeros(dim)
        self.transform = np.eye(dim)
        self.psi = np.zeros(dim)
        self.offset = np.zeros(dim)
        self.B = np.eye(dim)
        self.W = np.eye(dim)
        self.stats: Optional[PldaStats] = None

    # ---------------- estimation ----------------

    def accumulate(self, spk2embeddings: Dict[str, np.ndarray]):
        """spk2embeddings: speaker -> (n_i, D) array."""
        stats = PldaStats(self.dim)
        if self.subtract_train_set_mean:
            allv = np.concatenate([np.asarray(v).reshape(-1, self.dim)
                                   for v in spk2embeddings.values()])
            train_mean = allv.mean(0)
        else:
            train_mean = np.zeros(self.dim)
        for spk, emb in spk2embeddings.items():
            emb = np.asarray(emb, np.float64).reshape(-1, self.dim) - train_mean
            if self.normalize_length:
                emb = norm_embeddings(emb)
            stats.add_samples(1.0, emb)
        self.stats = stats
        self.mu = stats.sum_ / stats.class_weight
        return self

    def em_one_iter(self):
        """One EM step over the per-class stats; the inner per-speaker solve
        is vectorized by grouping classes with equal example count n (the
        (B^-1 + n W^-1)^-1 term only depends on n)."""
        st = self.stats
        W_stats = st.offset_scatter.copy()
        W_count = st.example_weight - st.class_weight
        B_stats = np.zeros((st.dim, st.dim))
        B_count = 0.0
        B_inv = np.linalg.inv(self.B)
        W_inv = np.linalg.inv(self.W)
        gmean = st.sum_ / st.class_weight

        weights = np.asarray(st.weights)
        counts = np.asarray(st.counts)
        means = np.stack(st.means) - gmean  # (S, D)
        for n in np.unique(counts):
            sel = counts == n
            m = means[sel]  # (Sn, D)
            w8 = weights[sel][:, None]
            mix_var = np.linalg.inv(B_inv + n * W_inv)  # (D, D)
            w = (m @ (n * W_inv).T) @ mix_var.T  # (Sn, D)
            m_w = m - w
            sw = float(np.sum(weights[sel]))
            B_stats += sw * mix_var + (w * w8).T @ w
            B_count += sw
            W_stats += n * (sw * mix_var + (m_w * w8).T @ m_w)
            W_count += sw
        self.W = 0.5 * (W_stats / W_count + (W_stats / W_count).T)
        self.B = 0.5 * (B_stats / B_count + (B_stats / B_count).T)

    def get_output(self):
        """Diagonalize: whiten W (Cholesky), eigh the projected B
        (two_cov_plda.py:142-154)."""
        st = self.stats
        self.mu = st.sum_ / st.class_weight
        t1 = _cholesky_whitener(self.W)
        b_proj = t1 @ self.B @ t1.T
        s, u = np.linalg.eigh(b_proj)
        s = np.maximum(s, 0.0)
        order = np.argsort(-s)
        s, u = s[order], u[:, order]
        self.transform = u.T @ t1
        self.psi = s
        self.offset = -self.transform @ self.mu

    def train(self, spk2embeddings, num_em_iters: int = 5):
        self.accumulate(spk2embeddings)
        for _ in range(num_em_iters):
            self.em_one_iter()
        self.get_output()
        return self

    # ---------------- scoring ----------------

    def transform_embeddings(self, emb: np.ndarray) -> np.ndarray:
        """(N, D) -> (N, D) into the diagonalized space, with kaldi
        sqrt(dim)/||x|| renorm when normalize_length is on."""
        emb = np.asarray(emb, np.float64).reshape(-1, self.dim)
        out = emb @ self.transform.T + self.offset
        if self.normalize_length:
            out = out * (math.sqrt(self.dim)
                         / np.linalg.norm(out, axis=1, keepdims=True))
        return out

    def llr_scores(self, enroll: np.ndarray, test: np.ndarray,
                   enroll_counts: np.ndarray) -> np.ndarray:
        """Batched log-likelihood ratios for aligned (T, D) arrays of
        *transformed* enroll/test embeddings."""
        psi = jnp.asarray(self.psi, jnp.float32)
        e = jnp.asarray(enroll, jnp.float32)
        t = jnp.asarray(test, jnp.float32)
        n = jnp.asarray(enroll_counts, jnp.float32)[:, None]
        mean = n * psi / (n * psi + 1.0) * e
        var_given = 1.0 + psi / (n * psi + 1.0)
        ll_given = -0.5 * (jnp.sum(jnp.log(var_given), axis=1)
                           + M_LOG_2PI * self.dim
                           + jnp.sum((t - mean) ** 2 / var_given, axis=1))
        var_without = psi + 1.0
        ll_without = -0.5 * (jnp.sum(jnp.log(var_without))
                             + M_LOG_2PI * self.dim
                             + jnp.sum(t ** 2 / var_without, axis=1))
        return np.asarray(ll_given - ll_without)

    def score_trials(self, enroll_dict, test_dict, trials,
                     multisession_avg=True, mean_vec=None):
        """enroll_dict: spk -> (n, D); test_dict: utt -> (D,);
        trials: [(enroll, test)] -> scores (T,). Mirrors eval_sv:186-256."""
        mean_vec = np.zeros(self.dim) if mean_vec is None else mean_vec
        enroll_t, counts = {}, {}
        for key, value in enroll_dict.items():
            value = np.asarray(value, np.float64).reshape(-1, self.dim)
            counts[key] = 1 if multisession_avg else value.shape[0]
            value = value - mean_vec
            pooled = value.mean(0)
            if self.normalize_length:
                pooled = norm_embeddings(pooled[None])[0]
            enroll_t[key] = self.transform_embeddings(pooled)[0]
        test_t = {}
        for key, value in test_dict.items():
            v = np.asarray(value, np.float64) - mean_vec
            if self.normalize_length:
                v = norm_embeddings(v[None])[0]
            test_t[key] = self.transform_embeddings(v)[0]
        e = np.stack([enroll_t[a] for a, b in trials])
        t = np.stack([test_t[b] for a, b in trials])
        n = np.asarray([counts[a] for a, b in trials])
        return self.llr_scores(e, t, n)

    # ---------------- adaptation ----------------

    def adapt(self, adapt_embeddings: np.ndarray, ac_scale=0.5,
              wc_scale=0.5) -> "TwoCovPLDA":
        """Unsupervised domain adaptation (BUT method,
        two_cov_plda.py:258-309): excess variance of the adaptation data over
        the model total covariance is split between across/within class."""
        import scipy.linalg as spl
        data = np.asarray(adapt_embeddings, np.float64)
        mean_vec = data.mean(0)
        data = data - mean_vec
        if self.normalize_length:
            data = norm_embeddings(data)
        W = np.linalg.inv(self.transform.T @ self.transform)
        W = (W + W.T) / 2
        B = np.linalg.inv((self.transform.T / self.psi) @ self.transform)
        B = (B + B.T) / 2
        T = B + W
        data_cov = np.cov(data.T)
        v, e = spl.eigh(data_cov, (T + T.T) / 2)
        iet = np.linalg.inv(e.T)
        excess = iet[:, v > 1] @ np.diag(np.sqrt(v[v > 1] - 1))
        B_adp = B + (excess * math.sqrt(ac_scale)) @ (
            excess * math.sqrt(ac_scale)).T
        W_adp = W + (excess * math.sqrt(wc_scale)) @ (
            excess * math.sqrt(wc_scale)).T
        A = (B_adp + B_adp.T) / 2
        Bm = (W_adp + W_adp.T) / 2
        d, vv = np.linalg.eigh(Bm)
        t1 = np.diag(1.0 / np.sqrt(d + 1e-9)) @ vv.T
        a1 = t1 @ A @ t1.T
        d2, t2 = np.linalg.eigh(a1)
        tr = t2.T @ t1
        out = TwoCovPLDA(self.dim, self.normalize_length,
                         self.subtract_train_set_mean)
        # faithful to the reference: mu is the mean of the *centered* (and
        # possibly length-normed) adaptation data (two_cov_plda.py:283)
        out.mu = data.mean(0)
        out.transform = tr
        out.psi = np.diag(tr @ A @ tr.T).copy()
        out.offset = -out.transform @ out.mu
        return out

    # ---------------- persistence ----------------

    def save(self, path: str):
        import h5py
        with h5py.File(path, "w") as f:
            for name in ("mu", "transform", "psi", "offset"):
                f.create_dataset(name, data=getattr(self, name))
            f.create_dataset("normalize_length",
                             data=int(self.normalize_length))
            f.create_dataset("subtract_train_set_mean",
                             data=int(self.subtract_train_set_mean))

    @classmethod
    def load(cls, path: str) -> "TwoCovPLDA":
        import h5py
        with h5py.File(path, "r") as f:
            mu = f["mu"][()]
            obj = cls(dim=mu.shape[0],
                      normalize_length=bool(f["normalize_length"][()]),
                      subtract_train_set_mean=bool(
                          f["subtract_train_set_mean"][()]))
            obj.mu = mu
            obj.transform = f["transform"][()]
            obj.psi = f["psi"][()]
            obj.offset = f["offset"][()]
        return obj

    @classmethod
    def load_kaldi(cls, path: str) -> "TwoCovPLDA":
        """Parse a Kaldi binary `<Plda>` model: mean vec, transform mat,
        psi vec (format per kaldi plda.cc write/read)."""
        mu, transform, psi = read_kaldi_plda(path)
        obj = cls(dim=mu.shape[0])
        obj.mu, obj.transform, obj.psi = mu, transform, psi
        obj.offset = -obj.transform @ obj.mu
        return obj


def _read_kaldi_vec(f):
    kind = f.read(3)
    dtype = {b"FV ": ("<f4", 4), b"DV ": ("<f8", 8)}[kind]
    assert f.read(1) == b"\x04"
    dim = struct.unpack("<i", f.read(4))[0]
    return np.frombuffer(f.read(dim * dtype[1]), dtype=dtype[0]).astype(
        np.float64)


def _read_kaldi_mat(f):
    kind = f.read(3)
    dtype = {b"FM ": ("<f4", 4), b"DM ": ("<f8", 8)}[kind]
    assert f.read(1) == b"\x04"
    rows = struct.unpack("<i", f.read(4))[0]
    assert f.read(1) == b"\x04"
    cols = struct.unpack("<i", f.read(4))[0]
    return np.frombuffer(f.read(rows * cols * dtype[1]),
                         dtype=dtype[0]).reshape(rows, cols).astype(np.float64)


def read_kaldi_plda(path: str):
    with open(path, "rb") as f:
        assert f.read(2) == b"\x00B", "only binary kaldi plda supported"
        assert f.read(7) == b"<Plda> "
        mu = _read_kaldi_vec(f)
        transform = _read_kaldi_mat(f)
        psi = _read_kaldi_vec(f)
    return mu, transform, psi
