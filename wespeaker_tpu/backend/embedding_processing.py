"""Composable embedding post-processing chain.

Behavioral spec: wespeaker/utils/embedding_processing.py
(chain_string_to_dict:23, Lda:70, Length_norm:181, MeanSubtraction:204,
EmbeddingProcessingChain:219). A pipe-string like

    "mean-subtract --scp m.scp | length-norm | lda --scp l.scp
     --utt2spk u2s --dim 100 | length-norm"

builds a chain where each estimated link (mean / LDA) sees the training data
transformed through the *prefix* of the chain, exactly like the reference.
Data sources are supplied as in-memory dicts or kaldi scp paths.
"""

import pickle
import re
from typing import Dict, List, Optional

import numpy as np
import scipy.linalg as spl

from wespeaker_tpu.utils.kaldi_io import read_vec_scp


def chain_string_to_dict(chain_string: Optional[str]):
    links = chain_string.split("|") if chain_string else []
    out = []
    for link in links:
        parts = link.split("--")
        method = parts.pop(0).strip()
        args = {}
        for p in parts:
            p = re.sub("=", " ", p)
            p = re.sub(" +", " ", p).strip()
            k, v = p.split(" ")
            args[k] = v
        out.append([method, args])
    return out


def _load_vectors(args, loader=None):
    if loader is not None:
        return loader(args)
    return np.vstack([v for _, v in read_vec_scp(args["scp"])])


def _load_spk2emb(args, loader=None):
    if loader is not None:
        return loader(args)
    utt2spk = {}
    with open(args["utt2spk"]) as f:
        for line in f:
            u, s = line.split()
            utt2spk[u] = s
    spk2emb: Dict[str, List[np.ndarray]] = {}
    for utt, vec in read_vec_scp(args["scp"]):
        if utt in utt2spk:
            spk2emb.setdefault(utt2spk[utt], []).append(vec)
    return {k: np.vstack(v) for k, v in spk2emb.items()}


class LengthNorm:
    def __init__(self, args=None, current_chain=None, **_):
        pass

    def __call__(self, embd):
        return embd / np.sqrt((embd ** 2).sum(axis=1, keepdims=True))


class MeanSubtraction:
    def __init__(self, args, current_chain=None, vec_loader=None, **_):
        data = _load_vectors(args, vec_loader)
        if current_chain is not None:
            data = current_chain(data)
        self.mean = np.mean(data, axis=0)

    def __call__(self, embd):
        return embd - self.mean


class Lda:
    """Whitened-within-class LDA with Kaldi-style eigenvalue flooring
    (embedding_processing.py:70-178)."""

    def __init__(self, args, current_chain=None, spk_loader=None,
                 equal_speaker_weight=False, **_):
        dim = int(args["dim"])
        eps = float(args.get("eps", 1e-6))
        spk2emb = _load_spk2emb(args, spk_loader)

        counts, means, covs = [], [], []
        for s, emb in spk2emb.items():
            if current_chain is not None:
                emb = current_chain(emb)
            if emb.shape[0] > 1:
                counts.append(emb.shape[0])
                means.append(emb.mean(axis=0))
                covs.append(np.cov(emb, rowvar=False, bias=True))
        counts = np.asarray(counts)
        means = np.vstack(means)
        covs = np.asarray(covs)
        if equal_speaker_weight:
            self.m = means.mean(axis=0)
            bc = np.cov(means, rowvar=False, bias=True)
            wc = covs.sum(axis=0) / len(spk2emb)
        else:
            self.m = (counts[:, None] * means).sum(axis=0) / counts.sum()
            bc = np.cov(means, rowvar=False, bias=True, fweights=counts)
            wc = (counts[:, None, None] * covs).sum(axis=0) / counts.sum()

        e, m = spl.eigh(wc)
        e = np.maximum(e, np.max(e) * eps)
        t1 = np.diag(1.0 / np.sqrt(e)) @ m.T
        bc_w = t1 @ bc @ t1.T
        d, lda = spl.eigh(bc_w)
        self.lda = t1.T @ lda[:, -dim:]

    def __call__(self, embd):
        return (embd - self.m) @ self.lda


class Whitening:
    """ZCA whitening on a held-out set (the reference declares this link but
    leaves it unimplemented; we implement it)."""

    def __init__(self, args, current_chain=None, vec_loader=None, **_):
        data = _load_vectors(args, vec_loader)
        if current_chain is not None:
            data = current_chain(data)
        self.mean = data.mean(axis=0)
        cov = np.cov(data - self.mean, rowvar=False)
        e, v = np.linalg.eigh(cov)
        e = np.maximum(e, 1e-8)
        self.w = v @ np.diag(1.0 / np.sqrt(e)) @ v.T

    def __call__(self, embd):
        return (embd - self.mean) @ self.w


STRING2CLASS = {
    "lda": Lda,
    "length-norm": LengthNorm,
    "whitening": Whitening,
    "mean-subtract": MeanSubtraction,
}


class EmbeddingProcessingChain:
    def __init__(self, chain: Optional[str] = None, loaders=None):
        """loaders: optional dict method-name -> data loader callable, for
        supplying in-memory data instead of scp files (tests, library use)."""
        self.links = []
        loaders = loaders or {}
        for method, args in chain_string_to_dict(chain):
            kw = {}
            if method in ("mean-subtract", "whitening"):
                kw["vec_loader"] = loaders.get(method)
            if method == "lda":
                kw["spk_loader"] = loaders.get(method)
            self.links.append(STRING2CLASS[method](args, self, **kw))

    def __call__(self, embd):
        for link in self.links:
            embd = link(embd)
        return embd

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.links, f)

    def load(self, path):
        with open(path, "rb") as f:
            self.links = pickle.load(f)
        return self

    def update_link(self, index: int, new_link: str, loaders=None):
        """Replace one estimated link (domain adaptation —
        wespeaker/bin/update_embd_proc.py)."""
        parsed = chain_string_to_dict(new_link)
        assert len(parsed) == 1
        method, args = parsed[0]
        loaders = loaders or {}
        prefix = EmbeddingProcessingChain()
        prefix.links = self.links[:index]
        kw = {}
        if method in ("mean-subtract", "whitening"):
            kw["vec_loader"] = loaders.get(method)
        if method == "lda":
            kw["spk_loader"] = loaders.get(method)
        self.links[index] = STRING2CLASS[method](args, prefix, **kw)
