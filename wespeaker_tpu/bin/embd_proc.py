"""Embedding-processing chain CLIs
(wespeaker/bin/{prep,apply,update}_embd_proc.py equivalents)."""

import argparse

import numpy as np

from wespeaker_tpu.backend.embedding_processing import EmbeddingProcessingChain
from wespeaker_tpu.utils.kaldi_io import read_vec_scp, write_vec_ark_scp


def prep(chain_string, out_pickle):
    chain = EmbeddingProcessingChain(chain_string)
    chain.save(out_pickle)
    return out_pickle


def apply(pickle_path, in_scp, out_prefix):
    chain = EmbeddingProcessingChain()
    chain.load(pickle_path)

    def items():
        for key, vec in read_vec_scp(in_scp):
            yield key, chain(vec[None])[0].astype(np.float32)

    return write_vec_ark_scp(out_prefix, items())


def update(pickle_path, link_no, new_link, out_pickle):
    chain = EmbeddingProcessingChain()
    chain.load(pickle_path)
    chain.update_link(int(link_no), new_link)
    chain.save(out_pickle)
    return out_pickle


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("prep")
    p.add_argument("--chain", required=True)
    p.add_argument("--out", required=True)
    a = sub.add_parser("apply")
    a.add_argument("--proc", required=True)
    a.add_argument("--in_scp", required=True)
    a.add_argument("--out_prefix", required=True)
    u = sub.add_parser("update")
    u.add_argument("--proc", required=True)
    u.add_argument("--link_no", required=True)
    u.add_argument("--new_link", required=True)
    u.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.cmd == "prep":
        prep(args.chain, args.out)
    elif args.cmd == "apply":
        apply(args.proc, args.in_scp, args.out_prefix)
    else:
        update(args.proc, args.link_no, args.new_link, args.out)


if __name__ == "__main__":
    main()
