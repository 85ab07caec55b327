"""Precompute frontend features with the host torch stack -> kaldi feats.

The reference's S3prlFrontend accepts ANY s3prl upstream name and runs it
inside the training loop (wespeaker/frontend/s3prl.py:23-93). The TPU-first
port ships native flax WavLM/HuBERT/wav2vec2/w2v-bert/Whisper frontends
(frontend/ssl_frontends.py supported matrix); every OTHER upstream is
served by this tool: run the torch model once on the host CPU, write
kaldi 'FM' feats, and train with `data_type: feat` — turning the
documented workaround into a supported workflow instead of a doc note.

Backends:
  torchjit  --model_path model.pt         torch.jit.load; module is called
            as module(wav[1, N]) and must return (T, F), (1, T, F) or a
            tuple/list whose selected entry is one of those.
  hf        --model_path /local/dir       transformers AutoModel (local
            checkpoint dir; this environment has no network egress), wav
            -> last_hidden_state or hidden_states[--layer].
  s3prl     --model_path upstream_name    the real s3prl hub when the
            package is installed (absent here; gated with a clear error).

--layer N picks hidden_states[N] (hf/s3prl); 'last' (default) uses the
final layer; 'avg' averages all layers (a static mix); 'all' concatenates
every hidden layer on the feature axis, (T, L*D) — train with
`dataset_args.frontend: feat_stack` + `feat_stack_args.num_layers: L` and
the StackedFeatFrontend learns the layer mix jointly with the speaker
model, matching the reference's trainable in-loop s3prl weighting
(frontend/s3prl.py:50-66) for ANY upstream.

Usage:
  python -m wespeaker_tpu.bin.precompute_feats --data_list raw.list \
      --backend torchjit --model_path frontend.pt --out_prefix exp/feats
Then point the config at the emitted list:  data_type: feat,
train_data: exp/feats.list (jsonl {key, feat: 'ark:offset', spk}-free scp
consumption happens via utt2spk + the scp file, matching bin/train.py).
"""

import argparse
import logging


def _to_tf(out, layer):
    """Normalize a backend output to a (T, F) float32 numpy matrix.
    layer='all' concatenates every hidden layer on the feature axis,
    (T, L*D) — the input format of the trainable StackedFeatFrontend
    (frontend/ssl_frontends.py), which re-learns the reference's in-loop
    s3prl layer mix (frontend/s3prl.py:50-66) on device."""
    import numpy as np
    import torch

    if isinstance(out, (tuple, list)):
        if layer == "all":
            # torchjit upstream emitting a tuple/list of per-layer (T, F)
            # or (1, T, F) states: stack them on the feature axis
            out = torch.cat([t[0] if t.dim() == 3 else t for t in out],
                            dim=-1)
        else:
            out = out[0]
    if hasattr(out, "hidden_states") and out.hidden_states is not None:
        hs = out.hidden_states
        if layer == "all":
            out = torch.cat(list(hs), dim=-1)
        elif layer == "avg":
            out = torch.stack(list(hs)).mean(0)
        elif layer == "last":
            out = hs[-1]
        else:
            out = hs[int(layer)]
    elif hasattr(out, "last_hidden_state"):
        out = out.last_hidden_state
    mat = out.detach().cpu().numpy()
    if mat.ndim == 3:
        assert mat.shape[0] == 1, mat.shape
        mat = mat[0]
    assert mat.ndim == 2, mat.shape
    return np.asarray(mat, np.float32)


def make_frontend_fn(backend: str, model_path: str, layer: str = "last"):
    import torch

    if backend == "torchjit":
        model = torch.jit.load(model_path, map_location="cpu")
        model.eval()

        def fn(wav):
            with torch.no_grad():
                return _to_tf(model(torch.from_numpy(wav[None])), layer)
        return fn
    if backend == "hf":
        from transformers import AutoModel
        model = AutoModel.from_pretrained(model_path,
                                          output_hidden_states=True)
        model.eval()

        def fn(wav):
            with torch.no_grad():
                return _to_tf(model(torch.from_numpy(wav[None])), layer)
        return fn
    if backend == "s3prl":
        try:
            from s3prl.nn import S3PRLUpstream
        except ImportError as e:
            raise SystemExit(
                "backend=s3prl needs the s3prl package (not in this "
                "image); use backend=torchjit with a scripted upstream, "
                "or backend=hf with a local checkpoint") from e
        model = S3PRLUpstream(model_path)
        model.eval()

        def fn(wav):
            with torch.no_grad():
                t = torch.from_numpy(wav[None])
                hs, _ = model(t, torch.tensor([t.shape[1]]))
                if layer == "all":
                    return _to_tf(torch.cat(list(hs), dim=-1), "last")
                if layer == "avg":
                    import torch as _t
                    return _to_tf(_t.stack(list(hs)).mean(0), layer)
                idx = -1 if layer == "last" else int(layer)
                return _to_tf(hs[idx], layer)
        return fn
    raise SystemExit(f"unknown backend {backend!r}")


def precompute(data_list: str, out_prefix: str, backend: str,
               model_path: str, layer: str = "last", resample_rate=16000,
               num_splits: int = 1, split_index: int = 0,
               read_threads: int = 2):
    from wespeaker_tpu.bin.extract import iter_wavs_from_list
    from wespeaker_tpu.utils.kaldi_io import write_mat_ark_scp

    fn = make_frontend_fn(backend, model_path, layer)
    n = 0

    def items():
        nonlocal n
        for key, wav in iter_wavs_from_list(data_list, resample_rate,
                                            num_splits, split_index,
                                            read_threads):
            yield key, fn(wav)
            n += 1
            if n % 100 == 0:
                logging.info("precompute_feats: %d utts", n)

    ark, scp = write_mat_ark_scp(out_prefix, items())
    logging.info("precompute_feats: wrote %d utts -> %s / %s", n, ark, scp)
    return ark, scp


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_list", required=True,
                    help="jsonl raw list ({key, wav, spk} per line)")
    ap.add_argument("--out_prefix", required=True)
    ap.add_argument("--backend", choices=["torchjit", "hf", "s3prl"],
                    required=True)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--layer", default="last",
                    help="'last', 'avg', 'all' (stack every layer on the "
                         "feature axis for trainable feat_stack mixing), "
                         "or a hidden_states index")
    ap.add_argument("--resample_rate", type=int, default=16000)
    ap.add_argument("--num_splits", type=int, default=1)
    ap.add_argument("--split_index", type=int, default=0)
    args = ap.parse_args()
    precompute(args.data_list, args.out_prefix, args.backend,
               args.model_path, args.layer, args.resample_rate,
               args.num_splits, args.split_index)


if __name__ == "__main__":
    main()
