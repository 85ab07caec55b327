"""Torch-checkpoint → flax-variables conversion.

The reference framework publishes pretrained torch state_dicts; bit-faithful
embeddings (BASELINE.md north star: cos >= 0.999) require loading them into
our flax models. Our modules intentionally reuse the torch attribute names,
so conversion is structural: walk the flax variable tree, derive each leaf's
torch key, and apply a shape-driven layout transform:

  - conv kernels: torch (O, I, K...)        -> flax (K..., I, O)
  - dense kernels: torch (O, I)             -> flax (I, O)
  - batchnorm: weight/bias/running_mean/var -> scale/bias + batch_stats
  - everything else: verbatim

Where torch uses Sequential/ModuleList integer children (e.g.
`se_res2block.0`), flax child names use `name_0`; per-model regex rules remap
those path segments.
"""

import re
from typing import Dict, Mapping, Sequence, Tuple

import numpy as np
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict

LEAF_TO_TORCH = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}

IGNORED_TORCH_SUFFIXES = (
    "num_batches_tracked",
    "positional_embedding",
    # ReDimNet's frozen all-ones stage-0 weight placeholder (redimnet.py:661)
    "inputs_weights.0",
    # WavLM spec-augment mask embedding (train-time only)
    "masked_spec_embed",
)


# pooling-layer child names used across every model family
COMMON_RULES = (
    (r"\bheads_att_trans_(\d+)\b", r"heads_att_trans.\1"),
    (r"\bn_query_(\d+)\b", r"n_query.\1"),
)


def _to_torch_key(path: Tuple[str, ...], rules: Sequence[Tuple[str, str]]):
    *mods, leaf = path
    prefix = ".".join(mods)
    suffix = LEAF_TO_TORCH.get(leaf, leaf)
    key = f"{prefix}.{suffix}" if prefix else suffix
    for pat, repl in tuple(rules) + COMMON_RULES:
        key = re.sub(pat, repl, key)
    return key


def _convert_leaf(torch_arr: np.ndarray, leaf: str, flax_shape):
    arr = np.asarray(torch_arr)
    if leaf == "kernel":
        if arr.ndim == 2:
            arr = arr.T
        elif arr.ndim >= 3:
            # (O, I, K...) -> (K..., I, O)
            perm = tuple(range(2, arr.ndim)) + (1, 0)
            arr = arr.transpose(perm)
    if arr.shape != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch for {leaf}: torch {arr.shape} vs flax {tuple(flax_shape)}")
    return arr


def expand_torch_gru_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Split torch nn.GRU packed params into per-gate flax GRUCell leaves.

    torch packs (W_ir|W_iz|W_in) as `<m>.weight_ih_l0` (3H, C) etc.; our
    BiGRU holds nn.RNN(GRUCell) under fwd/bwd. Gate math mapping (torch
    r = sig(W_ir x + b_ir + W_hr h + b_hr) vs flax r = sig(ir(x) + hr(h))
    with hr/hz bias-free): b_hr/b_hz fold into the ir/iz biases; b_hn maps
    to hn.bias (flax n = tanh(in(x) + r * hn(h)) matches torch). Emitted
    keys stay in torch (O, I) layout for the generic kernel transpose.
    """
    out = dict(sd)
    for key in list(sd):
        m = re.match(r"(.*)\.weight_ih_l0(_reverse)?$", key)
        if not m:
            continue
        prefix, rev = m.group(1), m.group(2) or ""
        direction = "bwd" if rev else "fwd"
        hid = sd[key].shape[0] // 3
        gates = {"r": slice(0, hid), "z": slice(hid, 2 * hid),
                 "n": slice(2 * hid, 3 * hid)}
        w_ih = out.pop(f"{prefix}.weight_ih_l0{rev}")
        w_hh = out.pop(f"{prefix}.weight_hh_l0{rev}")
        b_ih = out.pop(f"{prefix}.bias_ih_l0{rev}", np.zeros(3 * hid,
                                                             w_ih.dtype))
        b_hh = out.pop(f"{prefix}.bias_hh_l0{rev}", np.zeros(3 * hid,
                                                             w_ih.dtype))
        # torch module is `<prefix>.gru`; our BiGRU sits at `<prefix>`
        stem = re.sub(r"(^|\.)gru$", "", prefix)
        base = (f"{stem}." if stem else "") + direction
        for g, sl in gates.items():
            out[f"{base}.i{g}.weight"] = w_ih[sl]
            out[f"{base}.h{g}.weight"] = w_hh[sl]
        out[f"{base}.ir.bias"] = b_ih[gates["r"]] + b_hh[gates["r"]]
        out[f"{base}.iz.bias"] = b_ih[gates["z"]] + b_hh[gates["z"]]
        out[f"{base}.in.bias"] = b_ih[gates["n"]]
        out[f"{base}.hn.bias"] = b_hh[gates["n"]]
    return out


def torch_to_flax_variables(
    state_dict: Mapping[str, "np.ndarray"],
    flax_variables,
    rules: Sequence[Tuple[str, str]] = (),
    strict: bool = True,
    key_prefix: str = "",
):
    """Fill `flax_variables` (as returned by model.init) from a torch
    state_dict. `rules` are (regex, replacement) applied to the dotted module
    path. Returns a new frozen variable dict.
    """
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)
    if any("weight_ih_l0" in k for k in sd):
        sd = expand_torch_gru_keys(sd)

    from flax.linen import meta as nn_meta

    flat = flatten_dict(unfreeze(nn_meta.unbox(flax_variables)))
    out = {}
    used = set()
    missing = []
    for full_path, leaf_val in flat.items():
        collection, *path = full_path
        tkey = key_prefix + _to_torch_key(tuple(path), rules)
        if tkey not in sd:
            missing.append((full_path, tkey))
            continue
        out[full_path] = _convert_leaf(sd[tkey], full_path[-1],
                                       np.shape(leaf_val)).astype(
                                           np.asarray(leaf_val).dtype)
        used.add(tkey)

    if missing and strict:
        raise KeyError(f"no torch key for flax leaves: {missing[:8]}"
                       f" ({len(missing)} total)")
    unused = [k for k in sd
              if k not in used and not k.endswith(IGNORED_TORCH_SUFFIXES)
              and k.startswith(key_prefix)]
    if unused and strict:
        raise KeyError(f"unused torch keys: {unused[:8]} ({len(unused)} total)")

    for full_path in missing:
        out[full_path[0]] = flat[full_path[0]]
    return freeze(unflatten_dict(out))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt state_dict to numpy without needing CUDA."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


# Shared rules for XI pooling children (pool.lin1_relu_bn Sequential).
_XI_RULES = [
    (r"\blin1_bn\b", "lin1_relu_bn.2"),
    (r"\blin1\b", "lin1_relu_bn.0"),
]

# Per-model path rewrite rules: flax child name -> torch module path.
MODEL_RULES = {
    "ECAPA_TDNN": [
        (r"\bblock_(\d+)\b", r"se_res2block.\1"),
        (r"\bconvs_(\d+)\b", r"convs.\1"),
        (r"\bbns_(\d+)\b", r"bns.\1"),
    ] + _XI_RULES,
    "XI_VEC_ECAPA_TDNN": [
        (r"\bblock_(\d+)\b", r"se_res2block.\1"),
        (r"\bconvs_(\d+)\b", r"convs.\1"),
        (r"\bbns_(\d+)\b", r"bns.\1"),
    ] + _XI_RULES,
    "XI_VEC": _XI_RULES,  # XI_VEC_XVEC
    "ResNet": [
        (r"\blayer(\d)_(\d+)\b", r"layer\1.\2"),
        (r"\bshortcut_conv\b", "shortcut.0"),
        (r"\bshortcut_bn\b", "shortcut.1"),
    ],
    "ERes2Net": [
        (r"\blayer(\d)_(\d+)\b", r"layer\1.\2"),
        (r"\bshortcut_conv\b", "shortcut.0"),
        (r"\bshortcut_bn\b", "shortcut.1"),
        (r"\bconvs_(\d+)\b", r"convs.\1"),
        (r"\bbns_(\d+)\b", r"bns.\1"),
        (r"\bfuse_models_(\d+)\b", r"fuse_models.\1"),
        (r"\blocal_att_(\d+)\b", r"local_att.\1"),
    ],
    "Res2Net": [
        (r"\blayer(\d)_(\d+)\b", r"layer\1.\2"),
        (r"\bshortcut_conv\b", "shortcut.0"),
        (r"\bshortcut_bn\b", "shortcut.1"),
        (r"\bconvs_(\d+)\b", r"convs.\1"),
        (r"\bbns_(\d+)\b", r"bns.\1"),
    ],
    "Gemini": [
        (r"\bdownsample_layers_(\d+)_(\d+)\b", r"downsample_layers.\1.\2"),
        (r"\bstages_(\d+)_(\d+)\b", r"stages.\1.\2"),
    ],
    "SimAM_ResNet": [
        (r"\blayer(\d)_(\d+)\b", r"layer\1.\2"),
        (r"\bdownsample_conv\b", "downsample.0"),
        (r"\bdownsample_bn\b", "downsample.1"),
        (r"\batt_conv1\b", "attention.0"),
        (r"\batt_bn\b", "attention.2"),
        (r"\batt_conv2\b", "attention.3"),
    ],
    "XVEC": _XI_RULES,
    "ReDimNet": [
        (r"\binputs_weights_(\d+)\b", r"inputs_weights.\1"),
        (r"\bstem_(\d+)\b", r"stem.\1"),
        (r"\bmfa_(\d+)\b", r"mfa.\1"),
        (r"\bstage(\d+)_(\d+)_conv_block\b", r"stage\1.\2.conv_block"),
        (r"\bstage(\d+)_(\d+)_(\d+)\b", r"stage\1.\2.\3"),
        (r"\bstage(\d+)_(\d+)\b", r"stage\1.\2"),
        (r"\bdwconvs_(\d+)\b", r"dwconvs.\1"),
        (r"\bred_dim_conv_(\d+)\b", r"red_dim_conv.\1"),
        (r"\btcm_(\d+)\b", r"tcm.\1"),
        (r"\bfeed_forward_intermediate_dense\b",
         "feed_forward.intermediate_dense"),
        (r"\bfeed_forward_output_dense\b", "feed_forward.output_dense"),
        (r"\bdownsample_conv\b", "downsample.0"),
        (r"\bdownsample_bn\b", "downsample.1"),
    ],
    "ReDimNet2": [
        (r"\bstage(\d+)_0_w\b", r"stage\1.0.w"),
        (r"\bfin_wght1d_w\b", "fin_wght1d.w"),
        (r"\bstem_(\d+)\b", r"stem.\1"),
        (r"\bstage(\d+)_(\d+)_conv_block\b", r"stage\1.\2.conv_block"),
        (r"\bstage(\d+)_(\d+)_(\d+)\b", r"stage\1.\2.\3"),
        (r"\bstage(\d+)_(\d+)\b", r"stage\1.\2"),
        (r"\bdwconvs_(\d+)\b", r"dwconvs.\1"),
        (r"\bred_dim_conv_(\d+)\b", r"red_dim_conv.\1"),
        (r"\btcm_(\d+)\b", r"tcm.\1"),
        (r"\bfeed_forward_intermediate_dense\b",
         "feed_forward.intermediate_dense"),
        (r"\bfeed_forward_output_dense\b", "feed_forward.output_dense"),
        (r"\bdownsample_conv\b", "downsample.0"),
        (r"\bdownsample_bn\b", "downsample.1"),
    ],
    "W2VBert_Adapter_MFA": [
        (r"\badapter_layers_(\d+)\b", r"adapter_layers.\1"),
        (r"\batt_conv1\b", "attention.0"),
        (r"\batt_bn\b", "attention.2"),
        (r"\batt_conv2\b", "attention.3"),
    ],
    "whisper_PMFA": [
        (r"\bbn_norm\b", "bn.norm"),
    ],
    "Wav2Vec2Bert": [
        # HF transformers Wav2Vec2BertModel state_dict names
        (r"\bfeature_projection_layer_norm\b", "feature_projection.layer_norm"),
        (r"\bfeature_projection_projection\b", "feature_projection.projection"),
        (r"\blayers_(\d+)\b", r"encoder.layers.\1"),
        (r"\bdistance_embedding\.embedding\b", "distance_embedding.weight"),
    ],
    "WavLM": [
        # HF transformers WavLMModel state_dict names; the pos-conv
        # weight_norm must be pre-folded with fold_wavlm_weight_norm
        (r"\bconv_layers_(\d+)_conv\b", r"conv_layers.\1.conv"),
        (r"\bconv_layers_(\d+)_layer_norm\b", r"conv_layers.\1.layer_norm"),
        (r"\bfeature_projection_layer_norm\b", "feature_projection.layer_norm"),
        (r"\bfeature_projection_projection\b", "feature_projection.projection"),
        (r"\bpos_conv_embed_conv\b", "encoder.pos_conv_embed.conv"),
        (r"\bencoder_layer_norm\b", "encoder.layer_norm"),
        (r"\blayers_(\d+)\b", r"encoder.layers.\1"),
        (r"\brel_attn_embed\.embedding\b", "rel_attn_embed.weight"),
    ],
    "WhisperEncoder": [
        (r"\bblocks_(\d+)\b", r"blocks.\1"),
        (r"\bmlp_(\d+)\b", r"mlp.\1"),
    ],
    "REPVGG": [
        (r"\bstage(\d)_(\d+)\b", r"stage\1.\2"),
    ],
    "CAMPPlus": [
        (r"\blayer(\d)_(\d+)\b", r"layer\1.\2"),
        (r"\bshortcut_conv\b", "shortcut.0"),
        (r"\bshortcut_bn\b", "shortcut.1"),
        (r"\bout_nonlinear_bn\b", "out_nonlinear.batchnorm"),
        (r"\bnonlinear(\d?)_bn\b", r"nonlinear\1.batchnorm"),
    ],
}


def rules_for(model_name: str) -> Sequence[Tuple[str, str]]:
    best = ()
    best_len = -1
    for prefix, rules in MODEL_RULES.items():
        if model_name.startswith(prefix) and len(prefix) > best_len:
            best, best_len = rules, len(prefix)
    return best
