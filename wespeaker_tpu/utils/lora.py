"""LoRA for flax parameter trees.

Reference surface: PEFT LoRA on the w2v-bert frontend
(wespeaker/frontend/w2vbert.py:46-77) and tools/merge_lora.py. JAX-native
formulation: selected 2D kernels W get low-rank deltas (A, B) trained while
the base tree is frozen via optax masking; `merge_lora` folds
W + (alpha/r) * A @ B back into a plain tree (the merge_lora.py equivalent).
The reference's bitsandbytes 4-bit path is intentionally not reproduced
(int8 via native bf16/int8 quantization is the TPU story).
"""

import re
from typing import Tuple

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def _match(path: Tuple[str, ...], pattern: str) -> bool:
    return re.search(pattern, "/".join(path)) is not None


def init_lora_params(params, rank: int = 8, alpha: float = 16.0,
                     target_pattern: str = r"(q_proj|k_proj|v_proj|out_proj|query|key|value|out)/kernel$",
                     rng=None):
    """Create {path: {'a': (in, r), 'b': (r, out)}} adapters for every 2D
    kernel whose path matches target_pattern. a ~ N(0, 1/r), b = 0."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    flat = flatten_dict(params)
    adapters = {}
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        if arr.ndim == 2 and _match(path, target_pattern):
            rng, k = jax.random.split(rng)
            a = jax.random.normal(k, (arr.shape[0], rank)) / np.sqrt(rank)
            b = np.zeros((rank, arr.shape[1]), np.float32)
            adapters[path] = {"a": np.asarray(a, np.float32), "b": b}
    return adapters, alpha / rank


def apply_lora(params, adapters, scaling: float):
    """Return params with W + scaling * a @ b applied (functional; use
    inside the train step so grads flow only to the adapters)."""
    flat = dict(flatten_dict(params))
    for path, ab in adapters.items():
        flat[path] = flat[path] + scaling * (ab["a"] @ ab["b"])
    return unflatten_dict(flat)


def merge_lora(params, adapters, scaling: float):
    """Fold adapters into the base tree (tools/merge_lora.py equivalent)."""
    flat = dict(flatten_dict(params))
    for path, ab in adapters.items():
        flat[path] = np.asarray(flat[path]) + scaling * np.asarray(
            ab["a"]) @ np.asarray(ab["b"])
    return unflatten_dict(flat)


def lora_train_mask(params, adapters):
    """optax mask: True only for adapter leaves when training
    {'base': params, 'lora': adapters} jointly with the base frozen."""
    base_mask = jax.tree_util.tree_map(lambda _: False, params)
    lora_mask = jax.tree_util.tree_map(lambda _: True, adapters)
    return {"base": base_mask, "lora": lora_mask}
