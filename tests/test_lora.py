"""LoRA adapter utilities test."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.utils.lora import (apply_lora, init_lora_params,
                                      lora_train_mask, merge_lora)


def test_lora_init_apply_merge():
    params = {
        "enc": {"q_proj": {"kernel": np.ones((8, 8), np.float32),
                           "bias": np.zeros(8, np.float32)},
                "ffn": {"kernel": np.ones((8, 16), np.float32)}},
    }
    adapters, scaling = init_lora_params(params, rank=2,
                                         rng=jax.random.PRNGKey(0))
    assert list(adapters) == [("enc", "q_proj", "kernel")]
    # b = 0 at init: apply is identity
    out = apply_lora(params, adapters, scaling)
    np.testing.assert_allclose(np.asarray(out["enc"]["q_proj"]["kernel"]),
                               params["enc"]["q_proj"]["kernel"])

    adapters[("enc", "q_proj", "kernel")]["b"] += 0.5
    merged = merge_lora(params, adapters, scaling)
    applied = apply_lora(params, adapters, scaling)
    np.testing.assert_allclose(np.asarray(merged["enc"]["q_proj"]["kernel"]),
                               np.asarray(applied["enc"]["q_proj"]["kernel"]),
                               atol=1e-6)
    assert not np.allclose(merged["enc"]["q_proj"]["kernel"],
                           params["enc"]["q_proj"]["kernel"])

    mask = lora_train_mask(params, adapters)
    assert mask["base"]["enc"]["q_proj"]["kernel"] is False
    assert mask["lora"][("enc", "q_proj", "kernel")]["a"] is True
