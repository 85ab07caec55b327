"""Checkpoint save/load/average semantics."""

import numpy as np
import pytest

from wespeaker_tpu.utils.checkpoint import (average_checkpoints,
                                            find_epoch_checkpoints,
                                            load_checkpoint,
                                            parse_start_epoch,
                                            save_checkpoint)


def test_roundtrip_and_tolerant_load(tmp_path):
    tree = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
            "projection": {"weight": np.ones((10, 4), np.float32)}}
    p = str(tmp_path / "model_3.ckpt")
    save_checkpoint(p, tree)
    loaded = load_checkpoint(p)
    np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])
    assert parse_start_epoch(p) == 4

    # class-count shrink: projection rows truncated (checkpoint.py:33-67)
    target = {"params": {"w": np.zeros((3, 4), np.float32)},
              "projection": {"weight": np.zeros((6, 4), np.float32)}}
    out = load_checkpoint(p, target)
    assert out["projection"]["weight"].shape == (6, 4)
    np.testing.assert_array_equal(out["projection"]["weight"], 1.0)

    # class-count growth: falls back to target init (non-strict)
    target2 = {"params": {"w": np.zeros((3, 4), np.float32)},
               "projection": {"weight": 7 * np.ones((20, 4), np.float32)}}
    out2 = load_checkpoint(p, target2)
    np.testing.assert_array_equal(out2["projection"]["weight"], 7.0)

    with pytest.raises(ValueError):
        load_checkpoint(p, target2, strict=True)


def test_average_checkpoints(tmp_path):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"model_{i}.ckpt")
        save_checkpoint(p, {"params": {"w": np.full((2, 2), float(i))}})
        paths.append(p)
    found = find_epoch_checkpoints(str(tmp_path))
    assert found == paths
    avg = average_checkpoints(paths)
    np.testing.assert_allclose(avg["params"]["w"], 1.0)
