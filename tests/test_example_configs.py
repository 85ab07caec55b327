"""Every example config must build: model (+frontend attach), projection,
optimizer, and LR/margin schedulers resolve from the YAML alone — the
config-level equivalent of the reference keeping every conf/*.yaml loadable
by bin/train.py."""

import glob
import os

import pytest
import yaml

pytest.importorskip("jax")

from wespeaker_tpu.bin.train import build_from_config
from wespeaker_tpu.train.optim import make_optimizer
from wespeaker_tpu.utils.schedulers import MarginScheduler, get_lr_scheduler

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "examples", "*", "*", "conf", "*.yaml"))
    + glob.glob(os.path.join(REPO, "examples", "*", "*", "*", "conf",
                             "*.yaml")))


def _is_ssl(configs):
    return "dino" in configs or "contrastive" in configs


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, os.path.join(REPO, "examples"))
                          for p in CONFIGS])
def test_config_builds(path):
    with open(path) as f:
        configs = yaml.safe_load(f)
    if _is_ssl(configs):
        pytest.skip("SSL trainer configs are built by their own CLIs")
    built, projection = build_from_config(configs, num_class=11)
    assert built.model is not None and projection is not None
    make_optimizer(configs, None)

    sched_args = dict(configs.get("scheduler_args", {}))
    sched_args.setdefault("initial_lr", 0.1)
    sched_args.setdefault("final_lr", 5e-5)
    sched_args.setdefault("warm_up_epoch", 6)
    sched_args["num_epochs"] = configs.get("num_epochs", 10)
    sched_args["epoch_iter"] = 100
    sched_args["scale_ratio"] = 1.0
    lr_fn = get_lr_scheduler(
        configs.get("scheduler", "ExponentialDecrease"), **sched_args)
    assert float(lr_fn(0)) >= 0.0

    margs = dict(configs.get("margin_scheduler_args",
                             configs.get("margin_update", {})))
    margin_fn = MarginScheduler(
        epoch_iter=100,
        increase_start_epoch=margs.get("increase_start_epoch", 20),
        fix_start_epoch=margs.get("fix_start_epoch", 40),
        initial_margin=margs.get("initial_margin", 0.0),
        final_margin=margs.get("final_margin", 0.2),
        increase_type=margs.get("increase_type", "exp"))
    assert float(margin_fn(0)) == pytest.approx(
        margs.get("initial_margin", 0.0))
