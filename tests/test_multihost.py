"""Two-process jax.distributed smoke test on the CPU backend — validates the
multi-host bring-up path (coordinator rendezvous, global device view,
cross-process psum through a jitted step) without a pod.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    for k in list(os.environ):
        if "AXON" in k or k in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from wespeaker_tpu.parallel.mesh import make_mesh

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4
    mesh = make_mesh()
    # global array sharded over all 4 devices; each process supplies its part
    global_batch = np.arange(8.0, dtype=np.float32).reshape(4, 2)
    sharding = NamedSharding(mesh, P("data"))
    local_rows = global_batch[pid * 2:(pid + 1) * 2]
    arr = jax.make_array_from_process_local_data(sharding, local_rows,
                                                 global_shape=(4, 2))
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    val = float(jax.device_get(total))
    assert abs(val - 28.0) < 1e-6, val
    print(f"proc{pid} ok sum={val}")
""")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} ok" in out


TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    for k in list(os.environ):
        if "AXON" in k or k in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]; root = sys.argv[3]
    from wespeaker_tpu.bin.train import train
    train(os.path.join(root, "tiny.yaml"),
          distributed_args={"coordinator": coord, "num_processes": 2,
                            "process_id": pid})
    print(f"proc{pid} train done")
""")


@pytest.mark.slow
def test_two_process_train(tmp_path):
    """The full supervised trainer across 2 processes x 2 virtual devices:
    rank-striped local batches assembled into global arrays
    (make_array_from_process_local_data in shard_batch), psum'd grads,
    rank-0 checkpointing."""
    import json

    import numpy as np

    from wespeaker_tpu.data.wav_io import write_wav

    rng = np.random.default_rng(0)
    lines, u2s = [], []
    for s in range(4):
        for u in range(4):
            key = f"s{s}u{u}"
            path = tmp_path / f"{key}.wav"
            t = np.arange(32000) / 16000.0
            sig = 0.3 * np.sin(2 * np.pi * (200 + 150 * s) * t)
            write_wav(path, (sig + 0.01 * rng.standard_normal(len(t))
                             ).astype(np.float32), 16000)
            lines.append(json.dumps(
                {"key": key, "wav": str(path), "spk": f"s{s}"}))
            u2s.append(f"{key} s{s}")
    (tmp_path / "raw.list").write_text("\n".join(lines) + "\n")
    (tmp_path / "utt2spk").write_text("\n".join(u2s) + "\n")
    (tmp_path / "tiny.yaml").write_text(f"""
exp_dir: {tmp_path}/exp
data_type: raw
train_data: {tmp_path}/raw.list
utt2spk: {tmp_path}/utt2spk
num_epochs: 1
log_batch_interval: 1
dataset_args:
  batch_size: 2
  num_frms: 100
  fbank_args:
    num_mel_bins: 40
model: ECAPA_TDNN
model_args:
  feat_dim: 40
  embed_dim: 32
  channels: 32
projection_args:
  project_type: softmax
""")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-4000:]}"
        assert f"proc{i} train done" in out
    # global view: 16 utts / (2 per-chip x 4 data-axis chips) = 2 iters
    assert "it 1/2" in outs[0]
    assert os.path.exists(tmp_path / "exp" / "models" / "model_0.ckpt")


DINO_WORKER = textwrap.dedent("""
    import os, sys
    for k in list(os.environ):
        if "AXON" in k or k in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]; root = sys.argv[3]
    from wespeaker_tpu.bin.train_dino import train_dino
    train_dino(os.path.join(root, "dino.yaml"),
               distributed_args={"coordinator": coord, "num_processes": 2,
                                 "process_id": pid})
    print(f"proc{pid} dino done")
""")


@pytest.mark.slow
def test_two_process_dino(tmp_path):
    """SSL trainer across 2 processes: per-process multi-crop batches
    assembled into global arrays, EMA teacher update under pjit, rank-0
    checkpointing."""
    import json

    import yaml

    from tests.test_recipe_e2e import _make_corpus

    entries = _make_corpus(tmp_path, n_spk=2, n_utt=4, seconds=2.0)
    with open(tmp_path / "raw.list", "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    with open(tmp_path / "utt2spk", "w") as f:
        for key, spk, _ in entries:
            f.write(f"{key} {spk}\n")
    config = {
        "exp_dir": str(tmp_path / "exp"),
        "data_type": "raw",
        "train_data": str(tmp_path / "raw.list"),
        "utt2spk": str(tmp_path / "utt2spk"),
        "num_epochs": 1,
        "log_batch_interval": 1,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 48, "channels": 32},
        "dino_args": {
            "head_out_dim": 128, "head_hidden_dim": 64,
            "bottleneck_dim": 32, "global_chunk_num": 2,
            "local_chunk_num": 2, "global_chunk_sec": 1.0,
            "local_chunk_sec": 0.5, "warmup_epochs": 0,
            "freeze_last_layer_epochs": 0,
        },
        "dataset_args": {
            "batch_size": 1,  # per chip; global = 4 over 2 procs x 2 devs
            "shuffle": False,
            "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 400},
        },
        "seed": 3,
    }
    with open(tmp_path / "dino.yaml", "w") as f:
        yaml.safe_dump(config, f)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "dino_worker.py"
    script.write_text(DINO_WORKER)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-4000:]}"
        assert f"proc{i} dino done" in out
    assert os.path.exists(tmp_path / "exp" / "models" / "model_0.ckpt")


def test_process_data_stripe_layouts(monkeypatch):
    """Which batch stripe each process loads, for DP-only and for a model
    axis that spans hosts (several processes covering the same data rows
    must load the SAME stripe)."""
    from types import SimpleNamespace

    import numpy as np

    from wespeaker_tpu.parallel import mesh as mesh_mod

    def fake_mesh(pidx_grid):
        devs = np.vectorize(lambda p: SimpleNamespace(process_index=p))(
            np.asarray(pidx_grid))
        return SimpleNamespace(devices=devs,
                               shape={"data": devs.shape[0]})

    def expect(grid, n_proc, want):
        monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: n_proc)
        for pid, (stripe, num) in enumerate(want):
            monkeypatch.setattr(mesh_mod.jax, "process_index", lambda
                                p=pid: p)
            got = mesh_mod.process_data_stripe(fake_mesh(grid))
            assert got == (stripe, num), (grid, pid, got)

    # pure DP: 4 hosts x 2 chips, data axis only
    expect([[0], [0], [1], [1], [2], [2], [3], [3]], 4,
           [(0, 4), (1, 4), (2, 4), (3, 4)])
    # model axis within each host: host k owns both model coords of row k
    expect([[0, 0], [1, 1], [2, 2], [3, 3]], 4,
           [(0, 4), (1, 4), (2, 4), (3, 4)])
    # model axis spanning hosts: hosts 0/1 share data rows 0-1 (model
    # columns), hosts 2/3 share rows 2-3 -> two stripes, shared
    expect([[0, 1], [0, 1], [2, 3], [2, 3]], 4,
           [(0, 2), (0, 2), (1, 2), (1, 2)])


TP_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    for k in list(os.environ):
        if "AXON" in k or k in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]; root = sys.argv[3]
    ckpt = sys.argv[4] if len(sys.argv) > 4 else None
    from wespeaker_tpu.bin.train import train
    kw = {}
    if ckpt:
        kw["checkpoint"] = ckpt
    train(os.path.join(root, "tiny_tp.yaml"),
          distributed_args={"coordinator": coord, "num_processes": 2,
                            "process_id": pid}, **kw)
    print(f"proc{pid} tp train done")
""")


@pytest.mark.slow
def test_two_process_model_axis_train_save_resume(tmp_path):
    """TP spanning hosts (mesh data=1, model=4 over 2 procs x 2 devices):
    the arc-margin weight is row-sharded over 'model' with shards 2-3 only
    on process 1, so a bare rank-0 jax.device_get would raise — the save
    path must all-gather collectively (bin/train.py save_state). Verifies
    train -> epoch save -> resume-from-checkpoint across both ranks."""
    import json

    import numpy as np

    from wespeaker_tpu.data.wav_io import write_wav

    rng = np.random.default_rng(0)
    lines, u2s = [], []
    for s in range(4):
        for u in range(2):
            key = f"s{s}u{u}"
            path = tmp_path / f"{key}.wav"
            t = np.arange(32000) / 16000.0
            sig = 0.3 * np.sin(2 * np.pi * (200 + 150 * s) * t)
            write_wav(path, (sig + 0.01 * rng.standard_normal(len(t))
                             ).astype(np.float32), 16000)
            lines.append(json.dumps(
                {"key": key, "wav": str(path), "spk": f"s{s}"}))
            u2s.append(f"{key} s{s}")
    (tmp_path / "raw.list").write_text("\n".join(lines) + "\n")
    (tmp_path / "utt2spk").write_text("\n".join(u2s) + "\n")
    (tmp_path / "tiny_tp.yaml").write_text(f"""
exp_dir: {tmp_path}/exp
data_type: raw
train_data: {tmp_path}/raw.list
utt2spk: {tmp_path}/utt2spk
num_epochs: 1
log_batch_interval: 1
parallel_args:
  model: 4
dataset_args:
  batch_size: 4
  num_frms: 100
  speed_perturb: false
  fbank_args:
    num_mel_bins: 40
model: ECAPA_TDNN
model_args:
  feat_dim: 40
  embed_dim: 32
  channels: 32
projection_args:
  project_type: arc_margin
  scale: 32.0
""")

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "tp_worker.py"
    script.write_text(TP_TRAIN_WORKER)

    def run_pair(extra):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(i), coord, str(tmp_path)]
            + extra, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for i in range(2)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc{i} failed:\n{out[-4000:]}"
            assert f"proc{i} tp train done" in out
        return outs

    run_pair([])
    ckpt_path = tmp_path / "exp" / "models" / "model_0.ckpt"
    assert ckpt_path.exists()
    # the gathered save must contain the FULL (unsharded) margin weight
    from wespeaker_tpu.utils.checkpoint import load_checkpoint
    tree = load_checkpoint(str(ckpt_path))
    assert tree["projection"]["weight"].shape[0] == 4  # num_class rows
    outs = run_pair([str(ckpt_path)])
    assert any("resumed from" in o for o in outs)
