"""Per-op time breakdown of the flagship bf16 extraction forward.

Captures a jax.profiler device trace of the jitted wav->embedding program
(same path bench.py times) and prints the top XLA ops by self-time via
tensorboard_plugin_profile's xplane converter. One run replaces the
scripts/bench_ecapa_ablation.py knockout ladder when the tunnel exposes
device traces.

Usage: python scripts/profile_extract.py [batch] [iters]
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHUNK_SAMPLES = int((200 - 1) * 160 + 400)


def main():
    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.train import make_eval_embed_fn
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                       global_context_att=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    embed_fn = make_eval_embed_fn(model, FbankConfig(),
                                  compute_dtype=jnp.bfloat16, from_wav=True)
    fn = jax.jit(lambda b: embed_fn(variables, b))

    rng = np.random.default_rng(0)
    data = {"wav": jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32))}

    fn(data).block_until_ready()
    for _ in range(3):
        out = fn(data)
    np.asarray(out[0, 0])

    logdir = "/tmp/extract_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(data)
        np.asarray(out[0, 0])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(data)
    np.asarray(out[0, 0])
    wall_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"wall: {wall_ms:.2f} ms/iter  "
          f"({batch * 2.0 / (wall_ms / 1e3):.0f} audio-s/s)")

    planes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not planes:
        print("no xplane captured (tunnel may not export device traces)")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data_out, _ = rtd.xspace_to_tool_data(planes, "framework_op_stats", {})
    if isinstance(data_out, bytes):
        try:
            data_out = gzip.decompress(data_out)
        except OSError:
            pass
        data_out = data_out.decode("utf-8", "replace")
    # framework_op_stats arrives as JSON-ish table; just dump to a file and
    # print the op_profile roll-up instead, which is stable JSON.
    with open("/tmp/op_stats.json", "w") as f:
        f.write(data_out)
    prof, _ = rtd.xspace_to_tool_data(planes, "op_profile", {})
    if isinstance(prof, bytes):
        prof = prof.decode("utf-8", "replace")
    tree = json.loads(prof)

    def walk(node, depth=0, out=None):
        m = node.get("metrics", {})
        out.append((m.get("rawTime", 0), node.get("name", "?"), depth))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)
        return out

    root = tree.get("byProgram") or tree.get("byCategory") or {}
    rows = walk(root, 0, [])
    rows.sort(reverse=True)
    total = rows[0][0] if rows else 1
    print(f"{'time%':>7}  op")
    for t, name, depth in rows[:40]:
        if t / total < 0.005:
            continue
        print(f"{100 * t / total:6.1f}%  {'  ' * depth}{name[:110]}")


if __name__ == "__main__":
    main()
