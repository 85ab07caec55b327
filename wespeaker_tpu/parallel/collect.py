"""Cross-chip collectives for the evaluation backend.

SURVEY.md §2.10: the reference does trial scoring, AS-Norm cohort matmuls
and diarization affinities single-process in numpy; at pod scale the
embeddings live sharded across hosts. These helpers keep that math on
device over the mesh:

- all_gather_embeddings: shard_map + lax.all_gather over the 'data' axis
  (the ICI replacement for gathering per-host embedding files).
- sharded helpers that compute cohort statistics / affinity with the row
  dimension sharded — XLA inserts the collectives.
"""

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def all_gather_embeddings(embs, mesh: Mesh, axis: str = "data"):
    """(N_local_total, D) sharded over `axis` -> fully replicated (N, D)."""

    def gather(x):
        return jax.lax.all_gather(x, axis, tiled=True)

    fn = shard_map(gather, mesh=mesh, in_specs=P(axis), out_specs=P(),
                   check_vma=False)
    return fn(embs)


def sharded_cohort_stats(emb, cohort, mesh: Mesh, top_n: int,
                         axis: str = "data"):
    """AS-Norm cohort statistics with the embedding rows sharded over the
    mesh; the cohort is replicated. Returns ROW-SHARDED (mean, std) — one
    row per embedding, sharded like the input over `axis`; gather (e.g.
    all_gather_embeddings or np.asarray on an addressable host) before
    indexing rows that may live on another host."""
    from wespeaker_tpu.backend.scoring import l2norm

    def stats(e, c):
        scores = l2norm(e) @ l2norm(c).T
        top, _ = jax.lax.top_k(scores, top_n)
        return jnp.mean(top, axis=1), jnp.std(top, axis=1)

    fn = shard_map(stats, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=(P(axis), P(axis)), check_vma=False)
    emb = jax.device_put(emb, NamedSharding(mesh, P(axis)))
    cohort = jax.device_put(cohort, NamedSharding(mesh, P()))
    return fn(emb, cohort)


def sharded_affinity(emb, mesh: Mesh, axis: str = "data"):
    """Diarization cosine affinity 0.5*(1+cos) with rows sharded over the
    mesh: each shard computes its row block against the gathered full
    matrix. Output rows stay sharded (N, N)."""
    from wespeaker_tpu.backend.scoring import l2norm

    def block(e_rows):
        full = jax.lax.all_gather(e_rows, axis, tiled=True)
        return 0.5 * (1.0 + l2norm(e_rows) @ l2norm(full).T)

    fn = shard_map(block, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                   check_vma=False)
    emb = jax.device_put(emb, NamedSharding(mesh, P(axis)))
    return fn(emb)
