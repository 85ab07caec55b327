"""wespeaker_tpu: a TPU-native (JAX/XLA/Pallas) speaker-embedding framework.

Re-designed from scratch with the capability surface of wenet-e2e/wespeaker
(reference layout documented in SURVEY.md): speaker-encoder training with
margin losses, embedding extraction, trial scoring (cosine / PLDA / AS-Norm /
QMF), and diarization — all built TPU-first:

- compute path: jnp / flax.linen / pallas, channels-last layouts, static shapes
- parallelism: jax.sharding.Mesh + jit/shard_map (data axis for DP, model axis
  for large SSL frontends)
- host path: numpy data pipeline feeding fixed-shape device batches
"""

__version__ = "0.1.0"
