"""Device-side reverb/noise augmentation — the TPU half of
data/pipeline.py::attach_device_aug.

The reference applies MUSAN/RIRS augmentation on CPU dataloader workers
(wespeaker/dataset/processor.py:421-494); the scipy fftconvolve there is the
host hot spot that forces ~13 workers per chip (docs/PERF.md). Here the host
only *picks* the RIR/noise sample and SNR; the energy-normalized RIR
convolution (batched FFT), SNR-scaled noise mixing, and peak normalization
run inside the jitted train step, where they cost microseconds against the
model fwd/bwd.

Numerics match the host path: reverb to fft tolerance (both are FFT
convolutions), noise mixing exactly; RIRs are truncated to a static length
(default 1 s) for XLA, which the host path does not do.
"""

import jax.numpy as jnp


def device_augment(wav, mode, rir, noise, snr, blocks: int = 1):
    """Apply the augmentation selected per sample on the host.

    wav: (B, N) float32 in [-1, 1]; mode: (B,) int32 (0=none, 1=reverb,
    2=noise); rir: (cap, R) with cap <= B — the host packs reverb samples
    into the first cap/blocks rows OF EACH PROCESS-LOCAL BLOCK
    (pipeline.py batch_samples), so only that slice pays the FFT;
    noise: (B, N). rir/noise may be float32 in [-1, 1] or store-native
    int16. snr: (B,) dB. Returns (B, N).

    blocks: number of process-local blocks concatenated into this global
    batch (jax.process_count() in the trainer). shard_batch stacks one
    front-packed block per host, so the reverb rows sit at the head of
    each block, not of the whole batch.
    """
    if jnp.issubdtype(rir.dtype, jnp.integer):
        rir = rir.astype(jnp.float32) / 32768.0
    if jnp.issubdtype(noise.dtype, jnp.integer):
        noise = noise.astype(jnp.float32) / 32768.0
    b, n = wav.shape
    cap, r = rir.shape
    assert b % blocks == 0 and cap % blocks == 0, (b, cap, blocks)
    lb, lcap = b // blocks, cap // blocks
    fft_len = 1
    while fft_len < n + r - 1:
        fft_len *= 2

    # reverb: energy-normalized RIR, full convolution truncated to n
    # (pipeline.py add_reverb_noise; processor.py:439-452) — XLA's TPU FFT
    # is the cost here (~5.8 ms per 256x65536 rfft), hence the capacity cut
    rir_n = rir / jnp.sqrt(
        jnp.sum(rir ** 2, axis=-1, keepdims=True) + 1e-12)
    head = wav.reshape(blocks, lb, n)[:, :lcap].reshape(cap, n)
    spec = jnp.fft.rfft(head, fft_len) * jnp.fft.rfft(rir_n, fft_len)
    reverbed = jnp.fft.irfft(spec, fft_len)[..., :n].astype(wav.dtype)
    if cap < b:
        reverbed = jnp.concatenate([
            reverbed.reshape(blocks, lcap, n),
            jnp.zeros((blocks, lb - lcap, n), wav.dtype)],
            axis=1).reshape(b, n)

    # additive noise at the host-drawn SNR (processor.py:454-476)
    audio_db = 10.0 * jnp.log10(jnp.mean(wav ** 2, axis=-1) + 1e-4)
    noise_db = 10.0 * jnp.log10(jnp.mean(noise ** 2, axis=-1) + 1e-4)
    gain = jnp.sqrt(10.0 ** ((audio_db - noise_db - snr) / 10.0))
    noised = wav + gain[:, None] * noise

    m = mode[:, None]
    out = jnp.where(m == 1, reverbed, jnp.where(m == 2, noised, wav))
    # peak-normalize augmented samples only (the host path normalizes inside
    # the aug branch)
    peak = jnp.max(jnp.abs(out), axis=-1, keepdims=True) + 1e-4
    return jnp.where(m == 0, wav, out / peak)
