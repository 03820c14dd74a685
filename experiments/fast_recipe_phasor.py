"""Re-measure the non-adaptive fast plan's fixed-iteration recipe
(max_iter=20, conv_eps=0, bucket 176) with the unit-phasor stacked-matmul
transform at the headline's per-direction precisions — mirrors the r3
measurement protocol (B=64 all-M03 batch, 3x12 chained windows,
scalar-fetch close)."""
import json, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from dataclasses import replace
from se_snmf_nat_tpu.config import default_config, preset
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.io.wavio import read_wav_int16
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

x, fs = read_wav_int16("/root/reference/wav/M03_423C0213_STR.CH6.wav")
cfg = preset("snmf")
assert not cfg.adapt.adapt_train_n
speech, noise = load_reference_speech_noise(cfg.sep.r_d)
rows = {}
for name, mi, eps, fp, ip in [
        ("fixed20_fft_r3recipe", 20, 0.0, None, None),
        ("fixed20_phasor_high_default", 20, 0.0, "high", "default")]:
    c2 = replace(cfg, nmf=replace(cfg.nmf, max_iter=mi, conv_eps=eps))
    enh = SnmfEnhancer(c2, speech.b_dft, noise.b_dft, speech.b_dft,
                       noise.b_dft, dtype=jnp.float32, frame_bucket=176,
                       dft_matmul=True, dft_precision=fp, idft_precision=ip)
    B = 64
    xs = np.stack([x] * B)
    # use the same entry the pareto bench uses: build frames + _fast_run_batch
    frames = enh._pad_frames(enh.frames_for(x))
    fb = jnp.asarray(np.stack([np.asarray(frames)] * B), jnp.float32)
    run = enh._fast_run_batch
    y = run(fb, enh.win); jax.block_until_ready(y)
    laps = []
    for _ in range(3):
        t0 = time.perf_counter()
        scale = jnp.float32(1.0)
        for _ in range(12):
            y = run(fb * scale, enh.win)
            scale = 1.0 + 1e-6 * (jnp.abs(y[0, 0]) % 1.0)
        float(scale)
        laps.append((time.perf_counter() - t0) / 12)
    el = min(laps)
    au = B * len(x) / fs / el
    rows[name] = {"audio_s_per_s": round(au, 1), "call_s": round(el, 4)}
    print(name, rows[name], flush=True)
print(json.dumps(rows))
