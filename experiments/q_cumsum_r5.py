"""r5: cumsum-Q variant at the headline — speed + golden gates.
Writes experiments/q_cumsum_r5_out.json."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.headline import HEADLINE_PLAN, HEADLINE_BATCH
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.io.wavio import enhanced_quantize, read_wav_int16
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

cfg = default_config()
speech, noise = load_reference_speech_noise(cfg.sep.r_d)
fixtures = [
    ("M03", "/root/reference/wav/M03_423C0213_STR.CH6.wav",
     "/root/reference/wav/M03_423C0213_STR.CH6_out_v3.9_18.wav"),
    ("LM", "/root/reference/wav/LM_in.wav",
     "/root/reference/wav/LM_in_out_v3.9_18.wav"),
]
waves = []
for _, i_, g_ in fixtures:
    xw, fs = read_wav_int16(i_)
    gw, _ = read_wav_int16(g_)
    waves.append((xw, gw.astype(np.float64)))
B = HEADLINE_BATCH
s = cfg.signal
out = {}
for name, extra in (("headline", {}), ("q_cumsum", {"block_q_cumsum": True})):
    enh = SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft,
                       noise.b_dft, dtype=jnp.float32,
                       **{**HEADLINE_PLAN, **extra})
    x = waves[0][0]
    frames = enh._pad_frames(enh.frames_for(x))
    t_true = enh.frames_for(x).shape[0]
    batch = jnp.asarray(np.stack([frames] * B), np.float32)
    states = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                          enh.initial_state())
    tv = jnp.full((B,), t_true, jnp.int32)
    ys, _ = enh._block_run_batch(batch, states, enh.win, tv)
    jax.block_until_ready(ys)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(12):
            ys, _ = enh._block_run_batch(batch, states, enh.win, tv)
        float(jnp.sum(ys))
        windows.append((time.perf_counter() - t0) / 12)
    el = min(windows)
    row = {"au_s_per_s": round(B * len(x) / fs / el, 1),
           "call_ms": round(el * 1e3, 2)}
    start = cfg.delay * s.frameshift
    emit = np.asarray(ys)[0, start: start + (t_true - cfg.delay)
                          * s.frameshift]
    outs = [enhanced_quantize(emit).astype(np.float64),
            enh.enhance(waves[1][0]).astype(np.float64)]
    for i, (fname, _, _) in enumerate(fixtures):
        yq, g = outs[i], waves[i][1]
        n = min(len(yq), len(g))
        row[fname] = round(float(np.corrcoef(yq[:n], g[:n])[0, 1]), 4)
    out[name] = row
    print(name, row, flush=True)
with open("experiments/q_cumsum_r5_out.json", "w") as f:
    json.dump(out, f, indent=1)
