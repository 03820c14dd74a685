"""Asymmetric DFT-precision sweep at the headline pick (real TPU).

Hypothesis: the 'default'/'high' DFT-precision pareto rows
(PARETO_r04.json, +10.7%/+6.5% speed) fail the pick policy's .9955
min-corr floor because ANALYSIS rounding perturbs the magnitudes the NMF
solves consume (trajectory-amplified), while SYNTHESIS rounding only adds
linear noise to an output whose golden residual is already ~9% rel.  If
so, (analysis='highest', synthesis='default') should keep the pick's corr
while banking roughly half the transform saving.

Measurement mirrors cli.py's `bench --pareto` row protocol exactly
(B=64 all-M03 timed batch, 3x12 chained windows, scalar-fetch close; M03
quality from lane 0 of the timed program, LM from a single call).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.headline import HEADLINE_PLAN
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.io.wavio import enhanced_quantize, read_wav_int16
from se_snmf_nat_tpu.metrics import log_spectral_distance
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer
import se_snmf_nat_tpu.dsp.stft as stft_mod

cfg = default_config()
speech, noise = load_reference_speech_noise(cfg.sep.r_d)
fixtures = [
    ("M03", "/root/reference/wav/M03_423C0213_STR.CH6.wav",
     "/root/reference/wav/M03_423C0213_STR.CH6_out_v3.9_18.wav"),
    ("LM", "/root/reference/wav/LM_in.wav",
     "/root/reference/wav/LM_in_out_v3.9_18.wav"),
]
waves = []
for _, in_path, gold_path in fixtures:
    xw, fs = read_wav_int16(in_path)
    gw, _ = read_wav_int16(gold_path)
    waves.append((xw, gw.astype(np.float64)))

batch_size = 64
shift = cfg.signal.frameshift
delay = cfg.delay

combos = [
    ("highest", "highest"),   # anchor == PARETO_r04 pick row
    ("highest", "default"),   # synthesis-only cheap
    ("highest", "high"),
    ("default", "highest"),   # analysis-only cheap (expected corr drop)
    ("high", "highest"),
]

rows = []
for fwd, inv in combos:
    # Pass the swept precisions as EXPLICIT kwargs, overriding whatever
    # HEADLINE_PLAN ships (the plan now carries its own dft_precision/
    # idft_precision after this experiment's result was promoted — setting
    # only the stft module globals would be silently overridden by them
    # and every combo would measure the shipped pair).
    plan = {k: v for k, v in HEADLINE_PLAN.items()
            if k not in ("dft_precision", "idft_precision")}
    enh = SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft,
                       noise.b_dft, dtype=jnp.float32, **plan,
                       dft_precision=fwd, idft_precision=inv)
    x_m03 = waves[0][0]
    frames = enh._pad_frames(enh.frames_for(x_m03))
    t_true = enh.frames_for(x_m03).shape[0]
    batch = jnp.asarray(np.stack([frames] * batch_size), np.float32)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch_size,) + a.shape),
        enh.initial_state())
    tv = jnp.full((batch_size,), t_true, jnp.int32)
    ys, _ = enh._block_run_batch(batch, states, enh.win, tv)
    jax.block_until_ready(ys)
    n_rep = 12
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            ys, _ = enh._block_run_batch(batch, states, enh.win, tv)
        float(jnp.sum(ys))
        windows.append((time.perf_counter() - t0) / n_rep)
    audio_s = batch_size * len(x_m03) / fs
    start = delay * shift
    emit = np.asarray(ys)[0, start: start + (t_true - delay) * shift]
    outs = [enhanced_quantize(emit).astype(np.float64),
            enh.enhance(waves[1][0]).astype(np.float64)]
    row = {"fwd": fwd, "inv": inv,
           "audio_s_per_s": round(audio_s / min(windows), 1)}
    corrs = []
    for i, (name, _, _) in enumerate(fixtures):
        yq, g = outs[i], waves[i][1]
        n = min(len(yq), len(g))
        corr = float(np.corrcoef(yq[:n], g[:n])[0, 1])
        corrs.append(corr)
        row[name] = {"corr": round(corr, 4),
                     "lsd_db": round(log_spectral_distance(g[:n], yq[:n],
                                                           fs), 2)}
    row["min_corr"] = round(min(corrs), 4)
    rows.append(row)
    print(json.dumps(row), flush=True)

stft_mod.DFT_PRECISION = "highest"
stft_mod.IDFT_PRECISION = None
json.dump(rows, open("experiments/dft_prec_asym_out.json", "w"), indent=1)
