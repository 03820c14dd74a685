"""r5 block-plan budget at the CURRENT headline (VERDICT r4 #2): knockout
decomposition of the 16.3k au-s/s call, using the _knockout hook in
stream/block_adaptive.make_block_step.  Writes
experiments/block_budget_r5_out.json.

Each variant replaces ONE stage with a near-free stand-in (data deps
kept), so stage cost = full - knockout.  Same measurement protocol as
bench --pareto (all-M03 B=64 batch, chained windows, scalar fetch)."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.headline import HEADLINE_PLAN, HEADLINE_BATCH
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.io.wavio import read_wav_int16
from se_snmf_nat_tpu.stream.block_adaptive import make_block_adaptive_run
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

cfg = default_config()
speech, noise = load_reference_speech_noise(cfg.sep.r_d)
x, fs = read_wav_int16("/root/reference/wav/M03_423C0213_STR.CH6.wav")
B = HEADLINE_BATCH
plan = dict(HEADLINE_PLAN)
enh = SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft,
                   noise.b_dft, dtype=jnp.float32, **plan)
frames = enh._pad_frames(enh.frames_for(x))
t_true = enh.frames_for(x).shape[0]
batch = jnp.asarray(np.stack([frames] * B), np.float32)
states = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                      enh.initial_state())
tv = jnp.full((B,), t_true, jnp.int32)
audio_s = B * len(x) / fs

out = {"plan": {k: v for k, v in plan.items()}, "batch": B,
       "frames_padded": int(frames.shape[0])}
for mode in (None, "refit", "q", "gain", "solve1", "rings", "noscan"):
    run = make_block_adaptive_run(
        cfg, speech.b_dft, noise.b_dft, speech.b_dft, noise.b_dft,
        jnp.float32, plan["block_adapt"], plan["block_iter_cap"],
        dft_matmul=plan["dft_matmul"],
        refit_iter_cap=plan.get("block_refit_cap", 0),
        fixed_iter=plan.get("block_fixed_iter", False),
        dft_precision=plan.get("dft_precision"),
        idft_precision=plan.get("idft_precision"),
        _knockout=mode)
    runb = jax.jit(jax.vmap(run, in_axes=(0, 0, None, 0)))
    ys, _ = runb(batch, states, enh.win, tv)
    jax.block_until_ready(ys)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(12):
            ys, _ = runb(batch, states, enh.win, tv)
        float(jnp.sum(ys))
        windows.append((time.perf_counter() - t0) / 12)
    el = min(windows)
    key = mode or "full"
    out[key] = {"call_ms": round(el * 1e3, 2),
                "au_s_per_s": round(audio_s / el, 1)}
    print(key, out[key], flush=True)

full = out["full"]["call_ms"]
out["stage_ms"] = {k: round(full - out[k]["call_ms"], 2)
                   for k in ("refit", "q", "gain", "solve1", "rings", "noscan")}
print(json.dumps(out, indent=1))
with open("experiments/block_budget_r5_out.json", "w") as f:
    json.dump(out, f, indent=1)
