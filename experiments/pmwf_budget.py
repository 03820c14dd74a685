"""r5 multichannel budget (VERDICT r4 #3): decompose the streaming-PMWF
frame step, measure the whole-utterance fast plan, and re-sweep lane
scaling.  Writes experiments/pmwf_budget_out.json.

Methodology: chained calls with rotating inputs, scalar fetch closes each
window (CLAUDE.md tunnel-trap discipline).  Knockouts replace ONE stage of
the scan step with a near-free stand-in while keeping all data
dependences, so stage cost = full - knockout (the same protocol as the r4
block-plan budget in BASELINE.md).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.dsp.stft import stream_frames
from se_snmf_nat_tpu.dsp.windows import sqrt_hann_periodic
from se_snmf_nat_tpu.io.wavio import read_wav_int16
from se_snmf_nat_tpu.multichannel import (
    PmwfParams, make_pmwf_batch_run, make_pmwf_batch_run_fast,
    pmwf_stream_init, window_cov)
from se_snmf_nat_tpu.multichannel.pmwf import pmwf_filters
from se_snmf_nat_tpu.multichannel.streaming import (
    PmwfStreamState, _analysis_one, _synthesis_one)

cfg = default_config()
s = cfg.signal
p = PmwfParams()
x, fs = read_wav_int16("/root/reference/wav/M03_423C0213_STR.CH6.wav")
ch6 = np.stack([np.roll(x, 31 * c) for c in range(6)])
lane_frames = np.stack([
    stream_frames(ch, s.framelength, s.frameshift, n_flush=cfg.delay + 1)
    for ch in ch6])
audio_s = len(x) / fs
win = jnp.asarray(sqrt_hann_periodic(s.framelength), jnp.float32)


def knockout_step(mode):
    """make_pmwf_stream_step with one stage replaced by a cheap stand-in."""
    def step(state, y_t):
        y_win = jnp.concatenate([state.y_win[:, :, 1:], y_t[:, :, None]],
                                axis=2)
        l = state.l + 1
        if mode == "no_cov":
            # stand-in keeps the data dependence at ~1/25 the terms
            r = jnp.einsum("cf,df->fcd", y_t, jnp.conj(y_t),
                           precision=jax.lax.Precision.HIGH)
        else:
            r = window_cov(y_win, p.m_nbr)
        ycov = state.ycov + r
        ycov = jnp.where(l % p.norm_period == 0,
                         ycov / (p.norm_period - 1), ycov)
        ncov = jnp.where(l <= p.init_n_len, ycov, state.ncov)
        ecov = ycov - ncov
        if mode == "no_solve":
            h = jnp.swapaxes(ecov, 1, 2) / 1e9   # skip Cholesky+normalize
        else:
            h = pmwf_filters(ncov, ecov, p.beta, p.diag_load)
        center = y_win[:, :, p.l_nbr]
        if mode == "no_apply":
            d = center + jnp.real(h[:, 0, 0])[None, :] * 0j
        else:
            d = jnp.einsum("fjc,cf->jf", jnp.conj(h), center)
        return PmwfStreamState(y_win=y_win, ycov=ycov, ncov=ncov, l=l), d
    return step


def run_of(step_fn):
    @jax.jit
    def run(frames, state0):
        y = _analysis_one(frames.astype(jnp.float32), win, s, jnp.complex64)
        state, d_seq = jax.lax.scan(step_fn, state0, jnp.swapaxes(y, 0, 1))
        return _synthesis_one(d_seq, win, s, jnp.float32), state
    return jax.jit(jax.vmap(run, in_axes=(0, 0)))


def time_plan(batch_run, b_lanes, reps=3, inner=6):
    frames_b = jnp.asarray(np.stack([lane_frames] * b_lanes), jnp.float32)
    st0 = pmwf_stream_init(p, 6, s.n_bins, jnp.complex64)
    states = jax.jit(lambda st: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (b_lanes,) + a.shape), st))(st0)
    ys, _ = batch_run(frames_b, states)
    jax.block_until_ready(ys)
    variants = [frames_b * (1.0 + 1e-4 * i) for i in range(inner)]
    laps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for v in variants:
            ys, _ = batch_run(v, states)
        float(jnp.sum(ys))
        laps.append((time.perf_counter() - t0) / inner)
    return min(laps), bool(np.isfinite(np.asarray(ys)).all())

out = {"audio_s_per_lane": round(audio_s, 2),
       "n_frames": int(lane_frames.shape[1])}

# ---- scan-plan budget at 8 lanes --------------------------------------
budget = {}
for mode in ("full", "no_cov", "no_solve", "no_apply"):
    el, finite = time_plan(run_of(knockout_step(mode)), 8)
    budget[mode] = {"call_s": round(el, 4),
                    "au_s_per_s": round(8 * audio_s / el, 1),
                    "finite": finite}
    print("scan", mode, budget[mode], flush=True)
out["scan_budget_8lane"] = budget

# ---- fast plan: lane sweep -------------------------------------------
fast_rows = {}
for b in (1, 8, 16, 32):
    el, finite = time_plan(make_pmwf_batch_run_fast(cfg, p, jnp.float32), b)
    fast_rows[str(b)] = {"call_s": round(el, 4),
                         "au_s_per_s": round(b * audio_s / el, 1),
                         "finite": finite}
    print("fast", b, fast_rows[str(b)], flush=True)
out["fast_plan_lanes"] = fast_rows

# ---- scan plan lane sweep (context for the scaling story) -------------
scan_rows = {}
for b in (8, 32):
    el, finite = time_plan(make_pmwf_batch_run(cfg, p, jnp.float32), b)
    scan_rows[str(b)] = {"call_s": round(el, 4),
                         "au_s_per_s": round(b * audio_s / el, 1),
                         "finite": finite}
    print("scanlanes", b, scan_rows[str(b)], flush=True)
out["scan_plan_lanes"] = scan_rows

print(json.dumps(out, indent=1))
with open("experiments/pmwf_budget_out.json", "w") as f:
    json.dump(out, f, indent=1)
