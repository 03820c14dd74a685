"""Headline benchmark: audio-seconds/s/chip for the full adaptive
SNMF-NAT enhancement pipeline (north-star CHiME config) on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the driver target of 100x real-time per
chip (BASELINE.md; the reference itself is a ~1x real-time CPU design, so
vs_baseline = 1.0 == 100x the reference's real-time budget).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from se_snmf_nat_tpu.config import default_config
    from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
    from se_snmf_nat_tpu.io.wavio import read_wav_int16

    cfg = default_config()
    speech, noise = load_reference_speech_noise(cfg.sep.r_d)
    x, fs = read_wav_int16("/root/reference/wav/M03_423C0213_STR.CH6.wav")

    # production throughput plan: the Pareto pick from `bench --pareto`
    # (PARETO_r04.json) — the fastest block-adaptive point whose golden
    # corr clears the pick policy on BOTH fixtures (>=0.004 margin over
    # the 0.99 gate AND worst-fixture corr >= 0.9955).  Defined ONCE in
    # headline.py; `bench --scaling`/`--campaign` build the identical
    # enhancer.  dft_matmul: STFT/iSTFT as ONE stacked MXU matmul per
    # direction with the phase carried as a unit phasor (no
    # arctan2/cos/sin passes), analysis at 'high' / synthesis at
    # 'default' precision — see dsp/stft.py and headline.py for the
    # measured per-direction precision asymmetry.
    from se_snmf_nat_tpu.headline import (
        HEADLINE_BATCH, HEADLINE_PLAN, build_headline_enhancer)

    enh = build_headline_enhancer(cfg)
    true_frames = enh.frames_for(x)
    n_true = true_frames.shape[0]
    frames = enh._pad_frames(true_frames)

    batch_size = HEADLINE_BATCH
    batch = jnp.asarray(np.stack([frames] * batch_size), jnp.float32)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch_size,) + a.shape),
        enh.initial_state())

    # true (pre-padding) frame count: bucket-padding frames run masked in
    # production, so the metric must not count them as processed audio
    t_valid = jnp.full((batch_size,), n_true, jnp.int32)

    # compile + warmup
    ys, _ = enh._block_run_batch(batch, states, enh.win, t_valid)
    jax.block_until_ready(ys)

    # pipelined reps (dispatches overlap, as a production batch stream
    # would); 20 reps + best-of-3 windows because the tunneled chip's
    # dispatch jitters run to run (measured 3127-3605 au-s/s at mean-of-5)
    n_rep = 20
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            ys, _ = enh._block_run_batch(batch, states, enh.win, t_valid)
        # scalar fetch closes the window (belt-and-braces: on this tunnel
        # block_until_ready alone has been seen not to round-trip for
        # small programs; the large pipeline blocks correctly, verified
        # by identical-vs-rotating-input cross-checks)
        float(jnp.sum(ys))
        windows.append((time.perf_counter() - t0) / n_rep)
    elapsed_single = min(windows)

    # ---- paired dispatch (r5): the profiler trace puts device time at
    # ~11.4 ms/call vs ~13.4 ms wall — ~2 ms of per-call dispatch gap
    # survives even chained dispatch on this tunnel.  Folding TWO B=64
    # batches into one jitted program recovers most of it (+4%) while
    # keeping the B=64 tiling the B-sweep picked (B=128 as one vmap
    # REGRESSES — this is two sequential B=64 programs in one dispatch,
    # not a wider batch; per-lane outputs are the same program, gated in
    # tests/test_engine.py).  quad buys nothing further (measured).
    @jax.jit
    def run_pair(stack, states, win, tv):
        outs = []
        for i in range(2):
            y, _ = enh._block_run_batch(stack[i], states, win, tv)
            outs.append(y)
        return jnp.stack(outs)

    stack2 = jnp.stack([batch, batch * jnp.float32(1.0001)])
    ys2 = run_pair(stack2, states, enh.win, t_valid)
    jax.block_until_ready(ys2)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rep // 2):
            ys2 = run_pair(stack2, states, enh.win, t_valid)
        float(jnp.sum(ys2))
        windows.append((time.perf_counter() - t0) / (n_rep // 2) / 2)
    elapsed = min(windows)
    if elapsed > elapsed_single:      # tunnel jitter guard: keep the best
        elapsed = elapsed_single

    audio_seconds = batch_size * len(x) / fs
    value = audio_seconds / elapsed
    value_single_dispatch = audio_seconds / elapsed_single
    n_chips = max(len(jax.devices()), 1)
    value_per_chip = value / n_chips

    # ---- MU-solver kernel metrics (BASELINE.md "MU iterations/s tracked;
    # STFT and MU-matmul kernels at speed-of-light").  The workhorse kernel
    # is the batched per-column H-solve (nmf/solver.snmf_h_solve_columns),
    # the TPU realization of sparse_nmf.m:186-285's per-frame m=1 solves;
    # measure it on the real bench spectrogram at production shapes.
    from se_snmf_nat_tpu.dsp.stft import analysis_frames
    from se_snmf_nat_tpu.nmf.solver import SnmfParams, snmf_h_solve_columns

    s = cfg.signal
    mag, _ = analysis_frames(
        jnp.asarray(frames, jnp.float32), enh.win, s.fftlength, s.pow,
        s.dc_bin, s.nonzerofloor, s.preemph)
    v = jnp.tile(mag[:n_true].T, (1, batch_size))       # (F, B*T) columns
    w_sep = jnp.concatenate(
        [jnp.asarray(speech.b_dft, jnp.float32),
         jnp.asarray(noise.b_dft, jnp.float32)], axis=1)  # (513, 200)
    r = w_sep.shape[1]
    params = SnmfParams(beta=cfg.nmf.beta, sparsity=float(cfg.nmf.sparsity),
                        max_iter=cfg.nmf.max_iter, conv_eps=cfg.nmf.conv_eps,
                        flr=1e-9, precision=cfg.runtime.matmul_precision)
    h0 = jnp.full((r, v.shape[1]), 0.5, jnp.float32)

    # chained timing: each solve's OUTPUT (renormalized into the h0 range)
    # seeds the next solve's input, and a scalar fetch closes the chain —
    # repeated identical dispatches of device programs get deduped/served
    # from cache somewhere in the tunnel path and read ~0 ms (see
    # CLAUDE.md "tunnel timing traps"), so unchained reps overstate the
    # kernel rate (~28% at this shape).  Each window starts from a
    # DIFFERENT h0 so no window replays another's dispatch sequence, and
    # the kernel-rate measure runs at conv_eps=0 (exactly max_iter loop
    # trips per call — a deterministic iteration count; the production
    # early-stop path is what the headline pipeline above exercises).
    import dataclasses

    params_fixed = dataclasses.replace(params, conv_eps=0.0)

    def _chain(h):
        return 0.3 + 0.4 * h / (jnp.mean(h) + 1e-6)

    h0s = [h0 * jnp.float32(1.0 + 0.05 * k) for k in range(6)]
    res = snmf_h_solve_columns(v, w_sep, h0s[-1], params_fixed)  # compile
    float(jnp.sum(res.h))
    windows = []
    for wdx in range(5):
        h = h0s[wdx]
        t0 = time.perf_counter()
        for _ in range(8):
            h = _chain(snmf_h_solve_columns(v, w_sep, h, params_fixed).h)
        float(jnp.sum(h))
        windows.append((time.perf_counter() - t0) / 8)
    mu_elapsed = min(windows)

    # ---- MU roofline (BASELINE.md "speed-of-light" proof).  Ceiling =
    # the same while-loop stripped to its two GEMMs — the irreducible
    # compute + data movement of one MU trip at identical shapes and
    # precision.  The chain itself runs at ~76% of the TILE-PADDED MXU
    # ceiling (F=513 pads to 640 rows, r=200 to 256 — a 1.60x padding
    # factor inherent to the reference's problem sizes); its measured
    # trip time also PROVES XLA keeps the (F,n) intermediate
    # VMEM-resident (a full HBM round-trip of all operands would floor
    # the trip at 155 us vs the ~98 us measured).  mu_roofline_frac =
    # full-solver rate / GEMM-chain rate; the full analysis lives in
    # BASELINE.md ("MU H-solve speed-of-light analysis").
    from jax import lax as _lax

    w_norm = w_sep / jnp.sqrt(jnp.sum(w_sep * w_sep, axis=0))[None, :]

    @jax.jit
    def gemm_chain(h):
        def body(hh, _):
            g = jnp.matmul(w_norm, hh, precision=params.lax_precision)
            g = jnp.matmul(w_norm.T, g, precision=params.lax_precision)
            return g * jnp.float32(9.5e-3), None
        hh, _ = _lax.scan(body, h, None, length=params.max_iter)
        return hh

    hc = gemm_chain(h0s[0])                              # compile
    float(jnp.sum(hc))
    windows = []
    for wdx in range(5):
        h = h0s[wdx]
        t0 = time.perf_counter()
        for _ in range(8):
            h = _chain(gemm_chain(h))
        float(jnp.sum(h))
        windows.append((time.perf_counter() - t0) / 8)
    mu_ceiling_elapsed = min(windows)
    mu_roofline_frac = mu_ceiling_elapsed / mu_elapsed

    n_loop_iters = params.max_iter                      # exact at eps=0
    n_cols = v.shape[1]
    # a reference "MU iteration" is one H update of one frame column
    # (sparse_nmf.m:186-285 at m=1); the batched loop updates every column
    # each trip, so column-iterations = trips x columns
    mu_iters_per_s = n_loop_iters * n_cols / mu_elapsed
    # per loop trip: dmh = W^T(V/Lambda) and Lambda = W@H — two (F,r)x(r,n)
    # GEMM-class contractions => 2 * (2*F*r*n) FLOPs (elementwise excluded)
    f_bins = v.shape[0]
    flops_per_iter = 2 * (2.0 * f_bins * r * n_cols)
    achieved_flops = n_loop_iters * flops_per_iter / mu_elapsed
    # v5e peak: 197 TFLOP/s bf16 MXU; f32 MU runs at the default-precision
    # bf16x3 path, so quote utilization against the bf16 peak
    peak_flops = 197e12 if jax.devices()[0].platform != "cpu" else 1e12
    mu_gemm_mfu = achieved_flops / (peak_flops * n_chips)

    # ---- STFT kernel roofline (BASELINE.md "STFT ... at speed-of-light").
    # The production analysis transform runs on the MXU as ONE stacked
    # matmul (dsp/stft.dft_matrices_stacked; XLA's TPU rfft measured 2x
    # slower AND further from the f64 transform), emitting mag + the
    # unit-phasor phase; quote both achieved FLOP/s against the MXU peak
    # and bytes/s against HBM peak.  Timed here at the module-default
    # 'highest' precision (the transform's own accuracy anchor); the
    # headline plan opts the pipeline into 'high'/'default' per direction.
    # Chained timing: each call's input is scaled by a scalar derived from
    # the previous call's output so no dispatch repeats (tunnel dedupe
    # trap), and both outputs (mag + phase) are materialized, as the
    # pipeline uses them.
    # The per-dispatch work must dwarf the tunnel's ~ms dispatch floor, so
    # the chain runs INSIDE one program: a lax.scan whose carry is the full
    # (mag, phase) pair — materialized every trip as the loop carry, and
    # each trip's input is scaled by a scalar read from the previous trip's
    # carry, so no trip's FFT can be elided or deduped.
    stft_frames = jnp.asarray(
        np.tile(np.asarray(frames, np.float32), (batch_size, 1)))
    n_inner = 32

    @jax.jit
    def stft_chain(fr, mag0, ph0):
        def body(carry, _):
            mag_p, ph_p = carry
            # chain through a LIVE bin past the DC cut (bins < dc_bin are
            # the constant nonzerofloor) and make the perturbation large
            # enough to change the f32 input: sin() of the running
            # magnitude is bounded yet varies chaotically trip to trip, so
            # no two scan trips — and no two outer dispatches, since the
            # carry feeds back — compute the same transform
            scale = 1.0 + 1e-3 * jnp.sin(mag_p[0, s.dc_bin]
                                         + ph_p[0, s.dc_bin])
            return analysis_frames(fr * scale, enh.win, s.fftlength, s.pow,
                                   s.dc_bin, s.nonzerofloor, s.preemph,
                                   dft_matmul=True), None
        (mg, ph), _ = jax.lax.scan(body, (mag0, ph0), None, length=n_inner)
        return mg, ph

    mag0 = jnp.zeros((stft_frames.shape[0], s.n_bins), jnp.float32)
    # the matmul analysis path returns the phase as a (T, 2F) unit phasor
    # ([cos | sin], dsp/stft.analysis_frames) — size the carry to match
    ph0 = jnp.zeros((stft_frames.shape[0], 2 * s.n_bins), jnp.float32)
    mg, ph = stft_chain(stft_frames, mag0, ph0)           # compile
    jax.block_until_ready((mg, ph))
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            mg, ph = stft_chain(stft_frames, mg, ph)
        float(jnp.sum(mg[0]) + jnp.sum(ph[0]))
        windows.append((time.perf_counter() - t0) / 4)
    stft_elapsed = min(windows)
    n_stft_frames = stft_frames.shape[0] * n_inner
    stft_frames_per_s = n_stft_frames / stft_elapsed
    # two (T,640)x(640,F) matmuls per frame batch
    stft_flops_per_frame = 2 * (2.0 * stft_frames.shape[1] * s.n_bins)
    stft_tflops = stft_frames_per_s * stft_flops_per_frame / 1e12
    # minimum HBM traffic: read the time frames, write mag**pow + the
    # (2F) unit-phasor phase
    bytes_per_frame = 4 * (stft_frames.shape[1] + 3 * (s.fftlength // 2 + 1))
    stft_gbps = stft_frames_per_s * bytes_per_frame / 1e9
    # v5e HBM peak 819 GB/s
    peak_bw = 819e9 if jax.devices()[0].platform != "cpu" else 50e9
    stft_hbm_frac = stft_gbps * 1e9 / (peak_bw * n_chips)

    print(json.dumps({
        "metric": "audio_seconds_per_s_per_chip",
        "value": round(value_per_chip, 2),
        "unit": "audio-s/s/chip (adaptive SNMF-NAT enhancement, "
                f"block-adaptive K={HEADLINE_PLAN['block_adapt']} "
                f"cap{HEADLINE_PLAN['block_iter_cap']} "
                f"bucket{HEADLINE_PLAN['frame_bucket']}, phasor MXU-DFT "
                f"{HEADLINE_PLAN.get('dft_precision') or 'highest'}/"
                f"{HEADLINE_PLAN.get('idft_precision') or 'highest'}, "
                f"f32, B={batch_size}, pair-dispatch)",
        "vs_baseline": round(value_per_chip / 100.0, 3),
        "audio_s_per_s_single_dispatch": round(
            value_single_dispatch / n_chips, 2),
        "mu_iters_per_s": round(mu_iters_per_s, 0),
        "mu_gemm_tflops": round(achieved_flops / 1e12, 2),
        "mu_gemm_mfu": round(mu_gemm_mfu, 4),
        "mu_ceiling_tflops": round(
            n_loop_iters * flops_per_iter / mu_ceiling_elapsed / 1e12, 2),
        "mu_roofline_frac": round(mu_roofline_frac, 4),
        "mu_solver_shape": f"F={f_bins} r={r} cols={n_cols} iters={n_loop_iters}",
        "stft_frames_per_s": round(stft_frames_per_s, 0),
        "stft_tflops": round(stft_tflops, 2),
        "stft_hbm_gbps": round(stft_gbps, 1),
        "stft_hbm_frac": round(stft_hbm_frac, 4),
    }))


if __name__ == "__main__":
    main()
