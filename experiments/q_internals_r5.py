"""r5: decompose the whole-block Q's 2.9 ms — GEMMs vs center-gather vs
elementwise tail — by monkeypatching q_block variants into the headline
plan.  Writes experiments/q_internals_r5_out.json."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import se_snmf_nat_tpu.enhance.blk_sparse as bs
from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.headline import HEADLINE_PLAN, HEADLINE_BATCH
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.io.wavio import enhanced_quantize, read_wav_int16
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

orig_maker = bs.make_block_sparsity_q_block


def variant_maker(mode):
    def make(k_block, *, n_bins, p_len_k, p_len_l, dc_bin, gap, alpha_p,
             cumsum=False):
        half = p_len_k // 2
        gap2 = (gap - 1) // 2
        sqrt_n = float(np.sqrt(p_len_k * p_len_l))
        ks = bs._centers(n_bins, p_len_k, dc_bin, gap)
        c_idx = np.arange(p_len_l + k_block)[:, None]
        j_idx = np.arange(k_block)[None, :]
        w_time = ((c_idx >= j_idx + 1) & (c_idx <= j_idx + p_len_l))
        f_idx = np.arange(n_bins)[:, None]
        w_freq = ((f_idx >= ks[None, :] - half)
                  & (f_idx <= ks[None, :] + half - 1))
        j = np.arange(n_bins)
        ci = np.clip(np.round((j - (ks[0] - 1)) / gap).astype(int), 0,
                     len(ks) - 1)
        covered = np.abs(j - ks[ci] + 1) <= gap2
        wf_bins = w_freq[:, ci] * covered[None, :]   # (F, F) one-hot bands

        def q_block(snr_cols, r_ring, ls, n_valid):
            dtype = snr_cols.dtype
            wt = jnp.asarray(w_time, dtype)
            wf = jnp.asarray(w_freq, dtype)
            ext = jnp.concatenate([r_ring, snr_cols.T], axis=1)
            if mode == "nogemm":
                rs = ext[:, :k_block] * 1.001
                rq = rs
                l1 = rs.T[:, : len(ks)] + 1.0
                l2 = l1 + 0.5
            else:
                rs = ext @ wt
                rq = (ext * ext) @ wt
                l1 = rs.T @ wf
                l2 = jnp.sqrt(rq.T @ wf)
            if mode == "onehot":
                wb = jnp.asarray(wf_bins, dtype)
                l1b = rs.T @ wb
                l2b = jnp.sqrt(rq.T @ wb)
                p_tmp = (sqrt_n - l1b / jnp.maximum(l2b, 1e-30)) \
                    / (sqrt_n - 1.0)
                p_val = alpha_p * 0.1 + (1.0 - alpha_p) * p_tmp
                q = jnp.where(jnp.asarray(covered)[None, :], p_val,
                              jnp.asarray(0.1, dtype))
            else:
                p_tmp = (sqrt_n - l1 / l2) / (sqrt_n - 1.0)
                p_val = alpha_p * 0.1 + (1.0 - alpha_p) * p_tmp
                if mode == "nosel":
                    q = jnp.broadcast_to(p_val[:, :1] * 0.9,
                                         (k_block, n_bins))
                else:
                    q = jnp.where(jnp.asarray(covered)[None, :],
                                  p_val[:, jnp.asarray(ci)],
                                  jnp.asarray(0.1, dtype))
            q = q.at[:, : p_len_k - 1].set(
                q[:, p_len_k + dc_bin - 1][:, None])
            q_init = jnp.full((n_bins,), 0.1, dtype).at[:dc_bin].set(0.0)
            q = jnp.where((ls > p_len_l)[:, None], q, q_init[None, :])
            q = q.at[:, :dc_bin].set(0.0)
            ring_new = jax.lax.dynamic_slice_in_dim(ext, n_valid,
                                                    p_len_l, 1)
            return q, ring_new
        return q_block
    return make


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
for mode in ("orig", "nogemm", "nosel", "onehot"):
    bs.make_block_sparsity_q_block = (orig_maker if mode == "orig"
                                      else variant_maker(mode))
    try:
        enh = SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft,
                           noise.b_dft, dtype=jnp.float32, **HEADLINE_PLAN)
    finally:
        bs.make_block_sparsity_q_block = orig_maker
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
    if mode in ("orig", "onehot"):       # quality only for real candidates
        start = cfg.delay * s.frameshift
        emit = np.asarray(ys)[0, start: start + (t_true - cfg.delay)
                              * s.frameshift]
        outs = [enhanced_quantize(emit).astype(np.float64),
                enh.enhance(waves[1][0]).astype(np.float64)]
        for i, (fname, _, _) in enumerate(fixtures):
            yq, g = outs[i], waves[i][1]
            n = min(len(yq), len(g))
            row[fname] = round(float(np.corrcoef(yq[:n], g[:n])[0, 1]), 4)
    out[mode] = row
    print(mode, row, flush=True)
with open("experiments/q_internals_r5_out.json", "w") as f:
    json.dump(out, f, indent=1)
