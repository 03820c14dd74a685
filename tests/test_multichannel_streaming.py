"""Streaming multichannel path (VERDICT r3 #1): push-based PMWF session vs
the one-shot offline scan of the same step (bit-exact), multi-lane batch
parity, reference covariance semantics (init freeze, periodic normalize),
enhancement property on a synthetic directional mixture, and online NTF
channel-loading convergence to the batch solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.multichannel import (
    NtfStreamingSession, PmwfParams, PmwfStreamingSession,
    make_pmwf_batch_run, make_pmwf_stream_step, make_pmwf_streaming_run,
    ntf_solve, pmwf_stream_init, pmwf_streaming_enhance, window_cov)
from se_snmf_nat_tpu.multichannel.fixture import segsnr_vs_source, synth_mixture
from se_snmf_nat_tpu.multichannel.ntf import default_c_init


C = 4


@pytest.fixture(scope="module")
def mix():
    return synth_mixture(n_ch=C)


def test_streaming_session_bit_identical_to_offline(mix):
    x, _ = mix
    x = x[:, :12000]
    want = pmwf_streaming_enhance(x, dtype=jnp.float64)
    sess = PmwfStreamingSession(n_ch=C, block_frames=8, dtype=jnp.float64)
    got = np.concatenate([sess.push(x), sess.flush()], axis=1)
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
    assert abs(got.shape[1] - want.shape[1]) <= 2 * 160


def test_streaming_irregular_chunks(mix):
    """Mic-style irregular chunk sizes give the same stream."""
    x, _ = mix
    x = x[:, :9600]
    want = pmwf_streaming_enhance(x, dtype=jnp.float64)
    sess = PmwfStreamingSession(n_ch=C, block_frames=4, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    parts, i = [], 0
    while i < x.shape[1]:
        n = int(rng.integers(1, 900))
        parts.append(sess.push(x[:, i: i + n]))
        i += n
    parts.append(sess.flush())
    got = np.concatenate([p for p in parts if p.shape[1]], axis=1)
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_state_carry_continues_stream(mix):
    """A session seeded with a previous stream's state continues it exactly
    (the reference's persistent g struct across calls)."""
    x, _ = mix
    x = x[:, :12800]
    half = 6400
    y_full, st_full = pmwf_streaming_enhance(x, dtype=jnp.float64,
                                             return_state=True)
    cfg = default_config()
    run = make_pmwf_streaming_run(cfg, PmwfParams(), jnp.float64)
    from se_snmf_nat_tpu.dsp.stft import stream_frames
    s = cfg.signal
    fr = np.stack([stream_frames(ch, s.framelength, s.frameshift,
                                 n_flush=cfg.delay + 1) for ch in x])
    st0 = pmwf_stream_init(PmwfParams(), C, s.n_bins, jnp.complex128)
    k = 40
    _, st_a = run(jnp.asarray(fr[:, :k], jnp.float64), st0)
    _, st_b = run(jnp.asarray(fr[:, k:], jnp.float64), st_a)
    assert int(st_b.l) == fr.shape[1]
    np.testing.assert_allclose(np.asarray(st_b.ycov),
                               np.asarray(st_full.ycov), rtol=1e-12)


def test_ncov_freezes_after_init(mix):
    """Reference W-flag semantics: Ncov tracks Ycov through init_n_len
    frames then never changes (NTF_sep_event_RT.m:91-96)."""
    x, _ = mix
    p = PmwfParams()
    cfg = default_config()
    s = cfg.signal
    run = make_pmwf_streaming_run(cfg, p, jnp.float64)
    from se_snmf_nat_tpu.dsp.stft import stream_frames
    fr = np.stack([stream_frames(ch, s.framelength, s.frameshift,
                                 n_flush=cfg.delay + 1)
                   for ch in x[:, :16000]])
    st0 = pmwf_stream_init(p, C, s.n_bins, jnp.complex128)
    _, st_init = run(jnp.asarray(fr[:, : p.init_n_len], jnp.float64), st0)
    np.testing.assert_array_equal(np.asarray(st_init.ncov),
                                  np.asarray(st_init.ycov))
    _, st_late = run(jnp.asarray(fr[:, p.init_n_len:], jnp.float64),
                     st_init)
    np.testing.assert_array_equal(np.asarray(st_late.ncov),
                                  np.asarray(st_init.ncov))
    assert not np.array_equal(np.asarray(st_late.ycov),
                              np.asarray(st_init.ncov))


def test_periodic_normalize_quirk():
    """The running Ycov divides IN PLACE by (norm_period-1) every
    norm_period frames (PMWF_sep_event_RT_CHiME.m:137-140)."""
    p = PmwfParams(norm_period=4, init_n_len=2)
    step = make_pmwf_stream_step(p)
    st = pmwf_stream_init(p, 2, 9, jnp.complex128)
    rng = np.random.default_rng(0)
    covs = []
    for l in range(1, 9):
        y = jnp.asarray(rng.standard_normal((2, 9))
                        + 1j * rng.standard_normal((2, 9)))
        st, _ = step(st, y)
        covs.append(np.asarray(st.ycov))
    # frame 4: previous sum + r, then / (norm_period-1)
    st2 = pmwf_stream_init(p, 2, 9, jnp.complex128)
    # recompute manually
    rng = np.random.default_rng(0)
    acc = np.zeros((9, 2, 2), complex)
    win = np.zeros((2, 9, 2 * p.l_nbr + 1), complex)
    for l in range(1, 9):
        y = rng.standard_normal((2, 9)) + 1j * rng.standard_normal((2, 9))
        win = np.concatenate([win[:, :, 1:], y[:, :, None]], axis=2)
        acc = acc + np.asarray(window_cov(jnp.asarray(win), p.m_nbr))
        if l % p.norm_period == 0:
            acc = acc / (p.norm_period - 1)
        np.testing.assert_allclose(covs[l - 1], acc, rtol=1e-9)


def test_batch_run_matches_single_lane(mix):
    """vmapped multi-lane == per-lane loop (value-identical)."""
    cfg = default_config()
    p = PmwfParams()
    s = cfg.signal
    from se_snmf_nat_tpu.dsp.stft import stream_frames
    lanes = []
    for seed in range(3):
        x, _ = synth_mixture(n=8000, n_ch=C, seed=seed)
        lanes.append(np.stack([
            stream_frames(ch, s.framelength, s.frameshift,
                          n_flush=cfg.delay + 1) for ch in x]))
    frames = jnp.asarray(np.stack(lanes), jnp.float64)
    st0 = pmwf_stream_init(p, C, s.n_bins, jnp.complex128)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (3,) + a.shape), st0)
    batch_run = make_pmwf_batch_run(cfg, p, jnp.float64)
    ys, _ = batch_run(frames, states)
    run = make_pmwf_streaming_run(cfg, p, jnp.float64)
    for i in range(3):
        yi, _ = run(frames[i], st0)
        np.testing.assert_array_equal(np.asarray(ys[i]), np.asarray(yi))


def test_streaming_pmwf_enhances(mix):
    """Property gate: on the directional mixture the streaming beamformer
    must raise the SNR vs the best input channel (speech-active region,
    against the known clean source)."""
    x, src = mix
    y = pmwf_streaming_enhance(x, dtype=jnp.float64, quantize=False)

    def best_corr(sig, ref, max_lag=800):
        """max |corr| over alignments (the beamformer output lags by the
        L-frame lookahead; channels carry inter-channel delays)."""
        best = 0.0
        for lag in range(0, max_lag, 20):
            a, b = sig[lag: lag + len(ref) - max_lag], ref[: len(ref) - max_lag - lag]
            n = min(len(a), len(b))
            c = abs(float(np.corrcoef(a[:n], b[:n])[0, 1]))
            best = max(best, c)
        return best

    act = slice(8000, min(y.shape[1], x.shape[1]) - 4000)
    ref = src[act]
    corr_in = max(best_corr(x[j, act], ref) for j in range(C))
    corr_out = best_corr(y[0, act], ref)
    assert corr_out > corr_in - 0.02, (corr_out, corr_in)
    # and it must actually suppress noise: output power in the noise-only
    # span is well below the input's
    noise_span = slice(1000, 5000)
    pw_in = (x[0, noise_span] ** 2).mean()
    pw_out = (y[0, noise_span] ** 2).mean()
    assert pw_out < 0.5 * pw_in, (pw_out, pw_in)


def test_ntf_online_converges_to_batch(mix):
    """On a stationary stream the warm-started per-block C-step converges
    to the batch ntf_solve loadings (cosine per column)."""
    rng = np.random.default_rng(5)
    c_ch, n_bins, k = 3, 24, 4
    b = rng.random((n_bins, k)) + 0.05
    c_true = rng.random((c_ch, k)) + 0.05
    m_blk, n_blocks = 16, 30
    a = rng.random((m_blk * n_blocks, k)) + 0.05
    s_full = np.einsum("ck,nk,mk->cnm", c_true, b, a)
    res = ntf_solve(jnp.asarray(s_full), jnp.asarray(b),
                    default_c_init(c_ch, k), jnp.ones((s_full.shape[2], k)),
                    sparsity=0.0, max_iter=300, conv_eps=0.0)
    sess = NtfStreamingSession(b, c_ch, sparsity=0.0, inner_iters=6,
                               dtype=jnp.float64)
    for i in range(n_blocks):
        sess.push_block(s_full[:, :, i * m_blk: (i + 1) * m_blk])
    c_on = sess.loadings
    c_batch = np.asarray(res.c)

    def cos(u, v):
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

    for j in range(k):
        assert cos(c_on[:, j], c_batch[:, j]) > 0.995, j


def test_multichannel_quality_pinned():
    """VERDICT r3 #7: the PMWF batteries on the package's synthetic
    multichannel fixture, gated against the recorded QUALITY_r04 values
    (measured 2026-08: best input 8.72 dB, offline PMWF 20.34 dB,
    streaming PMWF 17.52 dB segSNR vs the known source; 1 dB regression
    tolerance).  No reference golden exists (the PMWF path is dead code in
    the reference), so this synthetic pin is the regression battery."""
    from se_snmf_nat_tpu.multichannel import PmwfEnhancer

    x, src = synth_mixture(n_ch=6)
    seg_in = max(segsnr_vs_source(x[j], src) for j in range(6))
    y_off = PmwfEnhancer(dtype=jnp.float32).enhance(x, quantize=False)
    seg_off = segsnr_vs_source(y_off[0], src)
    y_str = pmwf_streaming_enhance(x, dtype=jnp.float32, quantize=False)
    seg_str = segsnr_vs_source(y_str[0], src)
    assert 8.0 < seg_in < 10.0, seg_in          # fixture itself is pinned
    assert seg_off >= 19.3, seg_off             # recorded 20.34
    assert seg_str >= 16.5, seg_str             # recorded 17.52
    assert seg_off - seg_in >= 10.0
    assert seg_str - seg_in >= 7.0


def test_pmwf_state_checkpoint_roundtrip(mix, tmp_path):
    """An interrupted multichannel stream resumes bit-identically from an
    atomic npz checkpoint (the EngineState treatment extended to the
    PMWF covariance state)."""
    from se_snmf_nat_tpu.runtime.checkpoint import (load_pmwf_state,
                                                    save_pmwf_state)
    x, _ = mix
    y_full, st_full = pmwf_streaming_enhance(x[:, :12800], dtype=jnp.float64,
                                             return_state=True)
    cfg = default_config()
    run = make_pmwf_streaming_run(cfg, PmwfParams(), jnp.float64)
    from se_snmf_nat_tpu.dsp.stft import stream_frames
    s = cfg.signal
    fr = np.stack([stream_frames(ch, s.framelength, s.frameshift,
                                 n_flush=cfg.delay + 1)
                   for ch in x[:, :12800]])
    st0 = pmwf_stream_init(PmwfParams(), C, s.n_bins, jnp.complex128)
    _, st_a = run(jnp.asarray(fr[:, :40], jnp.float64), st0)
    save_pmwf_state(tmp_path / "pmwf.npz", st_a)
    st_r = load_pmwf_state(tmp_path / "pmwf.npz", jnp.float64)
    for f in st_a._fields:
        np.testing.assert_array_equal(np.asarray(getattr(st_a, f)),
                                      np.asarray(getattr(st_r, f)))
    _, st_b = run(jnp.asarray(fr[:, 40:], jnp.float64), st_r)
    np.testing.assert_array_equal(np.asarray(st_b.ycov),
                                  np.asarray(st_full.ycov))


def _frames_of(x, cfg):
    from se_snmf_nat_tpu.dsp.stft import stream_frames
    s = cfg.signal
    return np.stack([stream_frames(ch, s.framelength, s.frameshift,
                                   n_flush=cfg.delay + 1) for ch in x])


def test_fast_plan_matches_scan_plan_x64(mix):
    """The whole-utterance batched plan (make_pmwf_streaming_run_fast)
    reproduces the scan plan: identical int16-written output and matching
    carried state at x64, including the init-freeze crossing and periodic
    normalize inside the call."""
    from se_snmf_nat_tpu.multichannel import (make_pmwf_streaming_run_fast)
    from se_snmf_nat_tpu.utils.matlab_compat import matlab_int16_write

    x, _ = mix
    x = x[:, :16000]
    cfg = default_config()
    p = PmwfParams()
    fr = _frames_of(x, cfg)
    st0 = pmwf_stream_init(p, C, cfg.signal.n_bins, jnp.complex128)
    run = make_pmwf_streaming_run(cfg, p, jnp.float64)
    fast = make_pmwf_streaming_run_fast(cfg, p, jnp.float64)
    y_w, st_w = run(jnp.asarray(fr, jnp.float64), st0)
    y_g, st_g = fast(jnp.asarray(fr, jnp.float64), st0)
    np.testing.assert_array_equal(matlab_int16_write(np.asarray(y_g)),
                                  matlab_int16_write(np.asarray(y_w)))
    np.testing.assert_allclose(np.asarray(st_g.ycov),
                               np.asarray(st_w.ycov), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_g.ncov),
                               np.asarray(st_w.ncov), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_g.y_win),
                               np.asarray(st_w.y_win), rtol=1e-12)
    assert int(st_g.l) == int(st_w.l)


def test_fast_plan_state_carry_chunks(mix):
    """Two chunked fast-plan calls == one whole call (y_win tail, Ycov,
    frozen-Ncov continuation across the call boundary)."""
    from se_snmf_nat_tpu.multichannel import make_pmwf_streaming_run_fast

    x, _ = mix
    x = x[:, :12800]
    cfg = default_config()
    p = PmwfParams()
    fr = _frames_of(x, cfg)
    st0 = pmwf_stream_init(p, C, cfg.signal.n_bins, jnp.complex128)
    fast = make_pmwf_streaming_run_fast(cfg, p, jnp.float64)
    y_full, st_full = fast(jnp.asarray(fr, jnp.float64), st0)
    # split INSIDE the init period so the freeze crossing spans calls
    for k in (7, 40):
        _, st_a = fast(jnp.asarray(fr[:, :k], jnp.float64), st0)
        _, st_b = fast(jnp.asarray(fr[:, k:], jnp.float64), st_a)
        np.testing.assert_allclose(np.asarray(st_b.ycov),
                                   np.asarray(st_full.ycov), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(st_b.ncov),
                                   np.asarray(st_full.ncov), rtol=1e-12)
        assert int(st_b.l) == int(st_full.l)


def test_fast_plan_f32_finite_and_close(mix):
    """f32 deployment gate: the fast plan stays finite on the coherent
    fixture and tracks the scan plan (cross-plan f32 drift is rounding-
    level, not trajectory-level — there is no adaptive feedback here)."""
    from se_snmf_nat_tpu.multichannel import make_pmwf_streaming_run_fast

    x, _ = mix
    x = x[:, :16000]
    cfg = default_config()
    p = PmwfParams()
    fr = _frames_of(x, cfg)
    st0 = pmwf_stream_init(p, C, cfg.signal.n_bins, jnp.complex64)
    run = make_pmwf_streaming_run(cfg, p, jnp.float32)
    fast = make_pmwf_streaming_run_fast(cfg, p, jnp.float32)
    y_w, _ = run(jnp.asarray(fr, jnp.float32), st0)
    y_g, _ = fast(jnp.asarray(fr, jnp.float32), st0)
    y_w, y_g = np.asarray(y_w), np.asarray(y_g)
    assert np.isfinite(y_g).all()
    c = np.corrcoef(y_w.ravel(), y_g.ravel())[0, 1]
    assert c > 0.9999, c


def test_streaming_enhance_fast_flag(mix):
    """pmwf_streaming_enhance(fast=True) routes through the batched plan
    and matches the scan plan's int16 output at x64."""
    x, _ = mix
    x = x[:, :9600]
    a = pmwf_streaming_enhance(x, dtype=jnp.float64)
    b = pmwf_streaming_enhance(x, dtype=jnp.float64, fast=True)
    np.testing.assert_array_equal(a, b)


def test_ntf_push_blocks_matches_per_block(mix):
    """push_blocks (one scan dispatch) == repeated push_block, bit-for-bit
    including the carried state."""
    x, _ = mix
    rng = np.random.default_rng(0)
    b = np.abs(rng.random((513, 40))) + 1e-3
    blks = np.abs(rng.random((6, C, 513, 16))) + 1e-3
    s1 = NtfStreamingSession(b, C, dtype=jnp.float64)
    outs1 = np.stack([s1.push_block(blk) for blk in blks])
    s2 = NtfStreamingSession(b, C, dtype=jnp.float64)
    outs2 = s2.push_blocks(blks)
    np.testing.assert_array_equal(outs2, outs1)
    np.testing.assert_array_equal(np.asarray(s2.state.c),
                                  np.asarray(s1.state.c))
    assert int(s2.state.l) == int(s1.state.l) == 6
