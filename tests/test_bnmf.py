"""Bayesian-NMF (bnmf/) tests: VB math vs NumPy mirrors, monotone ELBO,
x64 pipeline parity vs the sequential oracle, and enhancement quality.

The reference cannot supply golden fixtures here (its BNMF baseline
depends on an absent src/BNMF_nmoh/ package, proc_BNMF_nmoh.m:3), so the
gates are the framework's own: exact structural parity + quality."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import digamma as sp_digamma

from se_snmf_nat_tpu.bnmf import (
    BnmfEnhancer, BnmfParams, clamp_min_shape, init_train, train_speech_model,
    vb_train)
from se_snmf_nat_tpu.bnmf.vb import GammaPost
from se_snmf_nat_tpu.oracle.bnmf_np import (
    enhance_np, train_speech_model_np, vb_train_np)
from se_snmf_nat_tpu.utils.special import digamma


def test_digamma_double_accurate():
    x = np.concatenate([np.logspace(-6, 3, 500), np.linspace(0.01, 50, 500)])
    got = digamma(x, xp=np)
    err = np.abs(got - sp_digamma(x)) / np.maximum(np.abs(sp_digamma(x)), 1.0)
    assert err.max() < 1e-13
    # jnp backend agrees bitwise with the numpy backend at x64
    got_j = np.asarray(digamma(jnp.asarray(x, jnp.float64)))
    np.testing.assert_array_equal(got_j, got)


def test_vb_train_matches_numpy_mirror():
    rng = np.random.default_rng(0)
    x = rng.gamma(2.0, 1.0, (48, 30))
    w0, h0, b0w, b0h = init_train(x, 6, seed=3)
    w, h, _ = vb_train(jnp.asarray(x, jnp.float64),
                       jnp.asarray(w0, jnp.float64),
                       jnp.asarray(h0, jnp.float64), b0w, b0h, n_iter=25)
    w_np, h_np = vb_train_np(x, w0, h0, b0w, b0h, n_iter=25)
    # XLA CPU f64 matmul/sum/exp differ from numpy in the last ulps on
    # this platform (reduction order), so the gate is near-parity — the
    # same convention as the MS oracle gates (tests/test_ms.py)
    np.testing.assert_allclose(np.asarray(w.shape), w_np.shape, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(w.scale), w_np.scale, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(h.shape), h_np.shape, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(h.scale), h_np.scale, rtol=1e-9)


def test_vb_train_bound_monotone():
    rng = np.random.default_rng(1)
    x = rng.gamma(2.0, 1.0, (64, 40))
    w0, h0, b0w, b0h = init_train(x, 5)
    _, _, trace = vb_train(jnp.asarray(x, jnp.float64),
                           jnp.asarray(w0, jnp.float64),
                           jnp.asarray(h0, jnp.float64), b0w, b0h,
                           n_iter=60, trace_bound=True)
    tr = np.asarray(trace)
    assert np.all(np.diff(tr) >= -1e-8 * np.abs(tr[:-1]))
    assert tr[-1] > tr[0]


def test_clamp_min_shape_preserves_mean():
    post = GammaPost(jnp.asarray([[2.0, 500.0]]), jnp.asarray([[3.0, 0.1]]))
    out = clamp_min_shape(post, 200.0)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(post.mean),
                               rtol=1e-12)
    assert np.all(np.asarray(out.shape) >= 200.0)


def _speech_noise_mix(seconds=2.5, fs=16000, seed=0):
    rng = np.random.default_rng(seed)
    tt = np.arange(int(fs * seconds)) / fs
    speech = (np.sin(2 * np.pi * 220 * tt)
              * (1 + 0.5 * np.sin(2 * np.pi * 3 * tt)) * 8000)
    noise = rng.standard_normal(len(tt)) * 2000
    head = int(0.5 * fs)                  # noise-only head for online init
    mix = np.where(np.arange(len(tt)) < head, noise, speech + noise)
    return speech, noise, mix, head


_SMALL = BnmfParams(k_speech=12, train_iters=30, noise_init_iters=50,
                    n_infer=10)


@pytest.mark.slow
def test_online_pipeline_x64_matches_oracle():
    """The scan/cond/ring pipeline must bit-match the sequential NumPy
    oracle at float64 — including at least one triggered noise refit
    (init pushes alone exceed refit_every)."""
    speech, _, mix, _ = _speech_noise_mix(seconds=2.0)
    p = _SMALL
    enh = BnmfEnhancer(speech=speech, params=p, dtype=jnp.float64)
    got = enh.enhance(mix, quantize=False)
    w_np, u0_np = train_speech_model_np(speech, p)
    # training mirrors to near-parity (XLA-vs-numpy last-ulp reduction
    # differences; see test_vb_train_matches_numpy_mirror)
    np.testing.assert_allclose(np.asarray(enh.model.w.shape), w_np.shape,
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(enh.model.u0), u0_np, rtol=1e-9)
    want = enhance_np(mix, w_np, u0_np, p)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # and the shipped int16 outputs are identical
    from se_snmf_nat_tpu.io.wavio import enhanced_quantize
    np.testing.assert_array_equal(enhanced_quantize(got),
                                  enhanced_quantize(want))


@pytest.mark.slow
def test_online_enhancement_improves_snr():
    speech, _, mix, head = _speech_noise_mix()
    enh = BnmfEnhancer(speech=speech, params=_SMALL, dtype=jnp.float64)
    y = enh.enhance(mix, quantize=False)
    n = len(y)
    err_in = mix[head:n] - speech[head:n]
    err_out = y[head:] - speech[head:n]
    sig = np.mean(speech[head:n] ** 2)
    snr_in = 10 * np.log10(sig / np.mean(err_in ** 2))
    snr_out = 10 * np.log10(sig / np.mean(err_out ** 2))
    assert snr_out > snr_in + 5.0


@pytest.mark.slow
def test_supervised_mode_improves_snr():
    speech, noise, mix, head = _speech_noise_mix()
    enh = BnmfEnhancer(speech=speech, noise=noise, method="supervised",
                       params=_SMALL, dtype=jnp.float64)
    y = enh.enhance(mix, quantize=False)
    n = len(y)
    err_in = mix[head:n] - speech[head:n]
    err_out = y[head:] - speech[head:n]
    sig = np.mean(speech[head:n] ** 2)
    assert (10 * np.log10(sig / np.mean(err_out ** 2))
            > 10 * np.log10(sig / np.mean(err_in ** 2)) + 5.0)


@pytest.mark.slow
def test_enhance_on_reference_wav_reduces_rms(m03_wav):
    """Operational smoke on real noisy speech: speech model trained on a
    synthetic harmonic source still attenuates CHiME street noise."""
    speech, _, _, _ = _speech_noise_mix()
    x = m03_wav[0][:32000].astype(np.float64)
    enh = BnmfEnhancer(speech=speech, params=_SMALL, dtype=jnp.float64)
    y = enh.enhance(x, quantize=False)
    assert np.sqrt(np.mean(y ** 2)) < np.sqrt(np.mean(x[: len(y)] ** 2))
    assert np.all(np.isfinite(y))


@pytest.mark.slow
def test_streaming_session_bit_matches_offline():
    """Push-based streaming (any chunking, any block size) must reproduce
    the offline online-mode pipeline: same scan step in the same order.
    XLA compiles the chunked scans as separate programs whose fusions
    differ from the whole-signal scan in the last ulps (the same envelope
    as the XLA-vs-numpy gates above), so the gate is shipped-int16
    equality plus a tight float tolerance."""
    from se_snmf_nat_tpu.bnmf import BnmfStreamingSession
    from se_snmf_nat_tpu.io.wavio import enhanced_quantize
    speech, _, mix, _ = _speech_noise_mix(seconds=1.5)
    enh = BnmfEnhancer(speech=speech, params=_SMALL, dtype=jnp.float64)
    want = enh.enhance(mix, quantize=False)
    for chunk, block in ((160, 8), (997, 3)):   # hop-ish and ragged pushes
        sess = BnmfStreamingSession(enh, block_frames=block)
        outs = [sess.push(mix[i: i + chunk], quantize=False)
                for i in range(0, len(mix), chunk)]
        outs.append(sess.flush(quantize=False))
        got = np.concatenate(outs)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
        np.testing.assert_array_equal(enhanced_quantize(got),
                                      enhanced_quantize(want))


def test_streaming_session_rejects_supervised():
    from se_snmf_nat_tpu.bnmf import BnmfStreamingSession
    speech, noise, _, _ = _speech_noise_mix(seconds=1.0)
    enh = BnmfEnhancer(speech=speech, noise=noise, method="supervised",
                       params=_SMALL, dtype=jnp.float64)
    with pytest.raises(ValueError):
        BnmfStreamingSession(enh)


def test_train_speech_model_shapes():
    speech, _, _, _ = _speech_noise_mix(seconds=1.0)
    model, trace = train_speech_model(speech, _SMALL, dtype=jnp.float64,
                                      trace_bound=True)
    f = _SMALL.alen // 2 + 1
    assert model.w.shape.shape == (f, _SMALL.k_speech)
    assert model.u0.shape == (_SMALL.k_speech, 1)
    tr = np.asarray(trace)
    assert np.all(np.diff(tr) >= -1e-8 * np.abs(tr[:-1]))


def test_empty_and_short_input():
    speech, _, _, _ = _speech_noise_mix(seconds=1.0)
    enh = BnmfEnhancer(speech=speech, params=_SMALL, dtype=jnp.float64)
    assert enh.enhance(np.zeros(100)).shape == (0,)


def test_silent_head_does_not_nan():
    """Review regression: a digital-silence lead-in (zero-variance init
    head) must not put NaN through the pipeline."""
    speech, _, mix, _ = _speech_noise_mix(seconds=1.5)
    silent = mix.copy()
    silent[: _SMALL.init_hops * _SMALL.ulen] = 0.0
    enh = BnmfEnhancer(speech=speech, params=_SMALL, dtype=jnp.float64)
    y = enh.enhance(silent, quantize=False)
    assert np.all(np.isfinite(y))


def test_streaming_flush_idempotent():
    """Review regression: flush() finishes the session — a second flush
    emits nothing and a post-flush push raises."""
    from se_snmf_nat_tpu.bnmf import BnmfStreamingSession
    speech, _, mix, _ = _speech_noise_mix(seconds=1.0)
    enh = BnmfEnhancer(speech=speech, params=_SMALL, dtype=jnp.float64)
    sess = BnmfStreamingSession(enh, block_frames=4)
    sess.push(mix)
    first = sess.flush(quantize=False)
    assert len(first) > 0
    assert sess.flush(quantize=False).shape == (0,)
    with pytest.raises(RuntimeError):
        sess.push(mix[:100])


@pytest.mark.slow
def test_streaming_short_input_matches_offline():
    """Input shorter than the init head must still produce the offline
    pipeline's output at flush (previously silently dropped — review
    finding)."""
    from se_snmf_nat_tpu.bnmf import BnmfStreamingSession
    speech, _, mix, _ = _speech_noise_mix(seconds=1.5)
    enh = BnmfEnhancer(speech=speech, params=_SMALL, dtype=jnp.float64)
    short = mix[: _SMALL.init_hops * _SMALL.ulen - 100]
    want = enh.enhance(short, quantize=False)
    sess = BnmfStreamingSession(enh, block_frames=4)
    got = np.concatenate([sess.push(short, quantize=False),
                          sess.flush(quantize=False)])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_params_reject_bad_frame_ratio():
    with pytest.raises(ValueError, match="alen"):
        BnmfEnhancer(speech=np.ones(4000),
                     params=_SMALL._replace(alen=512, ulen=128))
