"""MS stack (MMSE/log-MMSE + minimum statistics): JAX scan vs the float64
oracle, chunked-resume protocol, and behavioral sanity."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import iv

from se_snmf_nat_tpu.enhance.ms import MmseEnhancer
from se_snmf_nat_tpu.oracle.ms_np import (
    MsParams, estnoisem_np, mhvals, ms_derived, ssubmmse_np)
from se_snmf_nat_tpu.utils.special import bessel_i0_small, bessel_i1_small


def test_mhvals_table_and_interp():
    # exact table hits
    assert mhvals(20) == (0.705, 2.0)
    # interpolated values are monotone-sensible between neighbors
    m, h = mhvals(152)
    assert 0.9 < m < 0.91
    assert min(4.25, 4.35) <= h <= max(4.25, 4.35)


def test_bessel_series_vs_scipy():
    x = np.linspace(0, 0.5, 200)
    np.testing.assert_allclose(
        np.asarray(bessel_i0_small(jnp.asarray(x, jnp.float64))),
        iv(0, x), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(bessel_i1_small(jnp.asarray(x, jnp.float64))),
        iv(1, x), rtol=1e-13, atol=1e-300)


@pytest.fixture(scope="module")
def clip(m03_wav):
    x, fs = m03_wav
    return x[: 2 * fs], fs


@pytest.mark.slow
def test_scan_matches_oracle_logmmse(clip):
    x, fs = clip
    want = ssubmmse_np(x, fs)
    enh = MmseEnhancer(fs, dtype=jnp.float64)
    got = enh.enhance(x, quantize=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_scan_matches_oracle_amplitude_mmse(clip):
    x, fs = clip
    p = MsParams(lg=0)
    want = ssubmmse_np(x, fs, p)
    got = MmseEnhancer(fs, params=p, dtype=jnp.float64).enhance(
        x, quantize=False)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_chunked_equals_oneshot(clip):
    """ssubmmse's documented chunk protocol: processing in arbitrary chunks
    with state resume must equal one full call (header comment :47-57)."""
    x, fs = clip
    enh = MmseEnhancer(fs, dtype=jnp.float64)
    st = None
    pieces = []
    for lo, hi in ((0, 1000), (1000, 11000), (11000, len(x))):
        y, st = enh.enhance(x[lo:hi], state=st, return_state=True,
                            quantize=False)
        pieces.append(y)
    chunked = np.concatenate(pieces)
    full = enh.enhance(x, quantize=False)
    # one-shot returns the full stream incl. tail; chunked withholds it
    np.testing.assert_allclose(chunked, full[: len(chunked)],
                               rtol=0, atol=1e-6)


@pytest.mark.slow
def test_noise_tracker_converges(clip):
    """On stationary noise the minimum-statistics estimate lands near the
    true noise PSD."""
    rng = np.random.default_rng(0)
    fs = clip[1]
    noise = rng.standard_normal(3 * fs) * 1000.0
    p = MsParams()
    d = ms_derived(p, fs)
    nf, ni = d.nf, d.ni
    t = (len(noise) - nf + ni) // ni
    idx = ni * np.arange(t)[:, None] + np.arange(nf)[None, :]
    yp = np.abs(np.fft.rfft(noise[idx] * d.win, nf, axis=1)) ** 2
    dp, _ = estnoisem_np(yp, p, d)
    true = yp[t // 2:].mean()
    est = dp[-1].mean()
    assert 0.2 * true < est < 1.5 * true


@pytest.mark.slow
def test_enhancement_reduces_noise(clip):
    x, fs = clip
    out = MmseEnhancer(fs, dtype=jnp.float64).enhance(x)
    n = min(len(out), len(x))
    assert np.sqrt(np.mean(out[:n].astype(float) ** 2)) \
        < np.sqrt(np.mean(x[:n] ** 2))


@pytest.mark.slow
def test_mmse_spp_tracker_matches_oracle(clip):
    """tracker='mmse' (estnoiseg rebuild): scan vs numpy oracle chain."""
    import numpy as np
    from se_snmf_nat_tpu.enhance.ms import MmseEnhancer
    from se_snmf_nat_tpu.oracle.ms_np import (
        MsgParams, MsParams, estnoiseg_np, ms_derived)
    from scipy.special import exp1
    x, fs = clip
    p, g = MsParams(), MsgParams()
    d = ms_derived(p, fs)
    ni, nf = d.ni, d.nf
    nr = (len(x) - nf + ni) // ni
    idx = ni * np.arange(nr)[:, None] + np.arange(nf)[None, :]
    y = x[idx] * d.win[None, :]
    yf = np.fft.rfft(y, nf, axis=1)
    yp = (yf * np.conj(yf)).real
    dp, _ = estnoiseg_np(yp, d.tinc, g)
    gam = np.minimum(yp / dp, p.gx)
    xu = 1.0
    gains = np.zeros_like(gam)
    for i in range(nr):
        xi = d.a * xu + (1 - d.a) * np.maximum(gam[i] - 1, 0.0)
        xir = xi / (1 + xi)
        gi = xir * np.exp(0.5 * exp1(np.maximum(xir * gam[i], 1e-300)))
        gains[i] = gi
        xu = gam[i] * gi ** 2
    se = np.fft.irfft(yf * gains, nf, axis=1) * d.win[None, :]
    want = np.zeros(ni * (nr + 1))
    for i in range(nr):
        want[i * ni: i * ni + nf] += se[i]

    got = MmseEnhancer(fs, dtype=jnp.float64, tracker="mmse").enhance(
        x, quantize=False)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_tracker_choice_changes_output(clip):
    from se_snmf_nat_tpu.enhance.ms import MmseEnhancer
    x, fs = clip
    a = MmseEnhancer(fs, dtype=jnp.float64, tracker="martin").enhance(x)
    b = MmseEnhancer(fs, dtype=jnp.float64, tracker="mmse").enhance(x)
    assert a.shape == b.shape
    assert not np.array_equal(a, b)


@pytest.mark.slow
def test_batch_matches_single(clip):
    """enhance_batch (samples upload + in-graph framing + device int16
    write) is bit-identical to per-utterance enhance at x64, incl. the
    quantized path and mixed lengths."""
    x, fs = clip
    enh = MmseEnhancer(fs, dtype=jnp.float64)
    a, b = x, x[: int(0.7 * fs)]
    outs = enh.enhance_batch([a, b])
    np.testing.assert_array_equal(outs[0], enh.enhance(a))
    np.testing.assert_array_equal(outs[1], enh.enhance(b))
    fa, fb = enh.enhance_batch([a, b], quantize=False)
    np.testing.assert_array_equal(fa, enh.enhance(a, quantize=False))
    np.testing.assert_array_equal(fb, enh.enhance(b, quantize=False))
    # chunked double-buffered dispatch (micro_batch) is value-identical,
    # including the lane-padded tail chunk
    m0, m1, m2 = enh.enhance_batch([a, b, b[:8000]], micro_batch=2)
    np.testing.assert_array_equal(m0, enh.enhance(a))
    np.testing.assert_array_equal(m1, enh.enhance(b))
    np.testing.assert_array_equal(m2, enh.enhance(b[:8000]))


@pytest.mark.slow
def test_batch_matches_single_mmse_tracker(clip):
    x, fs = clip
    enh = MmseEnhancer(fs, dtype=jnp.float64, tracker="mmse")
    a, b = x[: int(1.3 * fs)], x
    outs = enh.enhance_batch([a, b])
    np.testing.assert_array_equal(outs[0], enh.enhance(a))
    np.testing.assert_array_equal(outs[1], enh.enhance(b))


def test_batch_empty_and_short_inputs():
    enh = MmseEnhancer(16000, dtype=jnp.float64)
    outs = enh.enhance_batch([np.zeros(10), np.zeros(0)])
    assert outs[0].size == 0 and outs[1].size == 0


@pytest.mark.slow
def test_batch_noninteger_inputs_match_single(clip):
    """Non-integer-valued inputs take the float upload fallback and still
    match the single path bit-for-bit at x64."""
    x, fs = clip
    enh = MmseEnhancer(fs, dtype=jnp.float64)
    a = x[: fs] + 0.25
    outs = enh.enhance_batch([a])
    np.testing.assert_array_equal(outs[0], enh.enhance(a))


def test_batch_bucket_aligned_length_with_trailing_hop():
    """Regression: the longest utterance's frame count an exact multiple of
    frame_bucket PLUS trailing samples past the last frame used to overflow
    the sample buffer (review finding).  nr=64=frame_bucket at ni=160,
    nf=320 -> buffer 10400, len(x)=10401."""
    enh = MmseEnhancer(16000, dtype=jnp.float64)
    ni, nf = enh.d.ni, enh.d.nf
    nr = enh.frame_bucket
    n = ni * (nr - 1) + nf + 1
    rng = np.random.default_rng(0)
    x = np.round(rng.uniform(-1000, 1000, n))
    outs = enh.enhance_batch([x])
    np.testing.assert_array_equal(outs[0], enh.enhance(x))


@pytest.mark.slow
def test_mmse_segsnr_improvement_gate(m03_golden):
    """Objective-quality regression gate (VERDICT r2 weakness 7): see
    test_imcra.py::test_omlsa_segsnr_improvement_gate."""
    from se_snmf_nat_tpu.metrics import segmental_snr

    clean = m03_golden[0][:48000].astype(np.float64)
    fs = m03_golden[1]
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(len(clean))
    noise *= np.sqrt((clean ** 2).mean() / (noise ** 2).mean()
                     / 10 ** (5 / 10))
    noisy = clean + noise
    y = MmseEnhancer(fs, dtype=jnp.float64).enhance(noisy, quantize=False)
    n = len(y)
    snr_in = segmental_snr(clean[:n], noisy[:n], fs)
    snr_out = segmental_snr(clean[:n], y, fs)
    assert snr_out > snr_in + 2.0, (snr_in, snr_out)
