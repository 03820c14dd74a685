"""OM-LSA/IMCRA baseline: JAX scan engine vs the float64 oracle, plus
behavioral sanity on real audio."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import exp1

from se_snmf_nat_tpu.enhance.imcra import OmlsaEnhancer
from se_snmf_nat_tpu.oracle.imcra_np import (
    ImcraParams, imcra_windows, omlsa_imcra_np)
from se_snmf_nat_tpu.utils.special import expint_e1


def test_expint_matches_scipy():
    x = np.concatenate([np.linspace(1e-8, 1.5, 500),
                        np.linspace(1.5, 40, 500)])
    got = np.asarray(expint_e1(jnp.asarray(x, jnp.float64)))
    np.testing.assert_allclose(got, exp1(x), rtol=1e-13)


def test_window_normalization_ola_unity():
    """The analysis/synthesis window pair must give unity OLA at hop Mno."""
    p = ImcraParams()
    win_a, win_s = imcra_windows(p)
    prod = win_a * win_s
    acc = np.zeros(p.mno)
    for k in range(0, p.m, p.mno):
        acc += np.roll(prod, -k)[: p.mno]
    # the reference's mean-based W0 normalization is unity only to ~3e-5
    np.testing.assert_allclose(acc, 1.0, rtol=1e-4)


@pytest.fixture(scope="module")
def clip(m03_wav):
    x, fs = m03_wav
    return x[: 2 * fs]


@pytest.mark.slow
def test_scan_matches_oracle(clip):
    want = omlsa_imcra_np(clip)
    enh = OmlsaEnhancer(dtype=jnp.float64)
    got = enh.enhance(clip, quantize=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # quantized outputs identical
    from se_snmf_nat_tpu.utils.matlab_compat import matlab_int16_write
    np.testing.assert_array_equal(matlab_int16_write(got),
                                  matlab_int16_write(want))


@pytest.mark.slow
def test_leading_zero_gating(clip):
    """Frames before the first nonzero sample are skipped (l_fnz logic)."""
    x = np.concatenate([np.zeros(1000), clip[:16000]])
    want = omlsa_imcra_np(x)
    got = OmlsaEnhancer(dtype=jnp.float64).enhance(x, quantize=False)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_noise_reduction_and_speech_preserved(clip):
    out = OmlsaEnhancer(dtype=jnp.float64).enhance(clip)
    n = min(len(out), len(clip))
    rms_in = np.sqrt(np.mean(clip[:n] ** 2))
    rms_out = np.sqrt(np.mean(out[:n].astype(np.float64) ** 2))
    assert 0.05 * rms_in < rms_out < rms_in


@pytest.mark.slow
def test_batch_matches_single(clip):
    enh = OmlsaEnhancer(dtype=jnp.float64)
    a, b = clip, clip[:24000]
    outs = enh.enhance_batch([a, b])
    np.testing.assert_array_equal(outs[0], enh.enhance(a))
    np.testing.assert_array_equal(outs[1], enh.enhance(b))
    # chunked double-buffered dispatch (micro_batch) is value-identical,
    # including the lane-padded tail chunk
    m0, m1, m2 = enh.enhance_batch([a, b, b[:16000]], micro_batch=2)
    np.testing.assert_array_equal(m0, enh.enhance(a))
    np.testing.assert_array_equal(m1, enh.enhance(b))
    np.testing.assert_array_equal(m2, enh.enhance(b[:16000]))


@pytest.mark.slow
def test_bucketing_inert(clip):
    """Bucket padding frames hit the silence gate, so any bucket size gives
    identical output."""
    enh = OmlsaEnhancer(dtype=jnp.float64)
    a = enh.enhance(clip)
    enh2 = OmlsaEnhancer(dtype=jnp.float64)
    enh2.frame_bucket = 1
    b = enh2.enhance(clip)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_omlsa_segsnr_improvement_gate(m03_golden):
    """Objective-quality regression gate (VERDICT r2 weakness 7): on
    pseudo-clean speech (the reference's own enhanced M03 output) mixed
    with 5 dB white noise, OMLSA/IMCRA must improve segmental SNR by at
    least 2 dB.  Catches silent quality regressions that the x64 oracle
    bit-gates cannot (they would track a broken oracle)."""
    from se_snmf_nat_tpu.metrics import segmental_snr

    clean = m03_golden[0][:48000].astype(np.float64)
    fs = m03_golden[1]
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(len(clean))
    noise *= np.sqrt((clean ** 2).mean() / (noise ** 2).mean()
                     / 10 ** (5 / 10))
    noisy = clean + noise
    y = OmlsaEnhancer(dtype=jnp.float64).enhance(noisy, quantize=False)
    n = len(y)
    snr_in = segmental_snr(clean[:n], noisy[:n], fs)
    snr_out = segmental_snr(clean[:n], y, fs)
    assert snr_out > snr_in + 2.0, (snr_in, snr_out)
