"""Objective quality metrics: sanity orderings + known-value anchors."""

import numpy as np
import pytest

from se_snmf_nat_tpu.metrics import (
    cepstral_distance, fw_seg_snr, itakura_saito, llr,
    log_spectral_distance, quality_report, segmental_snr, stoi, wss)

FS = 16000


@pytest.fixture(scope="module")
def speechlike():
    """Amplitude-modulated multi-tone — enough structure for STOI."""
    rng = np.random.default_rng(0)
    t = np.arange(4 * FS) / FS
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2
    sig = sum(np.sin(2 * np.pi * f0 * t + rng.random() * 6)
              for f0 in (220, 450, 900, 1800, 2600))
    return (env * sig * 4000).astype(np.float64)


def test_identity_is_perfect(speechlike):
    assert segmental_snr(speechlike, speechlike, FS) == pytest.approx(35.0)
    assert log_spectral_distance(speechlike, speechlike, FS) \
        == pytest.approx(0.0, abs=1e-9)
    assert stoi(speechlike, speechlike, FS) > 0.999


def test_metrics_order_with_noise_level(speechlike):
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(speechlike))
    low = speechlike + 500 * noise
    high = speechlike + 4000 * noise
    assert segmental_snr(speechlike, low, FS) \
        > segmental_snr(speechlike, high, FS)
    assert log_spectral_distance(speechlike, low, FS) \
        < log_spectral_distance(speechlike, high, FS)
    s_low, s_high = stoi(speechlike, low, FS), stoi(speechlike, high, FS)
    assert s_low > s_high
    assert 0.0 < s_high < s_low <= 1.0


def test_quality_report_keys(speechlike):
    rng = np.random.default_rng(2)
    deg = speechlike + 1000 * rng.standard_normal(len(speechlike))
    rep = quality_report(speechlike, deg, FS)
    assert set(rep) == {"seg_snr_db", "fw_seg_snr_db", "lsd_db", "llr",
                        "is_dist", "cep_dist_db", "wss", "stoi"}
    assert rep["stoi"] is not None
    assert all(v is not None for v in rep.values())


@pytest.fixture(scope="module")
def speech():
    """2 s of real speech (reference CHiME fixture) — the synthetic
    multi-tone fixture's near-singular LPC saturates the LPC battery."""
    from se_snmf_nat_tpu.io.wavio import read_wav_int16
    x, fs = read_wav_int16("/root/reference/wav/M03_423C0213_STR.CH6.wav")
    assert fs == FS
    return np.asarray(x, float)[: 2 * FS]


def test_lpc_battery_identity_is_perfect(speech):
    assert llr(speech, speech, FS) == pytest.approx(0.0, abs=1e-9)
    assert itakura_saito(speech, speech, FS) == pytest.approx(0.0, abs=1e-9)
    assert cepstral_distance(speech, speech, FS) \
        == pytest.approx(0.0, abs=1e-9)
    assert wss(speech, speech, FS) == pytest.approx(0.0, abs=1e-9)
    assert fw_seg_snr(speech, speech, FS) == pytest.approx(35.0)


def test_lpc_battery_orders_with_noise_level(speech):
    rng = np.random.default_rng(4)
    noise = rng.standard_normal(len(speech))
    low = speech + 200 * noise
    high = speech + 3200 * noise
    # distortion measures grow with noise, SNR measures shrink
    assert 0.0 < llr(speech, low, FS) < llr(speech, high, FS)
    assert 0.0 < itakura_saito(speech, low, FS) \
        < itakura_saito(speech, high, FS)
    assert 0.0 < cepstral_distance(speech, low, FS) \
        < cepstral_distance(speech, high, FS)
    assert 0.0 < wss(speech, low, FS) < wss(speech, high, FS)
    assert fw_seg_snr(speech, low, FS) > fw_seg_snr(speech, high, FS)
    # sanity ranges on real speech at ~20 dB SNR (typical published values)
    assert llr(speech, low, FS) < 1.0
    assert cepstral_distance(speech, low, FS) < 6.0


def test_llr_invariant_to_gain(speech):
    """LLR compares LPC envelopes — a pure gain change is invisible."""
    assert llr(speech, 0.25 * speech, FS) == pytest.approx(0.0, abs=1e-9)


def test_lpc_cepstrum_one_pole_anchor():
    """Analytic anchor: cepstrum of 1/(1 - r z^-1) is c_n = r^n/n."""
    from se_snmf_nat_tpu.metrics import _lpc_cepstrum
    c = _lpc_cepstrum(np.array([1.0, -0.6]), 8)
    want = np.array([0.6 ** n / n for n in range(1, 9)])
    np.testing.assert_allclose(c, want, atol=1e-15)


def test_critical_band_filters_cover_band():
    from se_snmf_nat_tpu.metrics import _critical_band_filters
    filt = _critical_band_filters(FS, 1024)
    assert filt.shape == (25, 513)
    assert np.all(filt >= 0.0)
    assert np.all(filt.sum(axis=1) > 0.0)       # every band is non-empty
    peaks = filt.argmax(axis=1)
    assert np.all(np.diff(peaks) > 0)           # centers strictly ordered


def test_enhancement_improves_metrics(speechlike):
    """A crude spectral-subtraction 'enhancer' must score between noisy and
    clean — the metrics must reward actual noise reduction."""
    rng = np.random.default_rng(3)
    noise = 2000 * rng.standard_normal(len(speechlike))
    noisy = speechlike + noise
    # oracle Wiener on 32 ms frames
    n, hop = 512, 256
    win = np.hanning(n)
    t = (len(noisy) - n) // hop + 1
    idx = hop * np.arange(t)[:, None] + np.arange(n)[None, :]
    s_spec = np.fft.rfft(speechlike[idx] * win, axis=1)
    v_spec = np.fft.rfft(noise[idx] * win, axis=1)
    y_spec = np.fft.rfft(noisy[idx] * win, axis=1)
    gain = np.abs(s_spec) ** 2 / (np.abs(s_spec) ** 2 + np.abs(v_spec) ** 2)
    out = np.zeros(len(noisy))
    wsum = np.zeros(len(noisy))
    fr = np.fft.irfft(y_spec * gain, n, axis=1) * win
    for i in range(t):
        out[i * hop: i * hop + n] += fr[i]
        wsum[i * hop: i * hop + n] += win * win
    out /= np.maximum(wsum, 1e-8)
    assert segmental_snr(speechlike, out, FS) \
        > segmental_snr(speechlike, noisy, FS) + 3.0
    assert stoi(speechlike, out, FS) >= stoi(speechlike, noisy, FS)
