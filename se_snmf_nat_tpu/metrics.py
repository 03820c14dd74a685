"""Objective speech-quality metrics.

The reference repo carries no evaluation code (quality tables live in the
paper, SURVEY §6); this module supplies the standard objective metrics the
paper reports around — segmental SNR, log-spectral distance, and STOI
(Taal et al. 2010 short-time objective intelligibility) — so campaigns can
be scored without external tooling.  NumPy implementations, host-side
(scoring is IO-bound next to the TPU pipeline).
"""

from __future__ import annotations

import numpy as np


def _frames(x: np.ndarray, n: int, hop: int) -> np.ndarray:
    t = max((len(x) - n) // hop + 1, 0)
    idx = hop * np.arange(t)[:, None] + np.arange(n)[None, :]
    return x[idx]


def segmental_snr(ref: np.ndarray, deg: np.ndarray, fs: int,
                  frame_ms: float = 32.0, floor_db: float = -10.0,
                  ceil_db: float = 35.0) -> float:
    """Classic time-domain segmental SNR over energetic frames, clamped to
    [-10, 35] dB per frame."""
    n = min(len(ref), len(deg))
    ref, deg = np.asarray(ref, float)[:n], np.asarray(deg, float)[:n]
    fl = int(frame_ms * fs / 1000)
    rf = _frames(ref, fl, fl // 2)
    df = _frames(deg, fl, fl // 2)
    if rf.shape[0] == 0:          # shorter than one frame: undefined
        return float("nan")
    e_ref = np.sum(rf * rf, axis=1)
    e_err = np.sum((rf - df) ** 2, axis=1)
    keep = e_ref > 1e-8 * e_ref.max()
    snr = 10.0 * np.log10(e_ref[keep] / np.maximum(e_err[keep], 1e-12))
    return float(np.clip(snr, floor_db, ceil_db).mean())


def log_spectral_distance(ref: np.ndarray, deg: np.ndarray, fs: int,
                          nfft: int = 512) -> float:
    """RMS log-spectral distance (dB) over active frames."""
    n = min(len(ref), len(deg))
    ref, deg = np.asarray(ref, float)[:n], np.asarray(deg, float)[:n]
    hop = nfft // 2
    win = np.hanning(nfft)
    if len(ref) < nfft:           # shorter than one frame: undefined
        return float("nan")
    rf = np.abs(np.fft.rfft(_frames(ref, nfft, hop) * win, axis=1)) ** 2
    df = np.abs(np.fft.rfft(_frames(deg, nfft, hop) * win, axis=1)) ** 2
    e = rf.sum(axis=1)
    keep = e > 1e-6 * e.max()
    lr = 10.0 * np.log10(np.maximum(rf[keep], 1e-12))
    ld = 10.0 * np.log10(np.maximum(df[keep], 1e-12))
    return float(np.mean(np.sqrt(np.mean((lr - ld) ** 2, axis=1))))


# ---------------------------------------------------------------------------
# STOI (Taal, Hendriks, Heusdens, Jensen 2010)
# ---------------------------------------------------------------------------

_STOI_FS = 10000
_STOI_NFFT = 512
_STOI_FRAME = 256
_STOI_HOP = 128
_STOI_NBANDS = 15
_STOI_SEG = 30          # frames per segment (384 ms)
_STOI_BETA_DB = -15.0   # clipping SDR bound
_STOI_DYN_DB = 40.0     # silent-frame removal threshold


def _thirdoct_matrix(fs: int, nfft: int, n_bands: int, cf_min: float = 150.0
                     ) -> np.ndarray:
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    k = np.arange(n_bands)
    cfs = cf_min * 2.0 ** (k / 3.0)
    lo = cfs * 2.0 ** (-1.0 / 6.0)
    hi = cfs * 2.0 ** (1.0 / 6.0)
    h = np.zeros((n_bands, len(f)))
    for b in range(n_bands):
        idx_lo = np.argmin((f - lo[b]) ** 2)
        idx_hi = np.argmin((f - hi[b]) ** 2)
        h[b, idx_lo: idx_hi] = 1.0
    return h


def _resample(x: np.ndarray, fs: int, fs_out: int) -> np.ndarray:
    from se_snmf_nat_tpu.dsp.resample import srconv
    return srconv(x, fs, fs_out)


def stoi(ref: np.ndarray, deg: np.ndarray, fs: int) -> float:
    """Short-time objective intelligibility in [~0, 1]."""
    n = min(len(ref), len(deg))
    x = _resample(np.asarray(ref, float)[:n], fs, _STOI_FS)
    y = _resample(np.asarray(deg, float)[:n], fs, _STOI_FS)

    # remove silent frames (by ref energy, 40 dB dynamic range)
    win = np.hanning(_STOI_FRAME + 2)[1:-1]
    xf = _frames(x, _STOI_FRAME, _STOI_HOP) * win
    yf = _frames(y, _STOI_FRAME, _STOI_HOP) * win
    e = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    keep = e > e.max() - _STOI_DYN_DB
    xf, yf = xf[keep], yf[keep]
    if len(xf) < _STOI_SEG:
        raise ValueError("signal too short / too silent for STOI")

    xs = np.abs(np.fft.rfft(xf, _STOI_NFFT, axis=1)) ** 2
    ys = np.abs(np.fft.rfft(yf, _STOI_NFFT, axis=1)) ** 2
    h = _thirdoct_matrix(_STOI_FS, _STOI_NFFT, _STOI_NBANDS)
    xb = np.sqrt(xs @ h.T)          # (T, bands) band envelopes
    yb = np.sqrt(ys @ h.T)

    c = 10.0 ** (-_STOI_BETA_DB / 20.0)
    scores = []
    for m in range(_STOI_SEG, xb.shape[0] + 1):
        xseg = xb[m - _STOI_SEG: m]          # (N, bands)
        yseg = yb[m - _STOI_SEG: m]
        alpha = np.sqrt((xseg ** 2).sum(0) / ((yseg ** 2).sum(0) + 1e-12))
        yprime = np.minimum(yseg * alpha[None, :], xseg * (1.0 + c))
        xn = xseg - xseg.mean(0)
        yn = yprime - yprime.mean(0)
        num = (xn * yn).sum(0)
        den = np.linalg.norm(xn, axis=0) * np.linalg.norm(yn, axis=0) + 1e-12
        scores.append(num / den)
    return float(np.mean(scores))


def quality_report(ref: np.ndarray, deg: np.ndarray, fs: int) -> dict:
    def _safe(v: float):
        return None if np.isnan(v) else round(v, 2)   # JSON-clean

    out = {
        "seg_snr_db": _safe(segmental_snr(ref, deg, fs)),
        "lsd_db": _safe(log_spectral_distance(ref, deg, fs)),
    }
    try:
        out["stoi"] = round(stoi(ref, deg, fs), 4)
    except ValueError:
        out["stoi"] = None
    return out
