"""Float64 NumPy oracle for the OM-LSA/IMCRA baseline enhancer.

Reference: proc_IMCRA.m (Cohen 2003 "omlsa3" — single-channel OM-LSA gain
with IMCRA noise-PSD tracking).  This is a semantics-exact reimplementation
used to gate the JAX scan engine (enhance/imcra.py); line numbers cite the
reference file.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from se_snmf_nat_tpu.utils.matlab_compat import matlab_round
from scipy.special import exp1



def _iround(x) -> int:
    """int(MATLAB round(x)): half AWAY from zero (Python round is
    half-to-even) for parameter derivations — parity on .5 boundaries."""
    return int(matlab_round(np.asarray(float(x))))

def matlab_hanning(n: int) -> np.ndarray:
    """MATLAB hanning(n): Hann without zero endpoints."""
    k = np.arange(1, n + 1)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / (n + 1)))


def matlab_hamming(n: int) -> np.ndarray:
    k = np.arange(n)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))


@dataclass(frozen=True)
class ImcraParams:
    """proc_IMCRA.m:26-66 constants (at the 16 kHz reference rate)."""

    m: int = 512                 # analysis window
    mo: int = 384                # overlap (75%)
    w: int = 1                   # spectral smoothing half-width
    alpha_s: float = 0.9
    nwin: int = 8                # minima-search resolution (sub-windows)
    vwin: int = 15               # frames per sub-window
    delta_s: float = 1.67
    bmin: float = 1.66
    delta_y: float = 4.6
    delta_yt: float = 3.0
    alpha_d: float = 0.85
    alpha_d_long: float = 0.99
    alpha_xi: float = 0.7
    w_xi_local: int = 1
    w_xi_global: int = 15
    f_u: float = 10e3
    f_l: float = 50.0
    p_min: float = 0.005
    xi_lu_db: float = -5.0
    xi_ll_db: float = -10.0
    xi_gu_db: float = -5.0
    xi_gl_db: float = -10.0
    xi_fu_db: float = -5.0
    xi_fl_db: float = -10.0
    xi_mu_db: float = 10.0
    xi_ml_db: float = 0.0
    q_max: float = 0.998
    alpha_eta: float = 0.95
    eta_min_db: float = -18.0
    broad_flag: bool = True
    tone_flag: bool = True
    nonstat: str = "medium"      # 'low' | 'medium' | 'high'
    zero_thres: float = 1e-10
    fs: int = 16000

    @property
    def mno(self) -> int:
        return self.m - self.mo

    @property
    def m21(self) -> int:
        return self.m // 2 + 1

    @property
    def eta_min(self) -> float:
        return 10.0 ** (self.eta_min_db / 10.0)

    @property
    def g_f(self) -> float:
        return self.eta_min ** 0.5


def imcra_windows(p: ImcraParams) -> tuple[np.ndarray, np.ndarray]:
    """(analysis window, synthesis window) — proc_IMCRA.m:93-106,353.

    MATLAB normalizes hamming(M) by the OLA power factor W0 and energy Cwin,
    then synthesizes with Cwin^2*win; net effect: analysis = win/(W0*Cwin),
    synthesis = Cwin^2 * analysis."""
    win = matlab_hamming(p.m)
    win2 = win * win
    mno = p.mno
    w0 = win2[:mno].copy()
    for k in range(mno, p.m, mno):
        w0 += np.roll(win2, -k)[:mno]
    w0 = np.mean(w0) ** 0.5
    win = win / w0
    cwin = np.sum(win * win) ** 0.5
    win = win / cwin
    return win, cwin * cwin * win


def _smooth(b: np.ndarray, x: np.ndarray, w: int, m21: int) -> np.ndarray:
    """conv(b, x) central slice (proc_IMCRA.m:162-163)."""
    return np.convolve(b, x)[w: m21 + w]


def omlsa_imcra_np(y_samples: np.ndarray, p: ImcraParams | None = None
                   ) -> np.ndarray:
    """Enhance int16-scale samples; returns the float output stream
    (len = Nframes*Mno + Mo), pre-quantization.  proc_IMCRA.m:108-373."""
    p = p or ImcraParams()
    y_samples = np.asarray(y_samples, np.float64).reshape(-1)
    m, mo, mno, m21 = p.m, p.mo, p.mno, p.m21
    n = len(y_samples)
    nframes = int((n - mo) // mno)
    win_a, win_s = imcra_windows(p)

    b = matlab_hanning(2 * p.w + 1)
    b /= b.sum()
    b_xi_l = matlab_hanning(2 * p.w_xi_local + 1)
    b_xi_l /= b_xi_l.sum()
    b_xi_g = matlab_hanning(2 * p.w_xi_global + 1)
    b_xi_g /= b_xi_g.sum()

    k_u = min(_iround(p.f_u / p.fs * m + 1), m21)   # 1-based
    k_l = _iround(p.f_l / p.fs * m + 1)
    k2 = _iround(500.0 / p.fs * m + 1)
    k3 = _iround(3500.0 / p.fs * m + 1)

    out = np.zeros(m)
    stream: list[np.ndarray] = []

    eta_2term = np.ones(m21)
    xi = np.zeros(m21)
    xi_frame = 0.0
    xi_m_db = 0.0
    l_mod_lswitch = 0
    l_fnz = 1
    fnz_flag = False
    lambda_d = np.zeros(m21)
    s = st = smin = smint = smact = smactt = np.zeros(m21)
    sw = swt = None
    lambda_dav = lambda_dav_long = sy = np.zeros(m21)

    for l in range(1, nframes + 1):
        start = (l - 1) * mno
        y = y_samples[start: start + m]
        first_nz = abs(y[0]) > p.zero_thres
        any_nz = np.any(np.abs(y) > p.zero_thres)
        if (not fnz_flag and first_nz) or (fnz_flag and any_nz):
            fnz_flag = True
            yspec = np.fft.fft(win_a * y)
            ya2 = np.abs(yspec[:m21]) ** 2
            if l == l_fnz:
                lambda_d = ya2.copy()
            gamma = ya2 / np.maximum(lambda_d, 1e-10)
            eta = p.alpha_eta * eta_2term + (1 - p.alpha_eta) * np.maximum(gamma - 1, 0)
            eta = np.maximum(eta, p.eta_min)
            v = gamma * eta / (1 + eta)

            sf = _smooth(b, ya2, p.w, m21)
            if l == l_fnz:
                sy = ya2.copy()
                s = sf.copy()
                st = sf.copy()
                lambda_dav = ya2.copy()
            else:
                s = p.alpha_s * s + (1 - p.alpha_s) * sf
            if l < 14 + l_fnz:
                smin = s.copy()
                smact = s.copy()
            else:
                smin = np.minimum(smin, s)
                smact = np.minimum(smact, s)

            i_f = ((ya2 < p.delta_y * p.bmin * smin)
                   & (s < p.delta_s * p.bmin * smin)).astype(np.float64)
            conv_i = _smooth(b, i_f, p.w, m21)
            sft = st.copy()
            idx = conv_i > 0
            conv_y = _smooth(b, i_f * ya2, p.w, m21)
            sft[idx] = conv_y[idx] / conv_i[idx]
            if l < 14 + l_fnz:
                st = s.copy()
                smint = st.copy()
                smactt = st.copy()
            else:
                st = p.alpha_s * st + (1 - p.alpha_s) * sft
                smint = np.minimum(smint, st)
                smactt = np.minimum(smactt, st)

            qhat = np.ones(m21)
            phat = np.zeros(m21)
            ref_min = smin if p.nonstat == "low" else smint
            gamma_mint = ya2 / p.bmin / np.maximum(ref_min, 1e-10)
            zetat = s / p.bmin / np.maximum(ref_min, 1e-10)
            band = (gamma_mint > 1) & (gamma_mint < p.delta_yt) & (zetat < p.delta_s)
            qhat[band] = (p.delta_yt - gamma_mint[band]) / (p.delta_yt - 1)
            phat[band] = 1.0 / (1 + qhat[band] / (1 - qhat[band])
                                * (1 + eta[band]) * np.exp(-v[band]))
            phat[(gamma_mint >= p.delta_yt) | (zetat >= p.delta_s)] = 1.0

            alpha_dt = p.alpha_d + (1 - p.alpha_d) * phat
            lambda_dav = alpha_dt * lambda_dav + (1 - alpha_dt) * ya2
            if l < 14 + l_fnz:
                lambda_dav_long = lambda_dav.copy()
            else:
                a_long = p.alpha_d_long + (1 - p.alpha_d_long) * phat
                lambda_dav_long = a_long * lambda_dav_long + (1 - a_long) * ya2

            l_mod_lswitch += 1
            if l_mod_lswitch == p.vwin:
                l_mod_lswitch = 0
                if l == p.vwin - 1 + l_fnz:
                    sw = np.tile(s[:, None], (1, p.nwin))
                    swt = np.tile(st[:, None], (1, p.nwin))
                else:
                    sw = np.concatenate([sw[:, 1:], smact[:, None]], axis=1)
                    smin = sw.min(axis=1)
                    smact = s.copy()
                    swt = np.concatenate([swt[:, 1:], smactt[:, None]], axis=1)
                    smint = swt.min(axis=1)
                    smactt = st.copy()

            factor = 2.0 if p.nonstat == "high" else 1.4685
            lambda_d = factor * lambda_dav

            xi = p.alpha_xi * xi + (1 - p.alpha_xi) * eta
            xi_local = _smooth(b_xi_l, xi, p.w_xi_local, m21)
            xi_global = _smooth(b_xi_g, xi, p.w_xi_global, m21)
            dxi_frame = xi_frame
            xi_frame = np.mean(xi[k_l - 1: k_u])
            dxi_frame = xi_frame - dxi_frame
            xi_local_db = np.where(xi_local > 0, 10 * np.log10(
                np.maximum(xi_local, 1e-300)), -100.0)
            xi_global_db = np.where(xi_global > 0, 10 * np.log10(
                np.maximum(xi_global, 1e-300)), -100.0)
            xi_frame_db = 10 * np.log10(xi_frame) if xi_frame > 0 else -100.0

            p_local = np.ones(m21)
            p_local[xi_local_db <= p.xi_ll_db] = p.p_min
            mid = (xi_local_db > p.xi_ll_db) & (xi_local_db < p.xi_lu_db)
            p_local[mid] = p.p_min + (xi_local_db[mid] - p.xi_ll_db) \
                / (p.xi_lu_db - p.xi_ll_db) * (1 - p.p_min)

            p_global = np.ones(m21)
            p_global[xi_global_db <= p.xi_gl_db] = p.p_min
            mid = (xi_global_db > p.xi_gl_db) & (xi_global_db < p.xi_gu_db)
            p_global[mid] = p.p_min + (xi_global_db[mid] - p.xi_gl_db) \
                / (p.xi_gu_db - p.xi_gl_db) * (1 - p.p_min)

            m_p_local = np.mean(p_local[2: k2 + k3 - 3])
            if m_p_local < 0.25:
                p_local[k2 - 1: k3] = p.p_min
            if p.tone_flag and m_p_local < 0.5 and l > 120:
                seg = lambda_dav_long
                tone = seg[7: m21 - 8] > 2.5 * (seg[9: m21 - 6] + seg[5: m21 - 10])
                idx1 = np.nonzero(tone)[0] + 1          # MATLAB 1-based find
                for off in (6, 7, 8):
                    p_local[idx1 + off - 1] = p.p_min   # P_local(idx+off)

            if xi_frame_db <= p.xi_fl_db:
                p_frame = p.p_min
            elif dxi_frame >= 0:
                xi_m_db = min(max(xi_frame_db, p.xi_ml_db), p.xi_mu_db)
                p_frame = 1.0
            elif xi_frame_db >= xi_m_db + p.xi_fu_db:
                p_frame = 1.0
            elif xi_frame_db <= xi_m_db + p.xi_fl_db:
                p_frame = p.p_min
            else:
                p_frame = p.p_min + (xi_frame_db - xi_m_db - p.xi_fl_db) \
                    / (p.xi_fu_db - p.xi_fl_db) * (1 - p.p_min)

            q = 1 - p_global * p_local * p_frame if p.broad_flag \
                else 1 - p_local * p_frame
            q = np.minimum(q, p.q_max)

            gamma = ya2 / np.maximum(lambda_d, 1e-10)
            eta = p.alpha_eta * eta_2term + (1 - p.alpha_eta) * np.maximum(gamma - 1, 0)
            eta = np.maximum(eta, p.eta_min)
            v = gamma * eta / (1 + eta)
            ph1 = np.zeros(m21)
            lo = q < 0.9
            ph1[lo] = 1.0 / (1 + q[lo] / (1 - q[lo]) * (1 + eta[lo]) * np.exp(-v[lo]))

            gh1 = np.ones(m21)
            hi = v > 5
            gh1[hi] = eta[hi] / (1 + eta[hi])
            mid = (v <= 5) & (v > 0)
            gh1[mid] = eta[mid] / (1 + eta[mid]) * np.exp(0.5 * exp1(v[mid]))

            if p.tone_flag:
                ldg = lambda_d.copy()
                ldg[3: m21 - 3] = np.minimum(
                    np.minimum(ldg[3: m21 - 3], lambda_d[0: m21 - 6]),
                    lambda_d[6: m21])
                sy = 0.8 * sy + 0.2 * ya2
                gh0 = p.g_f * (ldg / (sy + 1e-10)) ** 0.5
            else:
                gh0 = np.full(m21, p.g_f)
            g = gh1 ** ph1 * gh0 ** (1 - ph1)
            eta_2term = gh1 ** 2 * gamma

            xspec = np.zeros(m21, complex)
            xspec[3: m21 - 1] = g[3: m21 - 1] * yspec[3: m21 - 1]
            full = np.concatenate([xspec, np.conj(xspec[m21 - 2: 0: -1])])
            x = win_s * np.real(np.fft.ifft(full))
            out = out + x
        else:
            if not fnz_flag:
                l_fnz += 1
        stream.append(out[:mno].copy())
        out = np.concatenate([out[mno:], np.zeros(mno)])
    stream.append(out[: m - mno].copy())
    return np.concatenate(stream) if stream else np.zeros(0)
