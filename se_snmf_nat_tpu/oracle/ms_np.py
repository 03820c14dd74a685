"""Float64 NumPy oracle for the MS enhancement stack.

Reference: src/MS/ssubmmse.m (Ephraim-Malah MMSE / log-MMSE gain) +
src/MS/estnoisem.m (Rainer Martin minimum-statistics noise PSD tracker),
the GUI's 'MS' mode (SE_GUI.m:420-426) with the init_MS.m override
(pp.ti = 0.01).  Semantics-exact model used to gate the JAX scan engine
(enhance/ms.py); line citations refer to those files.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from se_snmf_nat_tpu.utils.matlab_compat import matlab_round
from scipy.special import exp1, iv


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _iround(x) -> int:
    """int(MATLAB round(x)): half AWAY from zero (Python round is
    half-to-even) for parameter derivations — parity on .5 boundaries."""
    return int(matlab_round(np.asarray(float(x))))

@dataclass(frozen=True)
class MsParams:
    """ssubmmse.m:108-120 + estnoisem.m:110-124 defaults, with the
    init_MS.m frame-increment override (ti=0.01)."""

    # gain parameters
    of: int = 2                 # overlap factor (fftlen / increment)
    ti: float = 0.01            # frame increment seconds (init_MS.m:1)
    ta: float = 0.396           # SNR smoothing time constant
    gx: float = 1000.0          # max posterior SNR
    xn: float = 0.0             # min prior SNR
    lg: int = 1                 # 1: log-MMSE, 0: amplitude MMSE
    bt: float = -1.0            # binary gain threshold (-1: continuous)
    mx: float = 0.0             # input mixture gain
    # minimum-statistics noise tracker parameters
    taca: float = 0.0449
    tamax: float = 0.392
    taminh: float = 0.0133
    tpfall: float = 0.064
    tbmax: float = 0.0717
    qeqmin: float = 2.0
    qeqmax: float = 14.0
    av: float = 2.12
    td: float = 1.536
    nu: int = 8
    qith: tuple = (0.03, 0.05, 0.06, np.inf)
    nsmdb: tuple = (47.0, 31.4, 15.7, 4.1)


@dataclass
class MsDerived:
    """Constants derived from (params, fs) — shared by oracle and JAX."""

    ni: int; nf: int; tinc: float; a: float
    aca: float; amax: float; aminh: float; bmax: float; snrexp: float
    nv: int; nd: int; md: float; hd: float; mv: float; hv: float
    nsms: np.ndarray; qeqimax: float; qeqimin: float
    win: np.ndarray = field(default=None)


_MH_TABLE = np.array([
    [1, 0, 0], [2, 0.26, 0.15], [5, 0.48, 0.48], [8, 0.58, 0.78],
    [10, 0.61, 0.98], [15, 0.668, 1.55], [20, 0.705, 2], [30, 0.762, 2.3],
    [40, 0.8, 2.52], [60, 0.841, 3.1], [80, 0.865, 3.38], [120, 0.89, 4.15],
    [140, 0.9, 4.35], [160, 0.91, 4.25], [180, 0.92, 3.9], [220, 0.93, 4.1],
    [260, 0.935, 4.7], [300, 0.94, 5]])


def mhvals(d: int) -> tuple[float, float]:
    """M(D), H(D) sqrt-interpolated from Martin 2006 Table 5
    (estnoisem.m:282-329)."""
    dm = _MH_TABLE
    idx = np.nonzero(d <= dm[:, 0])[0]
    if len(idx) == 0:
        i = len(dm) - 1
        j = i
    else:
        i = int(idx[0])
        j = i - 1
    if d == dm[i, 0]:
        return float(dm[i, 1]), float(dm[i, 2])
    qj, qi, q = np.sqrt(dm[i - 1, 0]), np.sqrt(dm[i, 0]), np.sqrt(d)
    h = dm[i, 2] + (q - qi) * (dm[j, 2] - dm[i, 2]) / (qj - qi)
    m = dm[i, 1] + (qi * qj / q - qj) * (dm[j, 1] - dm[i, 1]) / (qi - qj)
    return float(m), float(h)


def ms_derived(p: MsParams, fs: int) -> MsDerived:
    ni = _iround(p.ti * fs)
    nf = ni * _iround(p.of)
    tinc = ni / fs
    nv = _iround(p.td / (tinc * p.nu))
    nu = p.nu
    if nv < 4:
        nv = 4
        nu = max(_iround(p.td / (tinc * nv)), 1)
    nd = nu * nv
    md, hd = mhvals(nd)
    mv, hv = mhvals(nv)
    # analysis/synthesis window: sqrt(hamming(nf+1)) minus last sample,
    # normalized for unit OLA gain (ssubmmse.m:148-150)
    k = np.arange(nf + 1)
    ham = 0.54 - 0.46 * np.cos(2.0 * np.pi * k / nf)
    w = np.sqrt(ham[:nf])
    w = w / np.sqrt(np.sum(w[0:nf:ni] ** 2))
    # scalar fields as PYTHON floats (weak-typed in JAX): np.float64
    # scalars would silently promote float32 scan carries to float64 when
    # x64 is enabled, breaking the jitted MS step's carry invariant
    d = MsDerived(
        ni=ni, nf=nf, tinc=tinc, a=float(np.exp(-tinc / p.ta)),
        aca=float(np.exp(-tinc / p.taca)),
        amax=float(np.exp(-tinc / p.tamax)),
        aminh=float(np.exp(-tinc / p.taminh)),
        bmax=float(np.exp(-tinc / p.tbmax)),
        snrexp=float(-tinc / p.tpfall), nv=nv, nd=nd, md=md, hd=hd,
        mv=mv, hv=hv,
        nsms=10.0 ** (np.asarray(p.nsmdb) * nv * tinc / 10.0),
        qeqimax=float(1.0 / p.qeqmin), qeqimin=float(1.0 / p.qeqmax), win=w)
    d.nu_eff = nu
    return d


# ---------------------------------------------------------------------------
# Minimum-statistics noise tracker (estnoisem.m:199-260)
# ---------------------------------------------------------------------------

def estnoisem_np(yp: np.ndarray, p: MsParams, d: MsDerived,
                 state: dict | None = None) -> tuple[np.ndarray, dict]:
    """yp: (T, F) power spectra.  Returns (noise PSD (T, F), state)."""
    nr, nrf = yp.shape
    nu = d.nu_eff
    if state is None:
        st = dict(nrcum=0, ac=1.0, subwc=d.nv, ibuf=0,
                  p=yp[0].copy(), sn2=yp[0].copy(), pb=yp[0].copy(),
                  pb2=yp[0] ** 2, pminu=yp[0].copy(),
                  actmin=np.full(nrf, np.inf),
                  actminsub=np.full(nrf, np.inf),
                  actbuf=np.full((nu, nrf), np.inf),
                  lminflag=np.zeros(nrf, bool))
    else:
        st = {k: (v.copy() if isinstance(v, np.ndarray) else v)
              for k, v in state.items()}
    x = np.zeros_like(yp)
    pcur, sn2, pb, pb2 = st["p"], st["sn2"], st["pb"], st["pb2"]
    pminu, actmin, actminsub = st["pminu"], st["actmin"], st["actminsub"]
    actbuf, lminflag = st["actbuf"], st["lminflag"]
    ac, subwc, ibuf, nrcum = st["ac"], st["subwc"], st["ibuf"], st["nrcum"]

    for t in range(nr):
        yft = yp[t]
        acb = 1.0 / (1.0 + (np.sum(pcur) / np.sum(yft) - 1.0) ** 2)
        ac = d.aca * ac + (1 - d.aca) * max(acb, d.aca)   # acmax == aca
        ah = d.amax * ac / (1.0 + (pcur / sn2 - 1.0) ** 2)
        snr = np.sum(pcur) / np.sum(sn2)
        ah = np.maximum(ah, min(d.aminh, snr ** d.snrexp))
        pcur = ah * pcur + (1 - ah) * yft
        b = np.minimum(ah * ah, d.bmax)
        pb = b * pb + (1 - b) * pcur
        pb2 = b * pb2 + (1 - b) * pcur ** 2
        qeqi = np.maximum(np.minimum((pb2 - pb ** 2) / (2 * sn2 ** 2),
                                     d.qeqimax),
                          d.qeqimin / (t + 1 + nrcum))
        qiav = np.sum(qeqi) / nrf
        bc = 1 + p.av * np.sqrt(qiav)
        bmind = 1 + 2 * (d.nd - 1) * (1 - d.md) / (1.0 / qeqi - 2 * d.md)
        bminv = 1 + 2 * (d.nv - 1) * (1 - d.mv) / (1.0 / qeqi - 2 * d.mv)
        kmod = bc * pcur * bmind < actmin
        actmin = np.where(kmod, bc * pcur * bmind, actmin)
        actminsub = np.where(kmod, bc * pcur * bminv, actminsub)
        if 1 < subwc < d.nv:
            lminflag = lminflag | kmod
            pminu = np.minimum(actminsub, pminu)
            sn2 = pminu.copy()
        elif subwc >= d.nv:
            ibuf = 1 + (ibuf % nu)
            actbuf[ibuf - 1] = actmin.copy()
            pminu = actbuf.min(axis=0)
            nsm = d.nsms[int(np.nonzero(qiav < np.asarray(p.qith))[0][0])]
            lmin = (lminflag & ~kmod & (actminsub < nsm * pminu)
                    & (actminsub > pminu))
            if lmin.any():
                pminu = np.where(lmin, actminsub, pminu)
                actbuf[:, lmin] = pminu[lmin][None, :]
            lminflag = np.zeros(nrf, bool)
            actmin = np.full(nrf, np.inf)
            subwc = 0
        subwc += 1
        x[t] = sn2
    state_out = dict(nrcum=nrcum + nr, ac=ac, subwc=subwc, ibuf=ibuf,
                     p=pcur, sn2=sn2, pb=pb, pb2=pb2, pminu=pminu,
                     actmin=actmin, actminsub=actminsub, actbuf=actbuf,
                     lminflag=lminflag)
    return x, state_out


# ---------------------------------------------------------------------------
# Full MMSE enhancer (ssubmmse.m:141-215)
# ---------------------------------------------------------------------------

def ssubmmse_np(s: np.ndarray, fs: int, p: MsParams | None = None,
                state: dict | None = None, return_state: bool = False):
    """Chunk-capable MMSE enhancement; state carries the input tail, the
    OLA tail, the noise-tracker state, and xu (ssubmmse.m:95-128,202-215)."""
    p = p or MsParams()
    d = ms_derived(p, fs)
    ni, nf = d.ni, d.nf
    s = np.asarray(s, np.float64).reshape(-1)
    if state is not None:
        s = np.concatenate([state["si"], s])
        ze = state["ze"]
        ssv = state["ssv"]
        xu = state["xu"]
    else:
        ze = None
        ssv = np.zeros(ni * (_iround(p.of) - 1))
        xu = 1.0

    nr = (len(s) - nf + ni) // ni if len(s) >= nf else 0
    w = d.win
    if nr > 0:
        idx = ni * np.arange(nr)[:, None] + np.arange(nf)[None, :]
        y = s[idx] * w[None, :]
        yf = np.fft.rfft(y, nf, axis=1)
        yp = (yf * np.conj(yf)).real
        dp, ze = estnoisem_np(yp, p, d, ze)
        a = d.a
        gam = np.minimum(yp / dp, p.gx)
        g = np.zeros_like(gam)
        for i in range(nr):
            gami = gam[i]
            xi = a * xu + (1 - a) * np.maximum(gami - 1, p.xn)
            if p.lg:
                xir = xi / (1 + xi)
                arg = xir * gami
                gi = xir * np.exp(0.5 * exp1(np.maximum(arg, 1e-300)))
            else:
                v = 0.5 * xi * gami / (1 + xi)
                gi = (0.277 + 2 * v) / np.maximum(gami, 1e-300)
                mv_ = v < 0.5
                vm = v[mv_]
                kk = np.sqrt(2 * np.pi)
                gi[mv_] = kk * np.sqrt(vm) * ((0.5 + vm) * iv(0, vm)
                                              + vm * iv(1, vm)) \
                    / (np.maximum(gami[mv_], 1e-300) * np.exp(vm))
            g[i] = gi
            xu = gami * gi ** 2
        if p.bt >= 0:
            g = (g > p.bt).astype(np.float64)
        g = p.mx + (1 - p.mx) * g
        se = np.fft.irfft(yf * g, nf, axis=1) * w[None, :]
        total = ni * (nr + _iround(p.of) - 1)
        ss = np.zeros(total)
        ss[: len(ssv)] += ssv
        for i in range(nr):
            ss[i * ni: i * ni + nf] += se[i]
    else:
        ss = np.zeros(0)   # no full frame yet; ze stays as passed (or None)

    tail = ni * (_iround(p.of) - 1)
    if not return_state:
        return ss          # single-call form returns the full OLA stream
    if nr > 0:
        # zo.ssv = last tail samples; emitted ss loses them; zo.si = input
        # samples beyond the emitted length (ssubmmse.m:202-207)
        emitted = len(ss) - tail
        out_state = dict(ssv=ss[emitted:].copy(), si=s[emitted:].copy(),
                         ze=ze, xu=xu)
        return ss[:emitted], out_state
    return ss, dict(ssv=ssv, si=s, ze=ze, xu=xu)


# ---------------------------------------------------------------------------
# MMSE-SPP noise tracker (Gerkmann/Hendriks; src/MS/estnoiseg.m — present in
# the reference but caller-less; rebuilt as a selectable tracker)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MsgParams:
    """estnoiseg.m:86-94 defaults."""

    tax: float = 0.0717     # noise output smoothing time constant (8)
    tap: float = 0.152      # speech-prob smoothing time constant (23)
    psthr: float = 0.99     # smoothed speech-prob threshold (24)
    pnsaf: float = 0.01     # noise probability safety value (24)
    pspri: float = 0.5      # prior speech probability (18)
    asnr: float = 15.0      # active SNR in dB (18)
    psini: float = 0.5      # initial speech probability (23)
    tavini: float = 0.064   # assumed speech-absent time at start


def estnoiseg_np(yp: np.ndarray, tinc: float, p: MsgParams | None = None,
                 state: dict | None = None) -> tuple[np.ndarray, dict]:
    """yp: (T, F) power spectra -> (noise PSD per frame, state)."""
    p = p or MsgParams()
    nr, nrf = yp.shape
    ax = np.exp(-tinc / p.tax)
    ap = np.exp(-tinc / p.tap)
    xih1 = 10.0 ** (p.asnr / 10.0)
    xih1r = 1.0 / (1.0 + xih1) - 1.0
    pfac = (1.0 / p.pspri - 1.0) * (1.0 + xih1)
    if state is None:
        n0 = max(1, min(nr, _iround(1 + p.tavini / tinc)))
        xt = p.psini * yp[:n0].mean(axis=0)
        pslp = np.full(nrf, p.psini)
    else:
        xt = state["xt"].copy()
        pslp = state["pslp"].copy()
    x = np.zeros_like(yp)
    for t in range(nr):
        yft = yp[t]
        ph1y = 1.0 / (1.0 + pfac * np.exp(xih1r * yft / xt))
        pslp = ap * pslp + (1 - ap) * ph1y
        ph1y = np.minimum(ph1y, 1.0 - p.pnsaf * (pslp > p.psthr))
        xtr = (1.0 - ph1y) * yft + ph1y * xt
        xt = ax * xt + (1 - ax) * xtr
        x[t] = xt
    return x, {"xt": xt, "pslp": pslp}
