"""NumPy oracle of the per-frame enhancement engine.

Models src/bnmf_sep_event_RT_IS16.m + src/init_buff.m + src/blk_sparse.m +
src/synth_ifft_buff.m for the shipped configurations (blk_len_sep = 1,
splice = 0 — the reference's block/splice branches are unreachable dead code
for m=1 and index out of bounds otherwise, see engine :85-100).

Reproduces reference quirks on purpose:
  * the adapted noise dictionary is rebuilt as [remaining, refit, fixed-tail]
    with column *reordering* (engine :316, :336);
  * the fixed tail always comes from the never-updated mirror slot
    (B_Mel_d, engine :328), i.e. it is pinned to the original dictionary;
  * per-frame solver reseeding with the legacy V4 generator;
  * the Ad_blk/A_d state initializers draw from MATLAB's startup Twister
    stream (init_buff.m:37-38).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from se_snmf_nat_tpu.config import PipelineConfig
from se_snmf_nat_tpu.dsp.windows import sqrt_hann_periodic
from se_snmf_nat_tpu.oracle.sparse_nmf_np import sparse_nmf_np
from se_snmf_nat_tpu.utils.matlab_compat import MatlabTwister


@dataclass
class OracleState:
    b_sep_x: np.ndarray      # separation-domain speech basis (g.B_Mel_x slot)
    b_sep_d: np.ndarray      # separation-domain noise basis (g.B_Mel_d slot)
    b_dft_x: np.ndarray      # DFT-domain speech basis (g.B_DFT_x slot)
    b_dft_d: np.ndarray      # DFT-domain noise basis (g.B_DFT_d slot)
    ad_blk: np.ndarray       # (R_a, m_a) activation ring
    lambda_d_blk: np.ndarray  # (F, m_a) noise-reference ring
    lambda_dav: np.ndarray   # (F, 1) smoothed noise PSD
    lambda_gy: np.ndarray    # (F, 1)
    xm_tilde: np.ndarray     # (F, 1) previous enhanced spectrum
    r_blk: np.ndarray        # (F, P_len_l) SNR history ring
    update_switch: int = 1
    melmat: np.ndarray | None = None


def init_state(b1_x, b1_d, b2_x, b2_d, cfg: PipelineConfig,
               twister: MatlabTwister | None = None) -> OracleState:
    """init_buff.m equivalent.  b1_* are the separation-domain bases,
    b2_* the DFT reconstruction bases (callers select per B_sep_mode,
    filewise_run_IS16.m:46-51)."""
    f = b2_x.shape[0]
    tw = twister or MatlabTwister(0)
    _ = tw.rand(b2_d.shape[1], cfg.sep.blk_len_sep)       # g.A_d (unused)
    ad_blk = tw.rand(cfg.adapt.r_a, cfg.adapt.m_a)        # g.Ad_blk
    melmat = None
    if cfg.sep.b_sep_mode == "Mel":
        from se_snmf_nat_tpu.dsp.mel import mel_matrix
        melmat = mel_matrix(cfg.signal.fs, cfg.signal.f_order,
                            cfg.signal.fftlength, 1.0, cfg.signal.fs / 2).T
    return OracleState(
        b_sep_x=np.array(b1_x, dtype=np.float64),
        b_sep_d=np.array(b1_d, dtype=np.float64),
        b_dft_x=np.array(b2_x, dtype=np.float64),
        b_dft_d=np.array(b2_d, dtype=np.float64),
        ad_blk=ad_blk,
        lambda_d_blk=np.zeros((f, cfg.adapt.m_a)),
        lambda_dav=np.zeros((f, 1)),
        lambda_gy=np.zeros((f, 1)),
        xm_tilde=np.zeros((f, 1)),
        r_blk=np.zeros((f, cfg.blk.p_len_l)),
        update_switch=1,
        melmat=melmat,
    )


def blk_sparse_np(x: np.ndarray, d: np.ndarray, r_blk: np.ndarray, l: int,
                  cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray]:
    """src/blk_sparse.m — Hoyer sparsity of local T-F blocks of the
    speech/noise SNR map, with the reference's DD-vs-untouched-init quirk."""
    b = cfg.blk
    dcbin = cfg.signal.dc_bin
    k_dim = x.shape[0]
    gap2 = (b.blk_gap - 1) // 2

    snr = x / np.maximum(d, cfg.signal.nonzerofloor)
    snr = snr / snr.max(axis=0, keepdims=True)
    r_out = np.concatenate([r_blk[:, 1:], snr], axis=1)

    q = np.concatenate([np.zeros(dcbin), 0.1 * np.ones(k_dim - dcbin)])
    n = b.p_len_l * b.p_len_k
    half = b.p_len_k // 2
    if l > b.p_len_l:
        # centers (1-based): half+dcbin : gap : K-half
        for k1 in range(half + dcbin, k_dim - half + 1, b.blk_gap):
            blk = r_out[k1 - half : k1 + half, :]     # rows k1-half+1..k1+half
            l1 = blk.sum()
            l2 = np.sqrt((blk * blk).sum())
            p_tmp = (np.sqrt(n) - l1 / l2) / (np.sqrt(n) - 1.0)
            p_val = b.alpha_p * q[k1 - 2] + (1.0 - b.alpha_p) * p_tmp
            q[k1 - 1 - gap2 : k1] = p_val
            q[k1 - 1 : k1 + gap2] = p_val
        q[: b.p_len_k - 1] = q[b.p_len_k + dcbin - 1]
    q[:dcbin] = 0.0
    return q[:, None], r_out


def synth_frame_np(mag: np.ndarray, phase: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """src/synth_ifft_buff.m for one column + overlapscale."""
    s = cfg.signal
    m = mag.copy()
    m[: s.dc_bin_back] = 0.0
    amp = m ** (1.0 / s.pow)
    spec = amp * np.exp(1j * phase)
    y = np.fft.irfft(spec, n=s.fftlength)[: s.framelength]
    y = y * sqrt_hann_periodic(s.framelength)
    if s.preemph != 0.0:
        out = np.empty_like(y)
        acc = 0.0
        for i in range(len(y)):
            acc = y[i] + s.preemph * acc
            out[i] = acc
        y = out
    return y * s.overlapscale


class OracleEngine:
    """Stateful per-frame engine (one 640-sample frame in, 640 out)."""

    def __init__(self, cfg: PipelineConfig, state: OracleState):
        assert cfg.sep.blk_len_sep == 1 and cfg.sep.splice == 0, \
            "reference block/splice branches are unreachable (engine :85-100)"
        self.cfg = cfg
        self.g = state
        self.win = sqrt_hann_periodic(cfg.signal.framelength)

    # -- helpers ----------------------------------------------------------
    def _solve_params(self):
        n = self.cfg.nmf
        return dict(cf=n.cf, sparsity=float(n.sparsity), max_iter=n.max_iter,
                    conv_eps=n.conv_eps, random_seed=n.random_seed,
                    cost_check=n.cost_check)

    def step(self, y: np.ndarray, l: int) -> np.ndarray:
        """Process frame l (1-based).  Returns the enhanced frame x_tilde."""
        cfg, g = self.cfg, self.g
        s, sep, ad, en = cfg.signal, cfg.sep, cfg.adapt, cfg.enhance
        flr = s.nonzerofloor
        r_x = g.b_dft_x.shape[1]
        r_d = g.b_dft_d.shape[1]

        # ---- STFT (engine :67-78)
        yy = np.asarray(y, dtype=np.float64).reshape(-1)
        if s.preemph != 0.0:
            yy = yy - s.preemph * np.concatenate([[0.0], yy[:-1]])
        spec = np.fft.rfft(yy * self.win, n=s.fftlength)
        yp = np.angle(spec)[:, None]
        ym = (np.abs(spec) ** s.pow)[:, None]
        ym[: s.dc_bin] = 0.0
        ym = ym + flr

        # ---- separation domain
        if sep.b_sep_mode == "Mel":
            ym_mel = g.melmat @ ym
            vn = np.sqrt((ym_mel ** 2).sum(axis=0))
            tn = np.sqrt((ym ** 2).sum(axis=0))
            ym_mel = ym_mel / vn + 1e-9
            ym_mel = ym_mel * tn
            y_sep = ym_mel
            b_sep = np.concatenate([g.b_sep_x, g.b_sep_d], axis=1)
        else:
            y_sep = ym
            b_sep = np.concatenate([g.b_dft_x, g.b_dft_d], axis=1)

        # ---- H-solve (engine :125-154)
        r = r_x + r_d
        if sep.basis_update_n and sep.basis_update_e:
            w_ind = np.ones(r, bool)
        elif sep.basis_update_n:
            w_ind = np.concatenate([np.zeros(r_x, bool), np.ones(r_d, bool)])
        elif sep.basis_update_e:
            w_ind = np.concatenate([np.ones(r_x, bool), np.zeros(r_d, bool)])
        else:
            w_ind = np.zeros(r, bool)
        _, a, _ = sparse_nmf_np(
            y_sep, init_w=b_sep, w_update_ind=w_ind,
            h_update_ind=np.ones(r, bool), **self._solve_params())

        # ---- reconstructions (engine :158-211); EVENT/NOISE groups summed
        b_dft = np.concatenate([g.b_dft_x, g.b_dft_d], axis=1)
        if sep.b_sep_mode == "Mel" and sep.mel_conv:
            xm_hat = g.melmat.T @ (b_sep[:, :r_x] @ a[:r_x])
            dm_hat = g.melmat.T @ (b_sep[:, r_x:] @ a[r_x:])
            ym_dft = g.melmat.T @ ym_mel
        else:
            xm_hat = b_dft[:, :r_x] @ a[:r_x]
            dm_hat = b_dft[:, r_x:] @ a[r_x:]
            ym_dft = ym

        # ---- block sparsity (engine :213-218)
        if cfg.blk.enabled:
            q, g.r_blk = blk_sparse_np(xm_hat, dm_hat, g.r_blk, l, cfg)
        else:
            q = np.ones_like(ym)

        # ---- gain construction (engine :221-260)
        if l == 1:
            g.lambda_dav = ym_dft.copy()
        a_d_mag = a[r_x: r_x + r_d].sum() / r_d
        a_x_mag = a[:r_x].sum() / r_x
        beta = 20.0 * np.log10(a_d_mag / a_x_mag) * en.beta
        beta = min(max(beta, en.beta), en.beta_max)

        g.lambda_dav = en.alpha_d * g.lambda_dav + (1 - en.alpha_d) * dm_hat * beta
        lambda_d = g.lambda_dav

        if en.method == "Wiener":
            gain = xm_hat / (xm_hat + dm_hat)
        else:  # MMSE
            eta = (en.alpha_eta * g.xm_tilde
                   + (1 - en.alpha_eta) * xm_hat * q) / np.maximum(lambda_d, flr)
            eta = np.maximum(en.eta_floor, eta)
            gain = eta / (eta + 1.0)
        gain = np.minimum(gain, 1.0)

        if l <= ad.init_n_len:
            gain = np.zeros_like(ym) + flr
            a_x_mag = flr
        xm_tilde = gain * ym

        # ---- online noise-dictionary adaptation (engine :262-347)
        q_control = (1.0 - q.mean()) * ad.ar_up
        if ad.adapt_train_n and q_control * a_d_mag > a_x_mag:
            if l <= ad.init_n_len:
                d_ref = ym.copy()
            else:
                m_ref = 1.0 - gain
                m_ref[: s.dc_bin] = flr
                d_ref = ym * m_ref
            if l == 1:
                g.lambda_gy = ym.copy()
            g.lambda_gy = d_ref
            g.lambda_d_blk = np.concatenate(
                [g.lambda_d_blk[:, 1:], g.lambda_gy], axis=1)
            g.ad_blk = np.concatenate(
                [g.ad_blk[:, 1:], a[r_x: r_x + ad.r_a]], axis=1)

            r_up = q_control * g.ad_blk.mean(axis=1) > a_x_mag
            ad_up = g.ad_blk * r_up[:, None]
            ad_up = ad_up[np.any(ad_up != 0.0, axis=1)]   # compact rows

            if g.update_switch == ad.update_period:
                if sep.b_sep_mode == "Mel":
                    target = g.melmat @ g.lambda_d_blk
                    b_live = g.b_sep_d
                else:
                    target = g.lambda_d_blk
                    b_live = g.b_dft_d
                head = b_live[:, : ad.r_a]
                b_up = head * r_up[None, :]
                b_up = b_up[:, np.any(b_up != 0.0, axis=0)]
                b_rem = head * (~r_up)[None, :]
                b_rem = b_rem[:, np.any(b_rem != 0.0, axis=0)]
                # fixed tail always read from the never-updated mirror slot
                # (engine :307/:328) == the original dictionary tail
                b_fix = g.b_sep_d[:, ad.r_a:]
                r_a_up = b_up.shape[1]
                if r_a_up > 0:
                    b_new, _, _ = sparse_nmf_np(
                        target, init_w=b_up, init_h=ad_up,
                        w_update_ind=np.ones(r_a_up, bool),
                        h_update_ind=np.zeros(r_a_up, bool),
                        **self._solve_params())
                    merged = np.concatenate([b_rem, b_new, b_fix], axis=1)
                else:
                    merged = np.concatenate([b_rem, b_fix], axis=1)
                if sep.b_sep_mode == "Mel":
                    g.b_sep_d = merged
                else:
                    g.b_dft_d = merged
                g.update_switch = 1
            else:
                g.update_switch += 1

        # ---- iSTFT (engine :349-363)
        x_tilde = synth_frame_np(xm_tilde[:, 0], yp[:, 0], cfg)
        g.xm_tilde = xm_tilde
        return x_tilde
