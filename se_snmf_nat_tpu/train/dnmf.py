"""Discriminative NMF dictionary refit (Weninger et al., Interspeech 2014).

Reference: run_basis_DNMF.m / run_basis_DNMF_Mel.m.  Given parallel clean
speech x and noise d, form the mixture y = x + d and:

  Eq. (6): infer activations A_hat on |Y|^pow with the full dictionary B
           held fixed (H-only solve);
  Eq. (7): refit B_x on |X|^pow and B_d on |D|^pow with the corresponding
           activation blocks held fixed (W-only solves).

Both domains share the code — the mel variant just projects each spectrogram
through the filterbank first (run_basis_DNMF_Mel.m:26-69).  All three solves
run on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from se_snmf_nat_tpu.config import PipelineConfig
from se_snmf_nat_tpu.nmf.solver import SnmfParams, snmf_solve
from se_snmf_nat_tpu.train.features import training_features
from se_snmf_nat_tpu.utils.matlab_compat import matlab_v4_rand_matrix


def _params(cfg: PipelineConfig) -> SnmfParams:
    return SnmfParams(beta=cfg.nmf.beta, sparsity=float(cfg.nmf.sparsity),
                      max_iter=cfg.nmf.max_iter, conv_eps=cfg.nmf.conv_eps,
                      flr=1e-9, precision=cfg.runtime.matmul_precision)


def dnmf_refit(x: np.ndarray, d: np.ndarray, b: np.ndarray,
               cfg: PipelineConfig, *, domain: str = "DFT",
               dtype=jnp.float32) -> np.ndarray:
    """Return the refit dictionary [B_x_hat, B_d_hat].

    x, d: time-domain int16-scale signals (length-matched by truncation,
    run_basis_DNMF.m:5-10);  b: (F, R_x+R_d) current dictionary in the
    chosen domain;  domain: 'DFT' or 'Mel'.
    """
    n = min(len(x), len(d))
    x, d = np.asarray(x, np.float64)[:n], np.asarray(d, np.float64)[:n]
    y = x + d

    def feat(sig):
        f = training_features(sig, cfg)
        return f.tf_mel if domain == "Mel" else f.tf_mag

    vx, vd, vy = feat(x), feat(d), feat(y)
    r_x, r_d = cfg.sep.r_x, cfg.sep.r_d
    r = r_x + r_d
    if b.shape[1] != r:
        raise ValueError(f"dictionary has {b.shape[1]} cols, expected {r}")
    params = _params(cfg)

    # Eq. (6): H-solve on the mixture, full dictionary fixed
    h0 = matlab_v4_rand_matrix(r, vy.shape[1], cfg.nmf.random_seed)
    res_h = snmf_solve(jnp.asarray(vy, dtype), jnp.asarray(b, dtype),
                       jnp.asarray(h0, dtype),
                       jnp.zeros(r, bool), jnp.ones(r, bool), params,
                       update_w=False, update_h=True)
    a_hat = np.asarray(res_h.h)

    # Eq. (7): W-solves with the inferred activations fixed
    def w_solve(v, w0, h_init):
        rr = w0.shape[1]
        res = snmf_solve(jnp.asarray(v, dtype), jnp.asarray(w0, dtype),
                         jnp.asarray(h_init, dtype),
                         jnp.ones(rr, bool), jnp.zeros(rr, bool), params,
                         update_w=True, update_h=False)
        return np.asarray(res.w)

    b_x = w_solve(vx, b[:, :r_x], a_hat[:r_x])
    b_d = w_solve(vd, b[:, r_x:], a_hat[r_x:])
    return np.concatenate([b_x, b_d], axis=1)
