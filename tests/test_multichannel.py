"""Multichannel path: Khatri-Rao, NTF channel-loading factorization, and
the PMWF spectro-temporal beamformer."""

import numpy as np
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.multichannel import (
    khatri_rao, ntf_solve, spectro_temporal_cov, pmwf_filters,
    PmwfEnhancer, PmwfParams)
from se_snmf_nat_tpu.multichannel.ntf import default_c_init


def np_kr(a, b):
    k = a.shape[1]
    return np.stack([np.kron(a[:, i], b[:, i]) for i in range(k)], axis=1)


def test_khatri_rao_matches_kron():
    rng = np.random.default_rng(0)
    a, b = rng.random((4, 3)), rng.random((5, 3))
    np.testing.assert_allclose(np.asarray(khatri_rao(jnp.asarray(a),
                                                     jnp.asarray(b))),
                               np_kr(a, b), rtol=1e-12)
    c = rng.random((2, 3))
    want = np_kr(a, np_kr(b, c))
    got = khatri_rao(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def _synthetic_tensor(rng, c=3, n=32, m=20, k=4):
    b = rng.random((n, k)) + 0.05
    c_true = rng.random((c, k)) + 0.05
    a_true = rng.random((m, k)) + 0.05
    s = np.einsum("ck,nk,mk->cnm", c_true, b, a_true)
    return s, b, c_true, a_true


def test_ntf_cost_monotone_and_converges():
    rng = np.random.default_rng(1)
    s, b, c_true, a_true = _synthetic_tensor(rng)
    c0 = default_c_init(3, 4)
    res = ntf_solve(jnp.asarray(s), jnp.asarray(b), c0,
                    jnp.asarray(a_true), sparsity=0.0, max_iter=200,
                    conv_eps=0.0, update_c=True, update_a=False)
    # with B and A fixed at truth, C must fit the tensor closely
    xh = np.einsum("ck,nk,mk->cnm", np.asarray(res.c), np.asarray(
        np.asarray(b) / np.linalg.norm(b, axis=0)), a_true)
    rel = np.abs(xh - s).mean() / s.mean()
    assert rel < 5e-3
    assert float(res.div) >= 0


def test_ntf_early_stop():
    rng = np.random.default_rng(2)
    s, b, _, a_true = _synthetic_tensor(rng)
    res = ntf_solve(jnp.asarray(s), jnp.asarray(b), default_c_init(3, 4),
                    jnp.asarray(a_true), sparsity=1.0, max_iter=500,
                    conv_eps=1e-4)
    assert int(res.iters) < 500


def test_spectro_temporal_cov_matches_reference_loop():
    """Direct comparison against a literal PSD_cov_mat.m transcription
    (boundary collapse + center-frame temporal window)."""
    rng = np.random.default_rng(3)
    c, f, t = 2, 12, 9
    m_nbr, l_nbr = 2, 2
    y = rng.standard_normal((c, f, t)) + 1j * rng.standard_normal((c, f, t))

    def ref_cov_at(tc):
        scov = np.zeros((f, c, c), complex)
        for fi in range(f):
            cols = []
            for mp in range(-m_nbr, m_nbr + 1):
                for lp in range(-l_nbr, l_nbr + 1):
                    if fi - m_nbr < 0 or fi + m_nbr > f - 1:
                        cols.append(y[:, fi, tc + lp])
                    else:
                        cols.append(y[:, fi + mp, tc + lp])
            stf = np.stack(cols, axis=1)
            scov[fi] = stf @ stf.conj().T
        return scov

    covs = np.asarray(spectro_temporal_cov(jnp.asarray(y), m_nbr, l_nbr))
    for tc in (2, 4, 6):   # frames with a full temporal neighborhood
        np.testing.assert_allclose(covs[tc].reshape(f, c, c), ref_cov_at(tc),
                                   rtol=1e-10, atol=1e-10)


def test_pmwf_filter_identity_noise():
    """With Ncov = I and Ecov rank-1, H must align with the steering
    direction and scale by 1/(beta+lambda)."""
    f, c = 5, 3
    d = np.array([1.0, 0.5 + 0.5j, -0.25j])
    ecov = np.tile(np.outer(d, d.conj()), (f, 1, 1))
    ncov = np.tile(np.eye(c), (f, 1, 1)).astype(complex)
    beta = 10.0
    h = np.asarray(pmwf_filters(jnp.asarray(ncov), jnp.asarray(ecov),
                                beta, diag_load=0.0))
    lam = np.real(np.trace(ecov[0]))
    want_col0 = np.outer(d, d.conj())[:, 0] / (beta + lam + 1e-9)
    np.testing.assert_allclose(h[0, 0, :], want_col0, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_pmwf_beamforming_gains_snr():
    """2-channel scene: coherent target + independent noise.  The PMWF
    output must have higher SNR than the noisy reference channel."""
    rng = np.random.default_rng(7)
    fs = 16000
    n = 2 * fs
    target = np.sin(2 * np.pi * 500 * np.arange(n) / fs) * 3000
    target[: int(0.3 * fs)] = 0.0   # init period is noise-only
    noise = rng.standard_normal((2, n)) * 1000
    x = np.stack([target + noise[0], target + noise[1]])
    out = PmwfEnhancer(params=PmwfParams(beta=1.0),
                       dtype=jnp.float64).enhance(x, quantize=False)
    # compare mid-region correlation with the clean target
    lo, hi = int(0.5 * fs), int(1.5 * fs)
    ref_corr = np.corrcoef(x[0][lo:hi], target[lo:hi])[0, 1]
    out_corr = np.corrcoef(out[0][lo:hi], target[lo:hi])[0, 1]
    assert out_corr > ref_corr
