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


def test_solve_hpd_small_coherent_rank1_no_nan():
    """f32 robustness gate for the unrolled Cholesky's pivot floor.

    Perfectly coherent channels (one signal with per-channel sample
    offsets — the adversarial form of real mic-array coherence at low
    frequencies) make the per-bin covariance rank-1 with entries many
    orders above the reference's ABSOLUTE eps*I load
    (PMWF_sep_event_RT_CHiME.m:148): in complex64 the Schur complement
    rounds negative and an unguarded sqrt poisons the filter bank with
    NaN.  The eps-relative pivot floor must (a) keep degenerate solves
    finite and (b) be bit-exact on well-conditioned solves."""
    from se_snmf_nat_tpu.multichannel.pmwf import solve_hpd_small
    rng = np.random.default_rng(3)
    c = 3
    # (a) rank-1, entries ~1e8, absolute load 1e-3 (the shipped default)
    d = (rng.standard_normal(c) + 1j * rng.standard_normal(c)) * 1e4
    a1 = np.outer(d, d.conj())[None] * np.ones((7, 1, 1)) \
        + 1e-3 * np.eye(c)[None]
    b1 = (rng.standard_normal((7, c, c))
          + 1j * rng.standard_normal((7, c, c)))
    x1 = np.asarray(solve_hpd_small(jnp.asarray(a1, jnp.complex64),
                                    jnp.asarray(b1, jnp.complex64)))
    assert np.isfinite(x1).all()
    # (b) well-conditioned: matches the LAPACK solve to f32 tolerance
    m = rng.standard_normal((7, c, c)) + 1j * rng.standard_normal((7, c, c))
    a2 = m @ np.conj(np.swapaxes(m, 1, 2)) + np.eye(c)[None]
    x2 = np.asarray(solve_hpd_small(jnp.asarray(a2, jnp.complex64),
                                    jnp.asarray(b1, jnp.complex64)))
    np.testing.assert_allclose(x2, np.linalg.solve(a2, b1),
                               rtol=3e-4, atol=3e-5)


def test_pmwf_streaming_coherent_input_finite():
    """End-to-end form of the coherent-covariance NaN gate: a 6-channel
    stream of one rolled signal through PmwfStreamingSession (f32, the
    demo/serving configuration) must emit finite PCM.  Six channels is
    the shape that MEASURED NaN-from-the-first-frame before the
    eps-relative loading (the C=6 substitution chain amplifies the
    clamped-pivot solve past f32 max; C=3 merely produced ~1e11 garbage,
    so this gate must stay at C>=6)."""
    from se_snmf_nat_tpu.multichannel.streaming import PmwfStreamingSession
    rng = np.random.default_rng(11)
    x = (rng.standard_normal(9000) * 3000.0).astype(np.float64)
    xs = np.stack([np.roll(x, 7 * c) for c in range(6)])
    sess = PmwfStreamingSession(n_ch=6, block_frames=8, dtype=jnp.float32)
    outs = [sess.push(xs[:, i: i + 1600], quantize=False)
            for i in range(0, 9000, 1600)]
    y = np.concatenate([o for o in outs if o.size] + [
        sess.flush(quantize=False)], axis=1)
    assert y.size and np.isfinite(y).all()
    # the enhanced output must also be non-degenerate (not all zeros)
    assert float(np.abs(y).max()) > 1.0
