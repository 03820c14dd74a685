"""Missing-data-imputation sparse NMF (snmf_mdi / snmf_mdi_Sm rebuild)."""

import numpy as np
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.nmf.mdi import snmf_mdi_solve
from se_snmf_nat_tpu.nmf.solver import SnmfParams


@pytest.fixture()
def lowrank_problem():
    rng = np.random.default_rng(0)
    m, n, r = 64, 40, 5
    w_true = rng.random((m, r)) + 0.05
    h_true = rng.random((r, n)) + 0.05
    v = w_true @ h_true
    dm = (rng.random((m, n)) > 0.3).astype(np.float64)   # 30% missing
    w0 = rng.random((m, r)) + 0.05
    h0 = rng.random((r, n)) + 0.05
    return v, dm, w0, h0, r


def _params(max_iter=300, conv_eps=0.0):
    return SnmfParams(beta=1.0, sparsity=0.0, max_iter=max_iter,
                      conv_eps=conv_eps, flr=1e-9, precision="highest")


def test_mdi_reconstructs_missing_entries(lowrank_problem):
    v, dm, w0, h0, r = lowrank_problem
    res = snmf_mdi_solve(jnp.asarray(v), jnp.asarray(dm), jnp.asarray(w0),
                         jnp.asarray(h0), jnp.ones(r, bool),
                         jnp.ones(r, bool), _params())
    v_mdi = np.asarray(res.v_mdi)
    missing = dm == 0
    rel = np.abs(v_mdi[missing] - v[missing]).mean() / v[missing].mean()
    assert rel < 0.15            # low-rank completion recovers the holes
    # observed entries pass through exactly (max with flr)
    np.testing.assert_allclose(v_mdi[~missing], np.maximum(v, 1e-9)[~missing],
                               rtol=1e-6)


def test_mdi_soft_binary_equals_hard(lowrank_problem):
    v, dm, w0, h0, r = lowrank_problem
    args = (jnp.asarray(v), jnp.asarray(dm), jnp.asarray(w0),
            jnp.asarray(h0), jnp.ones(r, bool), jnp.ones(r, bool),
            _params(max_iter=50))
    hard = snmf_mdi_solve(*args, soft=False)
    soft = snmf_mdi_solve(*args, soft=True)
    np.testing.assert_array_equal(np.asarray(hard.v_mdi),
                                  np.asarray(soft.v_mdi))


def test_mdi_early_stop_and_nonneg(lowrank_problem):
    v, dm, w0, h0, r = lowrank_problem
    # with holes the imputation keeps moving the target and the cost decays
    # geometrically for hundreds of iterations (measured); the early-stop
    # criterion is asserted on the fully-observed case, where the solve
    # reduces to plain NMF and settles
    ones = jnp.ones_like(jnp.asarray(dm))
    noisy = v + np.random.default_rng(9).random(v.shape) * 0.2
    res_full = snmf_mdi_solve(jnp.asarray(noisy), ones, jnp.asarray(w0),
                              jnp.asarray(h0), jnp.ones(r, bool),
                              jnp.ones(r, bool), _params(max_iter=500,
                                                         conv_eps=5e-3))
    assert int(res_full.iters) < 500
    res = snmf_mdi_solve(jnp.asarray(v), jnp.asarray(dm), jnp.asarray(w0),
                         jnp.asarray(h0), jnp.ones(r, bool),
                         jnp.ones(r, bool), _params(max_iter=200,
                                                    conv_eps=1e-3))
    assert np.all(np.asarray(res.w) >= 0)
    assert np.all(np.asarray(res.v_mdi) > 0)
    # unit basis columns
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.w), axis=0), 1.0, atol=1e-6)


def test_mdi_matches_reference_loop_transcription(lowrank_problem):
    """3 fixed iterations vs a literal NumPy transcription of snmf_mdi.m."""
    v, dm, w0, h0, r = lowrank_problem
    flr = 1e-9
    res = snmf_mdi_solve(jnp.asarray(v), jnp.asarray(dm), jnp.asarray(w0),
                         jnp.asarray(h0), jnp.ones(r, bool),
                         jnp.ones(r, bool), _params(max_iter=3))

    wn = np.sqrt((w0 ** 2).sum(0))
    w = w0 / wn
    h = h0 * wn[:, None]
    lamb = np.maximum(w @ h, flr)
    vv = np.maximum(v * dm, flr)
    for _ in range(3):
        dph = np.maximum(w.sum(0)[:, None] + 0.0, flr)
        h = h * (w.T @ (vv / lamb)) / dph
        lamb = np.maximum(w @ h, flr)
        c = (vv / lamb) @ h.T
        dpw = np.maximum(h.sum(1)[None, :] + (c * w).sum(0)[None, :] * w, flr)
        dmw = c + (h.sum(1) * w.sum(0))[None, :] * w
        w = w * dmw / dpw
        w = w / np.sqrt((w ** 2).sum(0))
        lamb = np.maximum(w @ h, flr)
        v_est = np.maximum(w @ h, flr)
        vv = np.maximum(vv * dm + v_est * (1 - dm), flr)
    v_est = np.maximum(w @ h, flr)
    nt = (vv * dm).sum(0) / np.maximum((v_est * dm).sum(0), flr)
    want = np.maximum(vv * dm + (nt[None, :] * v_est) * (1 - dm), flr)
    np.testing.assert_allclose(np.asarray(res.v_mdi), want, rtol=1e-5)
