"""Multi-chip layouts on the virtual 8-device CPU mesh: the distributed MU
trainer must equal the single-chip update, and the DP enhancement batch must
equal per-utterance results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.parallel.mesh import make_mesh, data_sharding
from se_snmf_nat_tpu.parallel.train_step import (
    distributed_mu_step, make_distributed_train_step)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    return make_mesh((8, 1))


def _problem(f=64, r=16, t=512, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.random((f, t)) + 0.01
    w = rng.random((f, r)) + 0.01
    h = rng.random((r, t)) + 0.01
    return v, w, h


def test_distributed_mu_equals_single_chip(mesh):
    v, w, h = _problem()
    w1, h1 = distributed_mu_step(jnp.asarray(v), jnp.asarray(w),
                                 jnp.asarray(h))
    w8, h8 = distributed_mu_step(jnp.asarray(v), jnp.asarray(w),
                                 jnp.asarray(h), mesh=mesh)
    np.testing.assert_allclose(np.asarray(w8), np.asarray(w1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(h8), np.asarray(h1), rtol=1e-12)


def test_jitted_train_step_sharded(mesh):
    v, w, h = _problem(t=1024)
    step = make_distributed_train_step(mesh, n_iter=5)
    vj = jax.device_put(jnp.asarray(v), data_sharding(mesh, 2, 1))
    hj = jax.device_put(jnp.asarray(h), data_sharding(mesh, 2, 1))
    w5, h5 = step(vj, jnp.asarray(w), hj)
    # reference: 5 sequential single-chip steps
    wr, hr = jnp.asarray(w), jnp.asarray(h)
    for _ in range(5):
        wr, hr = distributed_mu_step(jnp.asarray(v), wr, hr)
    np.testing.assert_allclose(np.asarray(w5), np.asarray(wr), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(h5), np.asarray(hr), rtol=1e-10)
    # output sharding preserved
    assert w5.sharding.is_fully_replicated


def test_dp_enhancement_batch_sharded(mesh, reference_bases, m03_wav):
    """Shard an utterance batch over 'data' through the full vmapped scan."""
    from se_snmf_nat_tpu.config import default_config
    from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

    speech, noise = reference_bases
    x, _ = m03_wav
    x = x[:6000]
    cfg = default_config()
    enh = SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft,
                       noise.b_dft, dtype=jnp.float32)
    frames = enh.frames_for(x)
    batch = jnp.asarray(np.stack([frames] * 8), jnp.float32)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (8,) + a.shape), enh.initial_state())

    sharded_frames = jax.device_put(batch, data_sharding(mesh, 3, 0))
    ys, _ = enh._run_batch(sharded_frames, states)
    y0, _ = enh._run(jnp.asarray(frames, jnp.float32), enh.initial_state())
    for i in range(8):
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(y0),
                                   rtol=0, atol=1e-4)


def test_model_sharded_h_solve_matches_unsharded():
    """Real TP compute: dictionary columns sharded over 'model' (2x4 mesh).
    The psum'd global-lambda H-solve must reproduce the unsharded
    snmf_h_solve_columns to summation-order rounding, with identical
    per-column convergence (exemplar-scale use case, SURVEY §2.7 TP)."""
    from se_snmf_nat_tpu.nmf.solver import SnmfParams, snmf_h_solve_columns
    from se_snmf_nat_tpu.parallel.model_shard import (
        snmf_h_solve_columns_model_sharded)

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(0)
    f, r, n = 48, 64, 24
    v = jnp.asarray(rng.random((f, n)) + 0.01)
    w = jnp.asarray(rng.random((f, r)) + 0.01)
    h0 = jnp.asarray(rng.random((r, n)) + 0.01)
    params = SnmfParams(beta=1.0, sparsity=5.0, max_iter=60, conv_eps=1e-4,
                        flr=1e-9, precision="highest")

    ref = snmf_h_solve_columns(v, w, h0, params)
    got = snmf_h_solve_columns_model_sharded(v, w, h0, params, mesh)
    np.testing.assert_allclose(np.asarray(got.h), np.asarray(ref.h),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got.w), np.asarray(ref.w),
                               rtol=1e-12)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(float(got.div), float(ref.div), rtol=1e-9)
    # H really is model-sharded (atoms split over the 'model' axis)
    assert not got.h.sharding.is_fully_replicated


@pytest.mark.parametrize("beta", [0.0, 2.0])
def test_model_sharded_h_solve_beta_family(beta):
    """IS (β=0) and ED (β=2) — the rest of the reference cf map
    (src/sparse_nmf.m:99-110) — through the same psum'd-Λ TP solve."""
    from se_snmf_nat_tpu.nmf.solver import SnmfParams, snmf_h_solve_columns
    from se_snmf_nat_tpu.parallel.model_shard import (
        snmf_h_solve_columns_model_sharded)

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(int(beta) + 3)
    f, r, n = 48, 64, 24
    v = jnp.asarray(rng.random((f, n)) + 0.01)
    w = jnp.asarray(rng.random((f, r)) + 0.01)
    h0 = jnp.asarray(rng.random((r, n)) + 0.01)
    params = SnmfParams(beta=beta, sparsity=2.0, max_iter=40, conv_eps=1e-4,
                        flr=1e-9, precision="highest")
    ref = snmf_h_solve_columns(v, w, h0, params)
    got = snmf_h_solve_columns_model_sharded(v, w, h0, params, mesh)
    np.testing.assert_allclose(np.asarray(got.h), np.asarray(ref.h),
                               rtol=1e-8)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(float(got.div), float(ref.div), rtol=1e-8)


@pytest.mark.parametrize("beta", [0.0, 1.0, 2.0])
def test_model_sharded_full_solve_matches_unsharded(beta):
    """Full W+H TP solve (training / ring-buffer refit analog) equals
    snmf_solve to summation-order rounding for every reference β."""
    from se_snmf_nat_tpu.nmf.solver import SnmfParams, snmf_solve
    from se_snmf_nat_tpu.parallel.model_shard import snmf_solve_model_sharded

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(int(beta) + 11)
    f, r, n = 40, 32, 96
    v = jnp.asarray(rng.random((f, n)) + 0.01)
    w0 = jnp.asarray(rng.random((f, r)) + 0.01)
    h0 = jnp.asarray(rng.random((r, n)) + 0.01)
    mask = jnp.ones((r,), bool)
    params = SnmfParams(beta=beta, sparsity=1.0, max_iter=25, conv_eps=1e-5,
                        flr=1e-9, precision="highest")
    ref = snmf_solve(v, w0, h0, mask, mask, params,
                     update_w=True, update_h=True)
    got = snmf_solve_model_sharded(v, w0, h0, params, mesh)
    np.testing.assert_allclose(np.asarray(got.w), np.asarray(ref.w),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(got.h), np.asarray(ref.h),
                               rtol=1e-7)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(float(got.cost), float(ref.cost), rtol=1e-8)
    assert not got.w.sharding.is_fully_replicated


def test_model_sharded_w_refit_masked():
    """The engine's online W-only dictionary refit
    (bnmf_sep_event_RT_IS16.m:293-346: W-update on the noise ring buffer,
    a sub-dictionary mask selecting which atoms move) under TP: masked
    sharded refit equals the masked unsharded snmf_solve."""
    from se_snmf_nat_tpu.nmf.solver import SnmfParams, snmf_solve
    from se_snmf_nat_tpu.parallel.model_shard import snmf_solve_model_sharded

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(7)
    f, r, n = 40, 32, 64
    v = jnp.asarray(rng.random((f, n)) + 0.01)
    w0 = jnp.asarray(rng.random((f, r)) + 0.01)
    h0 = jnp.asarray(rng.random((r, n)) + 0.01)
    w_mask = jnp.asarray(rng.random((r,)) > 0.4)
    h_mask = jnp.ones((r,), bool)
    params = SnmfParams(beta=1.0, sparsity=5.0, max_iter=30, conv_eps=1e-4,
                        flr=1e-9, precision="highest")
    ref = snmf_solve(v, w0, h0, w_mask, h_mask, params,
                     update_w=True, update_h=False)
    got = snmf_solve_model_sharded(v, w0, h0, params, mesh,
                                   w_mask=w_mask, h_mask=h_mask,
                                   update_w=True, update_h=False)
    np.testing.assert_allclose(np.asarray(got.w), np.asarray(ref.w),
                               rtol=1e-8)
    assert int(got.iters) == int(ref.iters)


def test_model_sharded_rank_guard():
    from se_snmf_nat_tpu.nmf.solver import SnmfParams
    from se_snmf_nat_tpu.parallel.model_shard import (
        snmf_h_solve_columns_model_sharded)
    mesh = make_mesh((2, 4))
    params = SnmfParams()
    with pytest.raises(ValueError):
        snmf_h_solve_columns_model_sharded(
            jnp.ones((8, 4)), jnp.ones((8, 6)), jnp.ones((6, 4)),
            params, mesh)
