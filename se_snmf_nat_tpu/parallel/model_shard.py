"""Model-parallel solves: dictionary columns sharded over 'model'.

The reference's largest factorizations are the exemplar configs (R = 500+
per class, settings/bak_IS16_results/initial_setting_Exemplar*.m) and the
NTF unfoldings; SURVEY §2.7 names column sharding over a 'model' axis as
the TP story.  This module supplies the actual model-parallel compute:

  W (F, R)  — columns sharded over 'model'
  H (R, N)  — rows sharded over 'model' (each shard owns its atoms'
              activations)
  V (F, N)  — replicated

Per MU iteration each shard computes its local partial reconstruction
W_s @ H_s; ONE psum over 'model' yields the global Λ (F x N floats — the
only cross-shard traffic per Λ rebuild).  Given the global Λ, every
β-divergence update in the reference family (src/sparse_nmf.m:99-110 cf
map: β=0 IS, β=1 KL, β=2 ED, general β) is purely local:

  H update — numerator Wₛᵀ·(V·Λ^(β−2)) and denominator Wₛᵀ·Λ^(β−1) +
  sparsity both touch only the shard's own atoms.
  W update — the tangent-space-corrected step's cross terms
  (sparse_nmf.m:199-265) are per-COLUMN reductions over F, so they too
  stay on the column's owning shard; column re-normalization is local.

Two entry points mirror the unsharded solver family (nmf/solver.py):

* ``snmf_h_solve_columns_model_sharded`` — activation-only solve with the
  reference's per-column relative-cost early stop, evaluated on the global
  Λ so every shard freezes the same columns on the same iteration.
* ``snmf_solve_model_sharded``          — full W(+H) solve (training /
  the engine's ring-buffer dictionary refit,
  bnmf_sep_event_RT_IS16.m:293-346) reusing the SAME ``_h_step``/
  ``_w_step`` bodies as the unsharded ``snmf_solve``; only the Λ rebuild
  differs (psum).  The scalar relative-cost test uses the psum'd global
  cost, so all shards stop together.

Results match the unsharded solvers to summation-order rounding
(tests/test_sharding.py gates all three β values).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from se_snmf_nat_tpu.nmf.solver import (
    SnmfParams, SnmfResult, _divergence, _h_step, _w_step, normalize_columns)


def _psum(x, axis):
    return lax.psum(x, axis) if axis is not None else x


def _h_solve_local(v, w_s, h_s, params: SnmfParams, axis: str | None):
    """Per-shard per-column H-solve; psum over `axis` builds the global Λ
    and the sparsity part of the per-column cost."""
    prec = params.lax_precision
    flr = jnp.asarray(params.flr, v.dtype)
    sparsity = jnp.asarray(params.sparsity, v.dtype)
    beta = params.beta

    v = jnp.maximum(v, flr)
    # entry normalization (sparse_nmf.m:157-160) is columnwise — local
    w_s, wn = normalize_columns(w_s)
    h_s = h_s * wn[:, None]

    def global_lambda(h_s):
        part = jnp.matmul(w_s, h_s, precision=prec)
        return jnp.maximum(_psum(part, axis), flr)

    def sparsity_cost(h_s):
        return _psum(jnp.sum(sparsity * h_s, axis=0), axis)

    lamb = global_lambda(h_s)
    n = v.shape[1]
    if beta == 1.0:
        dph_base = jnp.maximum(
            jnp.sum(w_s, axis=0)[:, None] + sparsity, flr)

    def col_div(lamb):
        if beta == 1.0:
            return jnp.sum(v * jnp.log(v / lamb) - v + lamb, axis=0)
        if beta == 2.0:
            return jnp.sum((v - lamb) ** 2, axis=0)
        if beta == 0.0:
            return jnp.sum(v / lamb - jnp.log(v / lamb) - 1.0, axis=0)
        return jnp.sum(v ** beta + (beta - 1.0) * lamb ** beta
                       - beta * v * lamb ** (beta - 1.0), axis=0) \
            / (beta * (beta - 1.0))

    def body(carry):
        it, h_s, lamb, last_cost, active = carry
        if beta == 1.0:
            h_new = h_s * jnp.matmul(w_s.T, v / lamb, precision=prec) \
                / dph_base
        elif beta == 2.0:
            dph = jnp.maximum(
                jnp.matmul(w_s.T, lamb, precision=prec) + sparsity, flr)
            h_new = h_s * jnp.matmul(w_s.T, v, precision=prec) / dph
        else:
            dph = jnp.maximum(
                jnp.matmul(w_s.T, lamb ** (beta - 1.0), precision=prec)
                + sparsity, flr)
            h_new = h_s * jnp.matmul(
                w_s.T, v * lamb ** (beta - 2.0), precision=prec) / dph
        h_s = jnp.where(active[None, :], h_new, h_s)
        lamb = global_lambda(h_s)
        if params.conv_eps > 0:
            cost = col_div(lamb) + sparsity_cost(h_s)
            rel = jnp.abs(cost - last_cost) / jnp.abs(last_cost)
            newly_done = jnp.logical_and(it > 0, rel < params.conv_eps)
            active = jnp.logical_and(active, jnp.logical_not(newly_done))
        else:
            # fixed-iteration mode: skip the convergence-test cost, as the
            # unsharded solver does (nmf/solver.py)
            cost = last_cost
        return it + 1, h_s, lamb, cost, active

    def cond(carry):
        it, _, _, _, active = carry
        return jnp.logical_and(it < params.max_iter, jnp.any(active))

    init = (jnp.asarray(0, jnp.int32), h_s, lamb,
            jnp.full((n,), jnp.inf, v.dtype), jnp.ones((n,), bool))
    it, h_s, lamb, cost, _ = lax.while_loop(cond, body, init)
    div = _divergence(v, lamb, beta)
    cost_total = jnp.sum(cost) if params.conv_eps > 0 \
        else div + _psum(jnp.sum(sparsity * h_s), axis)
    return w_s, h_s, it, div, cost_total


def snmf_h_solve_columns_model_sharded(v, w, h0, params: SnmfParams,
                                       mesh: Mesh) -> SnmfResult:
    """Model-parallel drop-in for ``snmf_h_solve_columns`` (all β).

    v: (F, N) replicated; w: (F, R) and h0: (R, N) sharded over 'model' on
    the R axis (R must divide by the 'model' axis size).  Returns the same
    SnmfResult (w normalized, h solved, iters, div, cost) with h/w carrying
    the model sharding.
    """
    r = w.shape[1]
    mp = mesh.shape["model"]
    if r % mp:
        raise ValueError(f"rank {r} not divisible by model axis {mp}")

    fn = jax.shard_map(
        partial(_h_solve_local, params=params, axis="model"),
        mesh=mesh,
        in_specs=(P(), P(None, "model"), P("model", None)),
        out_specs=(P(None, "model"), P("model", None), P(), P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(fn,
                     in_shardings=(NamedSharding(mesh, P()),
                                   NamedSharding(mesh, P(None, "model")),
                                   NamedSharding(mesh, P("model", None))))
    w_out, h_out, it, div, cost = jitted(v, w, h0)
    return SnmfResult(w=w_out, h=h_out, iters=it, div=div, cost=cost)


def _solve_local(v, w_s, h_s, w_mask_s, h_mask_s, params: SnmfParams,
                 axis: str | None, update_w: bool, update_h: bool):
    """Per-shard full-solve body: ``snmf_solve``'s loop with the Λ rebuild
    psum'd.  ``_h_step``/``_w_step`` are the unsharded update bodies —
    given the global Λ they only touch the shard's own columns/rows."""
    prec = params.lax_precision
    flr = jnp.asarray(params.flr, v.dtype)
    sparsity = jnp.asarray(params.sparsity, v.dtype)
    beta = params.beta

    v = jnp.maximum(v, flr)
    w_s, wn = normalize_columns(w_s)
    h_s = h_s * wn[:, None]

    def global_lambda(w_s, h_s):
        part = jnp.matmul(w_s, h_s, precision=prec)
        return jnp.maximum(_psum(part, axis), flr)

    def cost_of(lamb, h_s):
        div = _divergence(v, lamb, beta)            # replicated inputs
        return div, div + _psum(jnp.sum(sparsity * h_s), axis)

    lamb = global_lambda(w_s, h_s)

    def body(carry):
        it, w_s, h_s, lamb, last_cost, _ = carry
        if update_h:
            h_s = _h_step(v, w_s, h_s, lamb, sparsity, beta, flr,
                          h_mask_s, prec)
            lamb = global_lambda(w_s, h_s)
        if update_w:
            w_s = _w_step(v, w_s, h_s, lamb, beta, flr, w_mask_s, prec)
            lamb = global_lambda(w_s, h_s)
        if params.conv_eps > 0:
            _, cost = cost_of(lamb, h_s)
            rel = jnp.abs(cost - last_cost) / jnp.abs(last_cost)
            done = jnp.logical_and(it > 0, rel < params.conv_eps)
        else:
            cost, done = last_cost, jnp.asarray(False)
        return it + 1, w_s, h_s, lamb, cost, done

    def cond(carry):
        it, *_, done = carry
        return jnp.logical_and(it < params.max_iter, jnp.logical_not(done))

    init = (jnp.asarray(0, jnp.int32), w_s, h_s, lamb,
            jnp.asarray(jnp.inf, v.dtype), jnp.asarray(False))
    it, w_s, h_s, lamb, cost, _ = lax.while_loop(cond, body, init)
    div = _divergence(v, lamb, beta)
    if params.conv_eps <= 0:
        cost = div + _psum(jnp.sum(sparsity * h_s), axis)
    return w_s, h_s, it, div, cost


def snmf_solve_model_sharded(v, w0, h0, params: SnmfParams, mesh: Mesh,
                             w_mask=None, h_mask=None,
                             update_w: bool = True,
                             update_h: bool = True) -> SnmfResult:
    """Model-parallel drop-in for ``snmf_solve`` (training and the online
    dictionary refit, all β).

    v: (F, N) replicated; w0: (F, R), h0: (R, N), and the optional (R,)
    masks shard over 'model' on the R axis.
    """
    r = w0.shape[1]
    mp = mesh.shape["model"]
    if r % mp:
        raise ValueError(f"rank {r} not divisible by model axis {mp}")
    if w_mask is None:
        w_mask = jnp.ones((r,), bool)
    if h_mask is None:
        h_mask = jnp.ones((r,), bool)

    fn = jax.shard_map(
        partial(_solve_local, params=params, axis="model",
                update_w=update_w, update_h=update_h),
        mesh=mesh,
        in_specs=(P(), P(None, "model"), P("model", None),
                  P("model"), P("model")),
        out_specs=(P(None, "model"), P("model", None), P(), P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(fn,
                     in_shardings=(NamedSharding(mesh, P()),
                                   NamedSharding(mesh, P(None, "model")),
                                   NamedSharding(mesh, P("model", None)),
                                   NamedSharding(mesh, P("model")),
                                   NamedSharding(mesh, P("model"))))
    w_out, h_out, it, div, cost = jitted(v, w0, h0, w_mask, h_mask)
    return SnmfResult(w=w_out, h=h_out, iters=it, div=div, cost=cost)
