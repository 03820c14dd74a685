"""Sparse NMF with missing-data imputation (MDI).

Reference: src/snmf_mdi.m (hard observed-mask Dm) and src/snmf_mdi_Sm.m
(soft mask Sm) — the sparse_nmf MU loop with, each iteration, the missing
(or soft-weighted) entries of V re-imputed from the current model W@H, and
a final per-frame gain-matched merge
(snmf_mdi.m:175,251-254,297-303; snmf_mdi_Sm.m:251-260,303-309).

Dead code in the reference (p.MDI_est=0 default,
settings/initial_setting_SNMF_NAT.m:73-74) but fully specified; rebuilt here
as a jit-able solver (v joins the while_loop carry since imputation rewrites
it every iteration).  The soft variant with a 0/1 mask reduces exactly to
the hard variant.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from se_snmf_nat_tpu.nmf.solver import (
    SnmfParams, _divergence, _dot, _h_step, _w_step, normalize_columns)


class MdiResult(NamedTuple):
    v_mdi: jnp.ndarray   # gain-matched imputed spectrogram
    w: jnp.ndarray
    h: jnp.ndarray
    iters: jnp.ndarray
    div: jnp.ndarray
    cost: jnp.ndarray


@partial(jax.jit, static_argnames=("params", "update_w", "update_h", "soft"))
def snmf_mdi_solve(v: jnp.ndarray, mask: jnp.ndarray, w0: jnp.ndarray,
                   h0: jnp.ndarray, w_mask: jnp.ndarray,
                   h_mask: jnp.ndarray, params: SnmfParams,
                   update_w: bool = True, update_h: bool = True,
                   soft: bool = False) -> MdiResult:
    """v: (m, n) data; mask: (m, n) — hard 0/1 observed mask Dm, or a soft
    reliability mask Sm in [0, 1] when soft=True.  Other arguments follow
    nmf.solver.snmf_solve."""
    prec = params.lax_precision
    flr = jnp.asarray(params.flr, v.dtype)
    sparsity = jnp.asarray(params.sparsity, v.dtype)
    beta = params.beta
    mask = mask.astype(v.dtype)
    keep = mask if soft else (mask > 0).astype(v.dtype)
    miss = (1.0 - mask) if soft else (1.0 - keep)

    v = jnp.maximum(v * keep, flr)              # masked init (:175)
    w, wn = normalize_columns(w0)
    h = h0 * wn[:, None]
    lamb = jnp.maximum(_dot(w, h, prec), flr)

    def body(carry):
        it, v, w, h, lamb, last_cost, _ = carry
        if update_h:
            h = _h_step(v, w, h, lamb, sparsity, beta, flr, h_mask, prec)
            lamb = jnp.maximum(_dot(w, h, prec), flr)
        if update_w:
            w = _w_step(v, w, h, lamb, beta, flr, w_mask, prec)
            lamb = jnp.maximum(_dot(w, h, prec), flr)
        v = jnp.maximum(v * keep + lamb * miss, flr)    # imputation from
        #                 the current model Lambda=WH (:251-254)
        div = _divergence(v, lamb, beta)
        cost = div + jnp.sum(sparsity * h)
        rel = jnp.abs(cost - last_cost) / jnp.abs(last_cost)
        done = jnp.logical_and(it > 0, rel < params.conv_eps) \
            if params.conv_eps > 0 else jnp.asarray(False)
        return it + 1, v, w, h, lamb, cost, done

    def cond(carry):
        it, *_, done = carry
        return jnp.logical_and(it < params.max_iter, jnp.logical_not(done))

    init = (jnp.asarray(0, jnp.int32), v, w, h, lamb,
            jnp.asarray(jnp.inf, v.dtype), jnp.asarray(False))
    it, v, w, h, lamb, cost, _ = lax.while_loop(cond, body, init)

    # final gain-matched merge (:297-303); Lambda IS the final W@H
    v_est = lamb
    nt = jnp.sum(v * keep, axis=0) \
        / jnp.maximum(jnp.sum(v_est * keep, axis=0), flr)
    v_mdi = jnp.maximum(v * keep + (nt[None, :] * v_est) * miss, flr)
    div = _divergence(v, lamb, beta)
    return MdiResult(v_mdi=v_mdi, w=w, h=h, iters=it, div=div, cost=cost)


