"""Model-parallel activation solve: dictionary columns sharded over 'model'.

The reference's largest factorizations are the exemplar configs (R = 500+
per class, settings/bak_IS16_results/initial_setting_Exemplar*.m) and the
NTF unfoldings; SURVEY §2.7 names column sharding over a 'model' axis as
the TP story.  This module supplies the actual model-parallel compute:

  W (F, R)  — columns sharded over 'model'
  H (R, N)  — rows sharded over 'model' (each shard owns its atoms'
              activations)
  V (F, N)  — replicated

Per KL MU iteration each shard computes its local partial reconstruction
W_s @ H_s; ONE psum over 'model' yields the global Λ (F x N floats — the
only cross-shard traffic per iteration), after which the H update
  H_s <- H_s .* (W_sᵀ (V/Λ)) ./ (1ᵀW_s + sparsity)
is purely local.  The per-column relative-cost early stop (the reference's
convergence test, sparse_nmf.m:273-283) is evaluated on the global Λ, so
every shard freezes the same columns on the same iteration — results match
the unsharded ``snmf_h_solve_columns`` to summation-order rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from se_snmf_nat_tpu.nmf.solver import SnmfParams, SnmfResult


def _h_solve_local(v, w_s, h_s, params: SnmfParams, axis: str | None):
    """Per-shard body; psum over `axis` builds the global Λ and cost."""
    prec = params.lax_precision
    flr = jnp.asarray(params.flr, v.dtype)
    sparsity = jnp.asarray(params.sparsity, v.dtype)
    if params.beta != 1.0:
        raise NotImplementedError("model-sharded solve: KL (beta=1) only — "
                                  "the live configs' cf (config.py)")

    v = jnp.maximum(v, flr)
    # entry normalization (sparse_nmf.m:157-160) is columnwise — local
    wn = jnp.sqrt(jnp.sum(w_s * w_s, axis=0))
    w_s = w_s / jnp.where(wn > 0.0, wn, 1.0)[None, :]
    h_s = h_s * wn[:, None]

    def global_lambda(h_s):
        part = jnp.matmul(w_s, h_s, precision=prec)
        if axis is not None:
            part = lax.psum(part, axis)
        return jnp.maximum(part, flr)

    def sparsity_cost(h_s):
        local = jnp.sum(sparsity * h_s, axis=0)
        return lax.psum(local, axis) if axis is not None else local

    lamb = global_lambda(h_s)
    n = v.shape[1]
    dph = jnp.maximum(jnp.sum(w_s, axis=0)[:, None] + sparsity, flr)

    def col_cost(lamb, h_s):
        div = jnp.sum(v * jnp.log(v / lamb) - v + lamb, axis=0)
        return div, div + sparsity_cost(h_s)

    def body(carry):
        it, h_s, lamb, last_cost, active = carry
        dmh = jnp.matmul(w_s.T, v / lamb, precision=prec)
        h_new = h_s * dmh / dph
        h_s = jnp.where(active[None, :], h_new, h_s)
        lamb = global_lambda(h_s)
        div, cost = col_cost(lamb, h_s)
        rel = jnp.abs(cost - last_cost) / jnp.abs(last_cost)
        if params.conv_eps > 0:
            newly_done = jnp.logical_and(it > 0, rel < params.conv_eps)
            active = jnp.logical_and(active, jnp.logical_not(newly_done))
        return it + 1, h_s, lamb, cost, active

    def cond(carry):
        it, _, _, _, active = carry
        return jnp.logical_and(it < params.max_iter, jnp.any(active))

    init = (jnp.asarray(0, jnp.int32), h_s, lamb,
            jnp.full((n,), jnp.inf, v.dtype), jnp.ones((n,), bool))
    it, h_s, lamb, cost, _ = lax.while_loop(cond, body, init)
    div = jnp.sum(v * jnp.log(v / lamb) - v + lamb)
    return w_s, h_s, it, div, jnp.sum(cost)


def snmf_h_solve_columns_model_sharded(v, w, h0, params: SnmfParams,
                                       mesh: Mesh) -> SnmfResult:
    """Model-parallel drop-in for ``snmf_h_solve_columns``.

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
