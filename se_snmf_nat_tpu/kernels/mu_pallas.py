"""Fused multiplicative-update solvers as single Pallas kernels.

Each kernel runs a complete KL sparse-NMF solve (the reference's
src/sparse_nmf.m MU loop) for one batch element per grid program, entirely
in VMEM: the MU GEMMs hit the MXU, the elementwise update/normalize steps
hit the VPU, and the convergence test runs in-kernel — one kernel launch
replaces ~10 XLA ops x up-to-100 iterations x batch.

Numerics match nmf/solver.snmf_solve (same update order, same floors, same
relative-cost early stop); tests gate them against the XLA solver on CPU
interpret mode and the production path compares on-device.

Only beta=1 (KL) is fused — the live configs all use cf='kl'
(settings/initial_setting_SNMF_NAT.m:106); other betas fall back to the XLA
solver.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:          # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# W-only solve: the online dictionary refit (engine :293-346)
# ---------------------------------------------------------------------------

def _w_solve_kernel(v_ref, w0_ref, h_ref, out_ref, *, max_iter: int,
                    conv_eps: float, sparsity: float, flr: float):
    v = jnp.maximum(v_ref[0], flr)            # (F, M)
    w = w0_ref[0]                             # (F, R)
    h = h_ref[0]                              # (R, M)

    # entry normalization (solver: normalize_columns + h rescale)
    wn = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
    w = w / jnp.where(wn > 0.0, wn, 1.0)
    h = h * wn.T
    sumh = jnp.sum(h, axis=1)                 # (R,) — fixed, h never updates
    sp_h = jnp.sum(h) * sparsity              # sparsity penalty term, fixed

    def mu(carry):
        it, w, last_cost, done = carry
        lamb = jnp.maximum(
            jnp.dot(w, h, preferred_element_type=jnp.float32), flr)
        c = jnp.dot(v / lamb, h.T, preferred_element_type=jnp.float32)
        corr_p = jnp.sum(c * w, axis=0)
        dpw = jnp.maximum(sumh[None, :] + corr_p[None, :] * w, flr)
        corr_m = sumh * jnp.sum(w, axis=0)
        dmw = c + corr_m[None, :] * w
        w = w * dmw / dpw
        wn = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        w = w / jnp.where(wn > 0.0, wn, 1.0)
        lamb = jnp.maximum(
            jnp.dot(w, h, preferred_element_type=jnp.float32), flr)
        div = jnp.sum(v * jnp.log(v / lamb) - v + lamb)
        cost = div + sp_h
        rel = jnp.abs(cost - last_cost) / jnp.abs(last_cost)
        done = jnp.logical_and(it > 0, rel < conv_eps) \
            if conv_eps > 0 else jnp.asarray(False)
        return it + 1, w, cost, done

    def cond(carry):
        it, _, _, done = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    _, w, _, _ = lax.while_loop(
        cond, mu, (jnp.asarray(0, jnp.int32), w,
                   jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(False)))
    out_ref[0] = w


@partial(jax.jit, static_argnames=("max_iter", "conv_eps", "sparsity",
                                   "flr", "interpret"))
def pallas_w_solve(v: jnp.ndarray, w0: jnp.ndarray, h: jnp.ndarray,
                   max_iter: int = 100, conv_eps: float = 1e-3,
                   sparsity: float = 5.0, flr: float = 1e-9,
                   interpret: bool = False) -> jnp.ndarray:
    """Batched W-only KL solve.  v: (B, F, M); w0: (B, F, R); h: (B, R, M).
    Masked-out columns must be zeroed in w0 (and the matching h rows zero),
    exactly as the engine's refit prepares them — zero columns stay zero
    through the updates and the normalization guard."""
    b, f, m = v.shape
    r = w0.shape[2]
    kern = partial(_w_solve_kernel, max_iter=max_iter, conv_eps=conv_eps,
                   sparsity=sparsity, flr=flr)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, r), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(v.astype(jnp.float32), w0.astype(jnp.float32), h.astype(jnp.float32))


# ---------------------------------------------------------------------------
# H-only solve: the per-frame activation inference (engine :140-154)
# ---------------------------------------------------------------------------

def _h_solve_kernel(v_ref, w_ref, h0_ref, out_ref, *, max_iter: int,
                    conv_eps: float, sparsity: float, flr: float):
    v = jnp.maximum(v_ref[0], flr)            # (F, M)
    w = w_ref[0]                              # (F, R)
    h = h0_ref[0]                             # (R, M)

    wn = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
    w = w / jnp.where(wn > 0.0, wn, 1.0)
    h = h * wn.T
    dph = jnp.maximum(jnp.sum(w, axis=0)[:, None] + sparsity, flr)  # (R,1)

    def mu(carry):
        it, h, last_cost, done = carry
        lamb = jnp.maximum(
            jnp.dot(w, h, preferred_element_type=jnp.float32), flr)
        dmh = jnp.dot(w.T, v / lamb, preferred_element_type=jnp.float32)
        h = h * dmh / dph
        lamb = jnp.maximum(
            jnp.dot(w, h, preferred_element_type=jnp.float32), flr)
        div = jnp.sum(v * jnp.log(v / lamb) - v + lamb)
        cost = div + sparsity * jnp.sum(h)
        rel = jnp.abs(cost - last_cost) / jnp.abs(last_cost)
        done = jnp.logical_and(it > 0, rel < conv_eps) \
            if conv_eps > 0 else jnp.asarray(False)
        return it + 1, h, cost, done

    def cond(carry):
        it, _, _, done = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    _, h, _, _ = lax.while_loop(
        cond, mu, (jnp.asarray(0, jnp.int32), h,
                   jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(False)))
    out_ref[0] = h


# ---------------------------------------------------------------------------
# Shared-dictionary per-COLUMN solve: the fast plan's one big batched
# H-solve (stream/fast_pipeline.py) and the kernel-bench shape.
#
# MEASURED NEGATIVE RESULT (v5e, F=513 r=200 N=22208, chained timing):
# 19.4-21.5 ms/solve (tile_n=1024/512) vs 16.6 ms for the XLA
# snmf_h_solve_columns — the VMEM-residency win does not materialize
# because XLA's loop fusion already keeps the iteration working set
# on-chip at these shapes, and per-tile early exit cannot make up the
# Mosaic loop's lower MXU/VPU overlap.  Kept as a validated option
# (interpret-mode semantics gate in tests); the XLA solver remains the
# production path.
# ---------------------------------------------------------------------------

def _h_cols_kernel(v_ref, w_ref, h0_ref, out_ref, *, max_iter: int,
                   conv_eps: float, sparsity: float, flr: float,
                   bf16_mxu: bool):
    """One column tile, whole MU loop in VMEM with per-column convergence
    (the exact semantics of nmf/solver.snmf_h_solve_columns: every column
    freezes at its OWN relative-cost criterion, reproducing the
    reference's independent per-frame solves, sparse_nmf.m:186-285 at
    m=1).  The XLA path re-materializes H/Lambda/cost through HBM every
    iteration; here V, W, H and all temporaries stay resident, so the
    loop is MXU/VPU-bound instead of HBM-bound."""
    v = jnp.maximum(v_ref[:], flr)            # (F, TN)
    w = w_ref[:]                              # (F, R)
    h = h0_ref[:]                             # (R, TN)

    wn = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
    w = w / jnp.where(wn > 0.0, wn, 1.0)
    h = h * wn.T
    dph = jnp.maximum(jnp.sum(w, axis=0)[:, None] + sparsity, flr)

    def dot(a, b):
        if bf16_mxu:   # mirror the XLA DEFAULT-precision path (bf16 MXU
            a = a.astype(jnp.bfloat16)        # inputs, f32 accumulation)
            b = b.astype(jnp.bfloat16)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def col_cost(lamb, h):
        div = jnp.sum(v * jnp.log(v / lamb) - v + lamb, axis=0,
                      keepdims=True)
        return div + sparsity * jnp.sum(h, axis=0, keepdims=True)

    # Mosaic's while lowering wants 2-D f32 loop carries — the per-column
    # active mask rides as a 0/1 float row vector
    def mu(carry):
        it, h, lamb, last_cost, active = carry
        dmh = dot(w.T, v / lamb)
        h_new = h * dmh / dph
        h = jnp.where(active > 0.5, h_new, h)
        lamb = jnp.maximum(dot(w, h), flr)
        cost = col_cost(lamb, h)
        rel = jnp.abs(cost - last_cost) / jnp.abs(last_cost)
        if conv_eps > 0:
            keep = jnp.where(
                jnp.logical_and(it > 0, rel < conv_eps), 0.0, 1.0)
            active = active * keep
        return it + 1, h, lamb, cost, active

    def cond(carry):
        it, _, _, _, active = carry
        return jnp.logical_and(it < max_iter, jnp.max(active) > 0.5)

    n = v.shape[1]
    lamb0 = jnp.maximum(dot(w, h), flr)
    _, h, _, _, _ = lax.while_loop(
        cond, mu, (jnp.asarray(0, jnp.int32), h, lamb0,
                   jnp.full((1, n), jnp.inf, jnp.float32),
                   jnp.ones((1, n), jnp.float32)))
    out_ref[:] = h


@partial(jax.jit, static_argnames=("max_iter", "conv_eps", "sparsity",
                                   "flr", "tile_n", "bf16_mxu", "interpret"))
def pallas_h_solve_columns(v: jnp.ndarray, w: jnp.ndarray, h0: jnp.ndarray,
                           max_iter: int = 100, conv_eps: float = 1e-3,
                           sparsity: float = 5.0, flr: float = 1e-9,
                           tile_n: int = 512, bf16_mxu: bool = True,
                           interpret: bool = False) -> jnp.ndarray:
    """Shared-W per-column KL H-solve.  v: (F, N); w: (F, R); h0: (R, N).

    Grid over N/tile_n column tiles; W maps to the SAME VMEM block for
    every program.  Column tiles early-exit independently (columns are
    independent problems, so tiling changes nothing but wall time).  The
    wrapper pads N to a tile multiple with benign columns (v=1, h0=h0[:,0])
    and slices them off — padding can only add iterations to its own tile.
    """
    f, n = v.shape
    r = w.shape[1]
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        v = jnp.concatenate(
            [v, jnp.ones((f, n_pad - n), v.dtype)], axis=1)
        h0 = jnp.concatenate(
            [h0, jnp.broadcast_to(h0[:, :1], (r, n_pad - n))], axis=1)
    kern = partial(_h_cols_kernel, max_iter=max_iter, conv_eps=conv_eps,
                   sparsity=sparsity, flr=flr, bf16_mxu=bf16_mxu)
    h = pl.pallas_call(
        kern,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((f, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(v.astype(jnp.float32), w.astype(jnp.float32), h0.astype(jnp.float32))
    return h[:, :n]


@partial(jax.jit, static_argnames=("max_iter", "conv_eps", "sparsity",
                                   "flr", "interpret"))
def pallas_h_solve(v: jnp.ndarray, w: jnp.ndarray, h0: jnp.ndarray,
                   max_iter: int = 100, conv_eps: float = 1e-3,
                   sparsity: float = 5.0, flr: float = 1e-9,
                   interpret: bool = False) -> jnp.ndarray:
    """Batched H-only KL solve.  v: (B, F, M); w: (B, F, R); h0: (B, R, M).
    Each program solves one batch element to ITS OWN convergence — exactly
    the reference's independent per-frame solves."""
    b, f, m = v.shape
    r = w.shape[2]
    kern = partial(_h_solve_kernel, max_iter=max_iter, conv_eps=conv_eps,
                   sparsity=sparsity, flr=flr)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(v.astype(jnp.float32), w.astype(jnp.float32), h0.astype(jnp.float32))
