"""Local block-sparsity statistic Q — TPU-vectorized.

Re-design of src/blk_sparse.m.  The reference loops over ~150 frequency
blocks per frame, reshaping a (P_len_k, P_len_l) window and computing the
Hoyer sparsity of each.  Here the window L1/L2 sums come from cumulative
sums over per-bin row statistics (O(F) instead of O(F * P_len_k)), and all
block centers evaluate in parallel.

Reference quirk preserved: with blk_gap >= 3 the "decision-directed"
smoothing term Q(k-1) always reads the untouched 0.1 initialization (the
previous block's writes stop at k-gap+1+ (gap-1)/2 < k-1), so the statistic
is alpha_p*0.1 + (1-alpha_p)*Hoyer — embarrassingly parallel.  With
blk_gap == 1 it is a true linear recurrence over centers, handled with an
associative scan.  Both reproduce the MATLAB output exactly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _centers(n_bins: int, p_len_k: int, dc_bin: int, gap: int) -> np.ndarray:
    """1-based block centers: half+dcbin : gap : n_bins-half (blk_sparse.m:20)."""
    half = p_len_k // 2
    return np.arange(half + dc_bin, n_bins - half + 1, gap)


def block_sparsity_q(xm: jnp.ndarray, dm: jnp.ndarray, r_blk: jnp.ndarray,
                     l: jnp.ndarray, *, n_bins: int, p_len_k: int,
                     p_len_l: int, dc_bin: int, gap: int, alpha_p: float,
                     nonzerofloor: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One frame.  xm, dm: (F,) reconstructions; r_blk: (F, P_len_l) ring;
    l: 1-based frame counter.  Returns (q (F,), r_blk_new)."""
    dtype = xm.dtype
    half = p_len_k // 2
    gap2 = (gap - 1) // 2
    n = p_len_k * p_len_l
    sqrt_n = float(np.sqrt(n))

    snr = xm / jnp.maximum(dm, nonzerofloor)
    snr = snr / jnp.max(snr)
    r_new = jnp.concatenate([r_blk[:, 1:], snr[:, None]], axis=1)

    # Row stats and inclusive cumsums with a zero prepended: window sums for
    # 1-based center k cover rows k-half+1..k+half == cs[k+half] - cs[k-half].
    rs = jnp.sum(r_new, axis=1)
    rq = jnp.sum(r_new * r_new, axis=1)
    cs1 = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(rs)])
    cs2 = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(rq)])

    ks = _centers(n_bins, p_len_k, dc_bin, gap)          # static
    l1 = cs1[ks + half] - cs1[ks - half]
    l2 = jnp.sqrt(cs2[ks + half] - cs2[ks - half])
    p_tmp = (sqrt_n - l1 / l2) / (sqrt_n - 1.0)

    if gap >= 3:
        p_val = alpha_p * 0.1 + (1.0 - alpha_p) * p_tmp
    else:
        # true recurrence p_k = alpha*p_{k-1} + (1-alpha)*t_k, p_0-seed 0.1
        def combine(c1, c2):
            a1, b1 = c1
            a2, b2 = c2
            return a1 * a2, a2 * b1 + b2
        a = jnp.full_like(p_tmp, alpha_p)
        b = (1.0 - alpha_p) * p_tmp
        b = b.at[0].add(alpha_p * 0.1)
        a = a.at[0].set(0.0)
        _, p_val = jax.lax.associative_scan(combine, (a, b))

    # Scatter each center's value onto its +-gap2 neighborhood (0-based bins)
    j = np.arange(n_bins)
    ci = np.clip(np.round((j - (ks[0] - 1)) / gap).astype(int), 0, len(ks) - 1)
    center0 = ks[ci] - 1
    covered = np.abs(j - center0) <= gap2
    q = jnp.where(jnp.asarray(covered), p_val[jnp.asarray(ci)],
                  jnp.asarray(0.1, dtype))
    # low-bin backfill: Q(1:P_len_k-1) = Q(P_len_k + dc_bin)  (:32)
    q = q.at[: p_len_k - 1].set(q[p_len_k + dc_bin - 1])

    q_init = jnp.full((n_bins,), 0.1, dtype).at[:dc_bin].set(0.0)
    q = jnp.where(l > p_len_l, q, q_init)
    q = q.at[:dc_bin].set(0.0)
    return q, r_new
