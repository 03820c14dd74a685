"""NumPy float64 sparse-NMF oracle with reference-exact semantics.

Models src/sparse_nmf.m behavior (beta-divergence MU with L1-sparse H,
normalized basis space, partial update masks, relative-cost early stop,
legacy-V4-seeded H/W random init).  Cited line numbers refer to that file.
"""

from __future__ import annotations

import numpy as np

from se_snmf_nat_tpu.utils.matlab_compat import MatlabV4Rand

FLR = 1e-9


def sparse_nmf_np(
    v: np.ndarray,
    *,
    cf: str = "kl",
    beta: float | None = None,
    sparsity: float | np.ndarray = 0.0,
    max_iter: int = 100,
    conv_eps: float = 0.0,
    random_seed: int = 1,
    cost_check: bool = True,
    init_w: np.ndarray | None = None,
    r: int | None = None,
    init_h: np.ndarray | str | None = None,
    w_update_ind: np.ndarray | None = None,
    h_update_ind: np.ndarray | None = None,
    display: bool = False,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Returns (w, h, objective{div, cost} arrays truncated at early stop).

    ``init_h='ones'`` initializes H with ones (sparse_nmf.m:135-138);
    ``display=True`` prints the reference's per-iteration objective line
    (sparse_nmf.m:266-270 — one line per iteration instead of the MATLAB
    backspace-overwrite dance)."""
    v = np.asarray(v, dtype=np.float64)
    m, n = v.shape

    beta = {"is": 0.0, "kl": 1.0, "ed": 2.0}.get(cf, beta if beta is not None else 1.0)

    rng = MatlabV4Rand(random_seed) if random_seed > 0 else MatlabV4Rand(1)

    if init_w is None:
        if r is None:
            raise ValueError("need init_w or r")
        w = rng.rand(m, r)                          # :121
    else:
        ri = init_w.shape[1]
        if r is not None and ri < r:
            w = np.concatenate([init_w, rng.rand(m, r - ri)], axis=1)  # :126
        else:
            w = np.array(init_w, dtype=np.float64, copy=True)
            r = ri

    if init_h is None:
        h = rng.rand(r, n)                          # :134
    elif isinstance(init_h, str):
        if init_h != "ones":
            raise ValueError(f"unknown init_h string: {init_h!r}")
        h = np.ones((r, n))                         # :135-138
    else:
        h = np.array(init_h, dtype=np.float64, copy=True)

    w_ind = np.ones(r, bool) if w_update_ind is None else np.asarray(w_update_ind, bool)
    h_ind = np.ones(r, bool) if h_update_ind is None else np.asarray(h_update_ind, bool)

    sp = np.asarray(sparsity, dtype=np.float64)
    if sp.ndim == 0:
        sp = np.full((r, n), float(sp))
    elif sp.ndim == 2 and sp.shape[1] == 1:
        sp = np.tile(sp, (1, n))

    # Normalize W columns, rescale H (:157-160)
    wn = np.sqrt(np.sum(w * w, axis=0))
    w = w / wn
    h = h * wn[:, None]

    lamb = np.maximum(w @ h, FLR)                   # :167
    last_cost = np.inf
    v = np.maximum(v, FLR)                          # :169

    update_h = bool(h_ind.sum())
    update_w = bool(w_ind.sum())
    div_hist, cost_hist = [], []

    for it in range(1, max_iter + 1):
        if update_h:                                # :189-206
            if beta == 1.0:
                dph = np.maximum(np.sum(w[:, h_ind], axis=0)[:, None] + sp[h_ind], FLR)
                dmh = w[:, h_ind].T @ (v / lamb)
                h[h_ind] = h[h_ind] * dmh / dph
            elif beta == 2.0:
                dph = np.maximum(w[:, h_ind].T @ lamb + sp[h_ind], FLR)
                dmh = w[:, h_ind].T @ v
                h[h_ind] = h[h_ind] * dmh / dph
            else:
                dph = np.maximum(
                    w[:, h_ind].T @ lamb ** (beta - 1.0) + sp[h_ind], FLR)
                dmh = w[:, h_ind].T @ (v * lamb ** (beta - 2.0))
                h[h_ind] = h[h_ind] * dmh / dph
            lamb = np.maximum(w @ h, FLR)

        if update_w:                                # :212-243
            hw = h[w_ind]
            sumh = hw.sum(axis=1)                   # (rw,)
            if beta == 1.0:
                c = (v / lamb) @ hw.T               # (m, rw)
                dpw = np.maximum(
                    sumh[None, :] + np.sum(c * w[:, w_ind], axis=0)[None, :]
                    * w[:, w_ind], FLR)
                dmw = c + (sumh * w[:, w_ind].sum(axis=0))[None, :] * w[:, w_ind]
            elif beta == 2.0:
                lh = lamb @ hw.T
                vh = v @ hw.T
                dpw = np.maximum(
                    lh + np.sum(vh * w[:, w_ind], axis=0)[None, :] * w[:, w_ind], FLR)
                dmw = vh + np.sum(lh * w[:, w_ind], axis=0)[None, :] * w[:, w_ind]
            else:
                lh = lamb ** (beta - 1.0) @ hw.T
                vh = (v * lamb ** (beta - 2.0)) @ hw.T
                dpw = np.maximum(
                    lh + np.sum(vh * w[:, w_ind], axis=0)[None, :] * w[:, w_ind], FLR)
                dmw = vh + np.sum(lh * w[:, w_ind], axis=0)[None, :] * w[:, w_ind]
            w[:, w_ind] = w[:, w_ind] * dmw / dpw
            w = w / np.sqrt(np.sum(w * w, axis=0))  # :242 (all columns)
            lamb = np.maximum(w @ h, FLR)

        # Objective (:248-258)
        if beta == 1.0:
            div = np.sum(v * np.log(v / lamb) - v + lamb)
        elif beta == 2.0:
            div = np.sum((v - lamb) ** 2)
        elif beta == 0.0:
            div = np.sum(v / lamb - np.log(v / lamb) - 1.0)
        else:
            div = np.sum(v ** beta + (beta - 1.0) * lamb ** beta
                         - beta * v * lamb ** (beta - 1.0)) / (beta * (beta - 1.0))

        if cost_check:                              # :260-285
            cost = div + np.sum(sp * h)
            div_hist.append(div)
            cost_hist.append(cost)
            if display:                             # :266-270
                print(f"iteration {it} div = {div:.3e} cost = {cost:.3e}")
            if it > 1 and conv_eps > 0:
                if abs(cost - last_cost) / last_cost < conv_eps:
                    break
            last_cost = cost

    return w, h, {"div": np.asarray(div_hist), "cost": np.asarray(cost_hist)}
