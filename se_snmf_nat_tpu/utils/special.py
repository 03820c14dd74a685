"""Special functions needed by the enhancement gains.

expint_e1: the exponential integral E1(x) (MATLAB ``expint``), used by the
OM-LSA log-MMSE gain ``exp(0.5*expint(v))`` (proc_IMCRA.m:325,
src/MS/ssubmmse.m:168).  JAX has no E1; this implementation is
double-precision accurate on the domain the gains use (v in (0, ~40]):

  x < 1.5 : power series  E1 = -gamma - ln x + sum (-1)^{k+1} x^k / (k k!)
  x >= 1.5: modified-Lentz continued fraction
            E1 = e^-x / (x+1 - 1/(x+3 - 4/(x+5 - 9/(x+7 - ...))))

Both branches run under jit (fixed iteration counts) and are blended with
``where`` — no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EULER_GAMMA = 0.5772156649015328606


def expint_e1(x: jnp.ndarray) -> jnp.ndarray:
    """E1(x) for x > 0; returns +inf at 0 and garbage for x < 0."""
    dtype = jnp.result_type(x, jnp.float32)
    x = x.astype(dtype)
    tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    # --- series branch (safe input: clamp away from 0)
    xs = jnp.maximum(x, tiny)

    def series_body(k, carry):
        term, s = carry
        term = term * (-xs) / k          # (-x)^k / k!
        return term, s - term / k

    term0 = jnp.ones_like(xs)
    _, ssum = jax.lax.fori_loop(1, 40, series_body, (term0, jnp.zeros_like(xs)))
    series = -_EULER_GAMMA - jnp.log(xs) + ssum

    # --- continued-fraction branch (safe input: clamp to >= 1)
    xc = jnp.maximum(x, 1.0)
    b0 = xc + 1.0
    f = b0
    c = b0
    d = jnp.zeros_like(xc)

    def cf_body(k, carry):
        f, c, d = carry
        a = -jnp.asarray(k * k, dtype)
        b = xc + 2.0 * k + 1.0
        d = 1.0 / (b + a * d)
        c = b + a / c
        return f * c * d, c, d

    f, _, _ = jax.lax.fori_loop(1, 60, cf_body, (f, c, d))
    cf = jnp.exp(-xc) / f

    out = jnp.where(x < 1.5, series, cf)
    return jnp.where(x <= 0.0, jnp.inf, out)


def digamma(x, xp=jnp):
    """psi(x) for x > 0, backend-generic (pass ``xp=numpy`` for the oracle
    mirrors — identical op sequence in either backend gives bit-identical
    results, which the x64 parity gates rely on).

    Recurrence psi(x) = psi(x+1) - 1/x shifts the argument to >= 8 (eight
    unrolled where-guarded steps), then the Bernoulli asymptotic series
    through x^-12 — double-precision accurate on the shifted domain.  Used
    by the Bayesian-NMF variational updates (bnmf/vb.py), which need
    exp(E[log theta]) = exp(psi(alpha)) * scale for Gamma posteriors."""
    one = xp.ones_like(x)
    acc = xp.zeros_like(x)
    for _ in range(8):
        need = x < 8.0
        acc = acc - xp.where(need, 1.0 / x, 0.0)
        x = x + xp.where(need, one, 0.0)
    inv = 1.0 / x
    inv2 = inv * inv
    s = (xp.log(x) - 0.5 * inv
         - inv2 * (1.0 / 12.0
                   - inv2 * (1.0 / 120.0
                             - inv2 * (1.0 / 252.0
                                       - inv2 * (1.0 / 240.0
                                                 - inv2 * (1.0 / 132.0
                                                           - inv2 * (691.0 / 32760.0)))))))
    return s + acc


def bessel_i0_small(x: jnp.ndarray, terms: int = 14) -> jnp.ndarray:
    """Modified Bessel I0 by power series — double-accurate for |x| <= ~2.
    The amplitude-MMSE gain (src/MS/ssubmmse.m:181-184) only evaluates it
    on v < 0.5, well inside the series radius."""
    q = 0.25 * x * x
    term = jnp.ones_like(x)
    s = jnp.ones_like(x)
    for k in range(1, terms):
        term = term * q / (k * k)
        s = s + term
    return s


def bessel_i1_small(x: jnp.ndarray, terms: int = 14) -> jnp.ndarray:
    """Modified Bessel I1 by power series — double-accurate for |x| <= ~2."""
    q = 0.25 * x * x
    term = 0.5 * x
    s = term
    for k in range(1, terms):
        term = term * q / (k * (k + 1))
        s = s + term
    return s
