"""Pallas TPU kernels for the hot ops (SURVEY §7.1 'kernels/').

The profile (B=64 batch enhancement) puts ~1/3 of runtime in the online
noise-dictionary W-solve and most of the rest in the per-frame H-solve.
Both are multiplicative-update fixed-point loops over tensors that fit VMEM
(W 513x200 = 410 KB, ring buffer 513x100 = 205 KB), so the win is running
the WHOLE solve in one kernel launch — no per-iteration dispatch, no HBM
round trips between MU steps.
"""

from se_snmf_nat_tpu.kernels.mu_pallas import (
    pallas_available, pallas_w_solve, pallas_h_solve)

__all__ = ["pallas_available", "pallas_w_solve", "pallas_h_solve"]
