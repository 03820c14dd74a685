from se_snmf_nat_tpu.nmf.solver import (
    SnmfParams,
    snmf_solve,
    snmf_h_solve_columns,
    normalize_columns,
)

__all__ = [
    "SnmfParams",
    "snmf_solve",
    "snmf_h_solve_columns",
    "normalize_columns",
]
