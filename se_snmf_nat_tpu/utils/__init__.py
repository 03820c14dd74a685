from se_snmf_nat_tpu.utils.matlab_compat import (
    MatlabV4Rand,
    matlab_round,
    matlab_v4_rand_matrix,
)

__all__ = ["MatlabV4Rand", "matlab_round", "matlab_v4_rand_matrix"]
