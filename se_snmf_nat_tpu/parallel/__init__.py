from se_snmf_nat_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from se_snmf_nat_tpu.parallel.train_step import (
    distributed_mu_step,
    make_distributed_train_step,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "distributed_mu_step",
    "make_distributed_train_step",
]
