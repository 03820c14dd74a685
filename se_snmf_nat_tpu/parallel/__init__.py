from se_snmf_nat_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from se_snmf_nat_tpu.parallel.train_step import (
    distributed_mu_step,
    make_distributed_train_step,
)
from se_snmf_nat_tpu.parallel.time_shard import enhance_time_sharded
from se_snmf_nat_tpu.parallel.scaling import measure_dp_scaling

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "distributed_mu_step",
    "make_distributed_train_step",
    "enhance_time_sharded",
    "measure_dp_scaling",
]
