from se_snmf_nat_tpu.enhance.blk_sparse import block_sparsity_q
from se_snmf_nat_tpu.enhance.state import EngineState, init_engine_state
from se_snmf_nat_tpu.enhance.engine import make_engine
from se_snmf_nat_tpu.enhance.imcra import OmlsaEnhancer, ImcraState, make_imcra_step
from se_snmf_nat_tpu.enhance.ms import MmseEnhancer, MsStreamState

__all__ = [
    "block_sparsity_q",
    "EngineState",
    "init_engine_state",
    "make_engine",
    "OmlsaEnhancer",
    "ImcraState",
    "make_imcra_step",
    "MmseEnhancer",
    "MsStreamState",
]
