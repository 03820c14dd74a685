from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

__all__ = ["SnmfEnhancer"]
