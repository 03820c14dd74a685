from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

__all__ = ["SnmfEnhancer", "MultiStreamSession", "StreamingSession"]


def __getattr__(name):
    # session classes import lazily to keep `import se_snmf_nat_tpu` light
    if name == "StreamingSession":
        from se_snmf_nat_tpu.stream.streaming import StreamingSession
        return StreamingSession
    if name == "MultiStreamSession":
        from se_snmf_nat_tpu.stream.serving import MultiStreamSession
        return MultiStreamSession
    raise AttributeError(name)
