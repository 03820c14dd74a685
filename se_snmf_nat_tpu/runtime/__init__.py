"""Runtime services: state checkpointing (the reference's .mat-file
persistence, SURVEY §5 'Checkpoint / resume') and batch execution."""

from se_snmf_nat_tpu.runtime.checkpoint import (
    save_engine_state, load_engine_state, save_adapted_dictionary,
    load_adapted_dictionary)
from se_snmf_nat_tpu.runtime.runner import BatchRunner, RunReport
from se_snmf_nat_tpu.runtime.profiling import StageTimer, trace, annotate

__all__ = [
    "save_engine_state", "load_engine_state",
    "save_adapted_dictionary", "load_adapted_dictionary",
    "BatchRunner", "RunReport",
    "StageTimer", "trace", "annotate",
]
