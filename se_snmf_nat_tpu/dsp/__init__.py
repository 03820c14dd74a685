from se_snmf_nat_tpu.dsp.windows import sqrt_hann_periodic, hann_periodic
from se_snmf_nat_tpu.dsp.stft import (
    stream_frames,
    analysis_frames,
    synthesis_frames,
    overlap_add,
    stft_batch_train,
)
from se_snmf_nat_tpu.dsp.mel import mel_matrix
from se_snmf_nat_tpu.dsp.splice import frame_splice
from se_snmf_nat_tpu.dsp.smoothing import tf_dd
from se_snmf_nat_tpu.dsp.resample import srconv

__all__ = [
    "sqrt_hann_periodic",
    "hann_periodic",
    "stream_frames",
    "analysis_frames",
    "synthesis_frames",
    "overlap_add",
    "stft_batch_train",
    "mel_matrix",
    "frame_splice",
    "tf_dd",
    "srconv",
]
