"""Oracle streaming runner — filewise_run_IS16.m semantics end to end.

Hop loop: 160 int16 samples shift into a 640-sample queue; after ``delay``
frames the overlap-added enhanced hop is emitted as int16; at EOF the queue
is zeroed (not shifted) and ``delay + 1`` flush frames run (:102-169).
Output finalization reproduces fwrite-int16 + pcm2wav requantization.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from se_snmf_nat_tpu.config import PipelineConfig, default_config
from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
from se_snmf_nat_tpu.io.wavio import enhanced_quantize, read_wav_int16, write_wav_int16
from se_snmf_nat_tpu.oracle.engine_np import OracleEngine, init_state


def enhance_samples_oracle(x: np.ndarray, cfg: PipelineConfig,
                           b1_x, b1_d, b2_x, b2_d,
                           max_frames: int | None = None,
                           return_float: bool = False,
                           twister=None) -> np.ndarray:
    """Enhance int16-scale float samples; returns quantized int16 output
    (or the raw float hop stream when return_float)."""
    s = cfg.signal
    shift, flen = s.frameshift, s.framelength
    delay = cfg.delay

    state = init_state(b1_x, b1_d, b2_x, b2_d, cfg, twister=twister)
    eng = OracleEngine(cfg, state)

    n_hops = len(x) // shift
    n_total = n_hops + delay + 1
    if max_frames is not None:
        n_total = min(n_total, max_frames)

    queue = np.zeros(flen)
    ola = np.zeros(flen)
    out_hops = []
    for l in range(1, n_total + 1):
        if l <= n_hops:
            queue = np.concatenate([queue[shift:], x[(l - 1) * shift: l * shift]])
        else:
            queue = np.zeros(flen)          # EOF flush zeroes the queue
        frame = eng.step(queue, l)
        if l > delay:
            ola = np.concatenate([ola[shift:], np.zeros(shift)])
            ola = ola + frame
            out_hops.append(ola[:shift].copy())
    raw = np.concatenate(out_hops) if out_hops else np.zeros(0)
    if return_float:
        return raw
    return enhanced_quantize(raw)


def enhance_file_oracle(path_in: str | Path, path_out: str | Path | None,
                        cfg: PipelineConfig | None = None,
                        max_frames: int | None = None) -> np.ndarray:
    cfg = cfg or default_config()
    speech, noise = load_reference_speech_noise(cfg.sep.r_d)
    if cfg.sep.b_sep_mode == "Mel":
        b1_x, b1_d = speech.b_mel, noise.b_mel
    else:
        b1_x, b1_d = speech.b_dft, noise.b_dft
    x, fs = read_wav_int16(path_in)
    out = enhance_samples_oracle(x, cfg, b1_x, b1_d, speech.b_dft, noise.b_dft,
                                 max_frames=max_frames)
    if path_out is not None:
        write_wav_int16(path_out, out, fs)
    return out
