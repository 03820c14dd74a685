"""Hop-by-hop real-time streaming session.

The reference's live paths consume 160-sample hops: the filewise runner's
frame queue (filewise_run_IS16.m:102-169) and the GUI mic loop
(SE_GUI.m:372-516).  StreamingSession is that loop as an API: push one hop,
get back the finalized 160 enhanced samples (after the 3-hop algorithmic
delay), with the engine state carried across pushes — the SAME jitted
engine step as the offline scan, so streaming output is bit-identical to
the offline pipeline (tested).

The per-frame device program is one scan step + one rfft/irfft pair; on a
warm TPU this runs well inside the 10 ms real-time budget.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from se_snmf_nat_tpu.dsp.stft import analysis_frames, synthesis_frames
from se_snmf_nat_tpu.io.wavio import enhanced_quantize


class StreamingSession:
    """Wraps a SnmfEnhancer for one-hop-at-a-time processing."""

    def __init__(self, enhancer, state=None):
        self.enh = enhancer
        s = enhancer.cfg.signal
        self._s = s
        self._delay = enhancer.cfg.delay
        self._queue = np.zeros(s.framelength)
        self._hold = np.zeros(0)            # partial-hop residue
        self._acc = np.zeros(s.framelength)  # OLA accumulator
        self._l = 0
        self.state = state if state is not None else enhancer.initial_state()

        win = enhancer.win
        eng = enhancer.engine

        @jax.jit
        def one_frame(frame, state, l):
            mag, phase = analysis_frames(
                frame[None, :], win, s.fftlength, s.pow, s.dc_bin,
                s.nonzerofloor, s.preemph)
            state, xm = eng.step(state, (mag[0], l))
            out = synthesis_frames(
                xm[None, :], phase, s.framelength, s.fftlength, win, s.pow,
                s.dc_bin_back, s.overlapscale, s.preemph)
            return out[0], state

        self._one_frame = one_frame

    def _process_hop(self, hop: np.ndarray) -> np.ndarray | None:
        s = self._s
        self._queue = np.concatenate([self._queue[s.frameshift:], hop])
        self._l += 1
        frame_out, self.state = self._one_frame(
            jnp.asarray(self._queue, self.enh.dtype), self.state,
            jnp.asarray(self._l, jnp.int32))
        self._acc += np.asarray(frame_out)
        emitted = None
        if self._l > self._delay:
            emitted = self._acc[: s.frameshift].copy()
        self._acc = np.concatenate(
            [self._acc[s.frameshift:], np.zeros(s.frameshift)])
        return emitted

    def push(self, samples: np.ndarray, quantize: bool = True) -> np.ndarray:
        """Feed any number of int16-scale samples; returns the finalized
        output samples available so far (possibly empty)."""
        s = self._s
        buf = np.concatenate([self._hold,
                              np.asarray(samples, np.float64).reshape(-1)])
        outs = []
        while len(buf) >= s.frameshift:
            hop, buf = buf[: s.frameshift], buf[s.frameshift:]
            e = self._process_hop(hop)
            if e is not None:
                outs.append(e)
        self._hold = buf
        y = np.concatenate(outs) if outs else np.zeros(0)
        return enhanced_quantize(y) if quantize else y

    def flush(self, quantize: bool = True) -> np.ndarray:
        """EOF: drop the partial hop and process delay+1 flush frames with
        the queue FULLY ZEROED (the reference zeroes the whole queue at
        EOF instead of shifting hops in — filewise_run_IS16.m:105-113)."""
        s = self._s
        self._hold = np.zeros(0)
        outs = []
        for _ in range(self._delay + 1):
            self._queue = np.zeros(s.framelength)   # whole queue, not a shift
            e = self._process_hop(np.zeros(s.frameshift))
            if e is not None:
                outs.append(e)
        y = np.concatenate(outs) if outs else np.zeros(0)
        return enhanced_quantize(y) if quantize else y
