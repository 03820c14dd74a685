"""Push-based streaming session for the online Bayesian-NMF enhancer.

The reference's BNMF wrapper IS a frame loop (proc_BNMF_nmoh.m:121-135
consumes ulen-sample hops with an alen window), so the algorithm is
inherently streaming.  This session exposes that as the same push/flush
API as stream/streaming.StreamingSession, with the per-frame VB scan
carried across pushes — the shipped int16 output equals the offline
``BnmfEnhancer.enhance`` on the same samples (CI-gated; raw floats agree
to the last-ulps envelope of separately-compiled XLA programs), because
both run the same scan step in the same order; blocks only batch the
device calls.

Startup latency is algorithm-inherent: the online noise model trains on
the first ``init_hops * ulen`` mixture samples (proc_BNMF_nmoh.m:85-99),
so no audio can be emitted before that head has arrived (240 ms at the
reference settings) plus the one-hop OLA delay.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class BnmfStreamingSession:
    """Wraps an online-mode BnmfEnhancer for incremental processing.

    ``block_frames`` batches that many analysis frames per device call
    (amortizing dispatch); a partial tail block runs masked at flush, so
    any block size gives the same samples.
    """

    def __init__(self, enhancer, block_frames: int = 8):
        if enhancer.method != "online":
            raise ValueError("BnmfStreamingSession needs an online-mode "
                             "enhancer (supervised mode is an offline "
                             "batched solve)")
        self.enh = enhancer
        p = enhancer.p
        self._p = p
        self._block = max(int(block_frames), 1)
        self._head: list[np.ndarray] = []     # raw samples until init done
        self._head_n = 0
        self._fq = np.zeros(0)                # unconsumed framer tail
        self._pending: list[np.ndarray] = []  # raw frames awaiting a block
        self._carry = None
        self._sigma = None
        self._l = 0                           # frames processed so far
        self._acc = np.zeros(p.alen)          # OLA accumulator
        self._run = None
        self._finished = False

    # ------------------------------------------------------------------
    def _build_run(self):
        p = self.enh.p
        step = self.enh._build_scan()

        @jax.jit
        def run_block(carry, frames, l0, n_valid):
            k = frames.shape[0]
            idx = jnp.arange(k, dtype=jnp.int32)

            def masked(c, xs):
                frame, l, i = xs
                new_c, out = step(c, (frame, l))
                ok = i < n_valid
                c_out = jax.tree.map(lambda a, b: jnp.where(ok, a, b),
                                     new_c, c)
                return c_out, jnp.where(ok, out, jnp.zeros_like(out))

            carry, y = jax.lax.scan(
                masked, carry,
                (frames, l0 + idx.astype(jnp.int32), idx))
            return carry, y

        del p
        return run_block

    def _flush_pending(self) -> list[np.ndarray]:
        """Run queued frames through one jitted scan; returns the emitted
        ulen-sample hop chunks (already scaled back by sigma)."""
        if not self._pending:
            return []
        p = self._p
        k = len(self._pending)
        frames = np.stack(
            self._pending + [np.zeros(p.alen)] * (self._block - k))
        l0 = self._l - k + 1
        if self._run is None:
            self._run = self._build_run()
        self._carry, y = self._run(
            self._carry, jnp.asarray(frames / self._sigma, self.enh.dtype),
            jnp.asarray(l0, jnp.int32), jnp.asarray(k, jnp.int32))
        y = np.asarray(y, np.float64)
        self._pending = []
        emitted = []
        for i in range(k):
            self._acc += y[i]
            emitted.append(self._acc[: p.ulen] * self._sigma)
            self._acc = np.concatenate(
                [self._acc[p.ulen:], np.zeros(p.ulen)])
        return emitted

    def _drain_frames(self) -> list[np.ndarray]:
        """Cut complete analysis frames out of the framer tail and run
        full blocks."""
        p = self._p
        out = []
        while len(self._fq) >= p.alen:
            self._pending.append(self._fq[: p.alen].copy())
            self._fq = self._fq[p.ulen:]
            self._l += 1
            if len(self._pending) == self._block:
                out.extend(self._flush_pending())
        return out

    def push(self, samples: np.ndarray, quantize: bool = True) -> np.ndarray:
        """Feed int16-scale samples; returns finalized output samples
        available so far (empty until the init head has arrived)."""
        from se_snmf_nat_tpu.io.wavio import enhanced_quantize
        if self._finished:
            raise RuntimeError("session already flushed; create a new "
                               "BnmfStreamingSession to process more audio")
        p = self._p
        samples = np.asarray(samples, np.float64).reshape(-1)
        need = p.init_hops * p.ulen
        if self._carry is None:
            self._head.append(samples)
            self._head_n += len(samples)
            if self._head_n < need:
                return np.zeros(0, np.int16 if quantize else np.float64)
            head = np.concatenate(self._head)
            self._head = []
            self._sigma = self.enh.head_sigma(head)
            self._carry = self.enh.init_online_carry(head[:need])
            self._fq = head                       # all samples enter framing
        else:
            self._fq = np.concatenate([self._fq, samples])
        outs = self._drain_frames()
        y = np.concatenate(outs) if outs else np.zeros(0)
        return enhanced_quantize(y) if quantize else y

    def flush(self, quantize: bool = True) -> np.ndarray:
        """EOF: process the partial tail block and emit the final OLA hop
        (the offline pipeline's (T+1)-th hop, proc_BNMF_nmoh.m:131-135).
        Idempotent: the session is finished afterwards — a second flush
        returns empty and further pushes raise."""
        from se_snmf_nat_tpu.io.wavio import enhanced_quantize
        p = self._p
        outs = []
        if not self._finished and self._carry is None and self._head_n:
            # total input shorter than the init head: train the noise
            # init on whatever arrived, exactly like offline enhance on
            # the same samples (previously this audio was silently
            # dropped — review finding)
            head = np.concatenate(self._head)
            self._head = []
            self._sigma = self.enh.head_sigma(head)
            self._carry = self.enh.init_online_carry(
                head[: p.init_hops * p.ulen])
            self._fq = head
            outs.extend(self._drain_frames())
        if self._carry is not None and not self._finished:
            outs.extend(self._flush_pending())    # partial block, masked
            outs.append(self._acc[: p.ulen] * self._sigma)
            self._acc = np.concatenate(
                [self._acc[p.ulen:], np.zeros(p.ulen)])
        self._finished = True
        y = np.concatenate(outs) if outs else np.zeros(0)
        return enhanced_quantize(y) if quantize else y
