"""Hop-by-hop streaming session vs the offline pipeline: bit-identical."""

from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer
from se_snmf_nat_tpu.stream.streaming import StreamingSession


@pytest.fixture(scope="module")
def enh():
    cfg = default_config()
    cfg = cfg.evolve(
        sep=replace(cfg.sep, r_x=8, r_d=8),
        adapt=replace(cfg.adapt, r_a=4, m_a=10),
        nmf=replace(cfg.nmf, max_iter=6),
    )
    rng = np.random.default_rng(0)
    f = cfg.signal.n_bins
    bx = rng.random((f, 8)) + 1e-3
    bd = rng.random((f, 8)) + 1e-3
    return SnmfEnhancer(cfg, bx, bd, bx, bd, dtype=jnp.float64,
                        matlab_ad_blk_init=False)


@pytest.mark.slow
def test_streaming_bit_identical_to_offline(enh, m03_wav):
    x = m03_wav[0][:16000]
    want = enh.enhance(x)
    sess = StreamingSession(enh)
    parts = [sess.push(x)]
    parts.append(sess.flush())
    got = np.concatenate(parts)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_streaming_irregular_chunks(enh, m03_wav):
    """Mic-style irregular chunk sizes (1..700 samples) give the same
    stream as one big push."""
    x = m03_wav[0][:12000]
    want = enh.enhance(x)
    sess = StreamingSession(enh)
    rng = np.random.default_rng(1)
    parts = []
    i = 0
    while i < len(x):
        n = int(rng.integers(1, 700))
        parts.append(sess.push(x[i: i + n]))
        i += n
    parts.append(sess.flush())
    got = np.concatenate([p for p in parts if len(p)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_streaming_state_continues(enh, m03_wav):
    """A session seeded with a previous utterance's state matches the
    chained offline call."""
    x = m03_wav[0][:12000]
    _, st = enh.enhance(x, return_state=True)
    want = enh.enhance(x, state=st)
    sess = StreamingSession(enh, state=st)
    got = np.concatenate([sess.push(x), sess.flush()])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_block_mode_bit_identical(enh, m03_wav):
    """block_frames=8 amortizes dispatch; outputs stay bit-identical."""
    x = m03_wav[0][:16000]
    want = enh.enhance(x)
    sess = StreamingSession(enh, block_frames=8)
    got = np.concatenate([sess.push(x), sess.flush()])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_block_adaptive_streaming_equals_offline_plan(enh, m03_wav):
    """use_block_adaptive streaming must reproduce the OFFLINE
    block-adaptive plan bit-for-bit — same plan, different driver.  (Its
    deviation from the exact per-frame plan is the documented
    approximation, quality-gated elsewhere with real dictionaries.)"""
    from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer as _SE
    x = m03_wav[0][:16000]
    enh_blk = _SE(enh.cfg, *enh._bases, dtype=enh.dtype,
                  matlab_ad_blk_init=False, block_adapt=8)
    want = enh_blk.enhance(x)
    sess = StreamingSession(enh, block_frames=8, use_block_adaptive=True)
    got = np.concatenate([sess.push(x), sess.flush()])
    n = min(len(got), len(want))
    np.testing.assert_array_equal(got[:n], want[:n])


@pytest.mark.slow
def test_dft_matmul_propagates_to_streaming(enh, m03_wav):
    """An enhancer built with dft_matmul=True must stream through the SAME
    MXU-matmul transform it uses offline (review finding: the sessions
    previously fell back to jnp.fft, silently breaking the documented
    streaming-vs-offline bit-identity for that opt-in configuration)."""
    import jax.numpy as _jnp
    x = m03_wav[0][:16000]
    enh_dm = SnmfEnhancer(enh.cfg, *enh._bases, dtype=enh.dtype,
                          matlab_ad_blk_init=False, dft_matmul=True)
    sess = StreamingSession(enh_dm, block_frames=8)
    # structural proof: the session's compiled block program contains NO
    # fft op (the matmul transform replaced it); the fft enhancer's does
    s = enh.cfg.signal
    ex = (_jnp.zeros((8, s.framelength), enh.dtype), sess.state,
          _jnp.asarray(1, _jnp.int32), _jnp.asarray(8, _jnp.int32))
    assert "fft" not in sess._run_block.lower(*ex).as_text()
    assert "fft" in StreamingSession(enh, block_frames=8)._run_block \
        .lower(*ex).as_text()
    # value agreement with the offline dft_matmul plan (bit-identity does
    # not hold here: an 8-frame block tiles the f64 DFT matmul differently
    # from the whole-utterance batch, ~1e-12 — unlike the row-wise fft)
    want = enh_dm.enhance(x, quantize=False)
    got = np.concatenate([sess.push(x, quantize=False),
                          sess.flush(quantize=False)])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
