"""Per-source separation outputs (the reference engine's x_hat/d_hat path,
multi-event Techwin-style block layout)."""

from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.config import default_config, preset
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer


FS = 16000


@pytest.fixture(scope="module")
def multi_event_enh():
    cfg = default_config()
    cfg = cfg.evolve(
        sep=replace(cfg.sep, r_x=12, r_d=8, event_num=3,
                    event_rank=(1, 5, 9)),
        adapt=replace(cfg.adapt, r_a=4, m_a=10),
        nmf=replace(cfg.nmf, max_iter=8),
    )
    rng = np.random.default_rng(0)
    f = cfg.signal.n_bins
    bx = rng.random((f, 12)) + 1e-3
    bd = rng.random((f, 8)) + 1e-3
    return SnmfEnhancer(cfg, bx, bd, bx, bd, dtype=jnp.float64,
                        matlab_ad_blk_init=False)


@pytest.mark.slow
def test_separate_shapes_and_enhanced_parity(multi_event_enh, m03_wav):
    x = m03_wav[0][:16000]
    out = multi_event_enh.separate(x)
    want = multi_event_enh.enhance(x)
    assert len(out["events"]) == 3
    assert len(out["noises"]) == 1
    for src in out["events"] + out["noises"]:
        assert src.shape == want.shape
    # the enhanced output of the separation run equals the plain path up to
    # block-sum vs single-GEMM association (<=1 LSB after quantization)
    d = np.abs(out["enhanced"].astype(np.int64) - want.astype(np.int64))
    assert d.max() <= 1


@pytest.mark.slow
def test_separate_event_energy_split(multi_event_enh, m03_wav):
    """Each per-event waveform is nontrivial and they differ from each
    other (distinct dictionary blocks -> distinct reconstructions)."""
    x = m03_wav[0][:16000]
    out = multi_event_enh.separate(x, quantize=False)
    evs = out["events"]
    for e in evs:
        assert np.abs(e).max() > 0
    assert not np.allclose(evs[0], evs[1])
    assert not np.allclose(evs[1], evs[2])


@pytest.mark.slow
def test_techwin_preset_runs(m03_wav):
    """The 3-event Techwin RT preset end-to-end."""
    cfg = preset("techwin_rt")
    cfg = cfg.evolve(nmf=replace(cfg.nmf, max_iter=5))
    rng = np.random.default_rng(1)
    f = cfg.signal.n_bins
    bx = rng.random((f, cfg.sep.r_x)) + 1e-3
    bd = rng.random((f, cfg.sep.r_d)) + 1e-3
    enh = SnmfEnhancer(cfg, bx, bd, bx, bd, dtype=jnp.float64,
                       matlab_ad_blk_init=False)
    out = enh.separate(m03_wav[0][:8000])
    assert len(out["events"]) == 3
    assert np.isfinite(out["enhanced"]).all()
