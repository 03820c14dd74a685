"""SNR-grid campaign (runtime/grid.py): the reference's IS16 experiment
(Do_MultiBatch_IS16_20160324.m:181-221) on the synthesized corpus —
corpus construction invariants, an end-to-end tiny grid, and the
artifact-pinned NAT-beats-fixed gate on the recorded full-rank run."""

import json
from pathlib import Path

import numpy as np
import pytest

from se_snmf_nat_tpu.runtime.grid import (NOISE_TYPES, build_grid_corpus,
                                          run_grid, synth_noise)


def test_synth_noise_types_deterministic_and_distinct():
    fs, n = 16000, 16000
    speech = np.random.default_rng(3).standard_normal(32000)
    outs = {}
    for kind in NOISE_TYPES:
        a = synth_noise(kind, n, fs, np.random.default_rng(0), speech)
        b = synth_noise(kind, n, fs, np.random.default_rng(0), speech)
        np.testing.assert_array_equal(a, b)        # seeded determinism
        assert np.isfinite(a).all() and abs(np.std(a) - 1.0) < 1e-6
        outs[kind] = a
    # spectral distinctness: no two categories within 1e-2 spectra
    specs = {k: np.abs(np.fft.rfft(v))[:2000] for k, v in outs.items()}
    kinds = list(specs)
    for i in range(len(kinds)):
        for j in range(i + 1, len(kinds)):
            c = np.corrcoef(specs[kinds[i]], specs[kinds[j]])[0, 1]
            assert c < 0.95, (kinds[i], kinds[j], c)
    # variant drift: mixing-segment generator differs from training's
    a0 = synth_noise("tmetro", n, fs, np.random.default_rng(0), speech,
                     variant=0.0)
    a1 = synth_noise("tmetro", n, fs, np.random.default_rng(0), speech,
                     variant=1.0)
    assert np.corrcoef(np.abs(np.fft.rfft(a0)),
                       np.abs(np.fft.rfft(a1)))[0, 1] < 0.99


def test_corpus_construction_invariants(tmp_path):
    m = build_grid_corpus(tmp_path, noises=("dliving", "nriver"),
                          snrs=(0, 10), clip_s=1.0, n_clips=2,
                          train_s=4.0)
    from se_snmf_nat_tpu.io.wavio import read_wav_int16
    assert m["noises"] == ["dliving", "nriver"]
    lead = m["lead"]
    for kind in m["noises"]:
        # held-out discipline: the training wav and any mixture share no
        # segment (train stream and mix stream are separate draws)
        tr, _ = read_wav_int16(tmp_path / "noise_train" / f"{kind}.wav")
        for name in m["clips"]:
            clean, fs = read_wav_int16(tmp_path / "clean" / name)
            for snr in m["snrs"]:
                mix, _ = read_wav_int16(
                    tmp_path / "noisy" / kind / f"{snr}dB" / name)
                assert len(mix) == lead + len(clean)
                # measured mixing SNR == requested (within int16 rounding)
                nseg = mix[lead:].astype(float) - clean.astype(float)
                got = 20 * np.log10(np.std(clean.astype(float))
                                    / (np.std(nseg) + 1e-9))
                assert abs(got - snr) < 0.6, (kind, snr, got)


@pytest.mark.slow
def test_tiny_grid_end_to_end(tmp_path):
    """Corpus -> train -> enhance (3 algorithms) -> battery, on a tiny
    CPU-sized grid; checks report structure and that enhancement beats
    the noisy baseline for the SNMF family."""
    build_grid_corpus(tmp_path, noises=("tmetro",), snrs=(5,),
                      clip_s=1.6, n_clips=1, train_s=5.0)
    rep = run_grid(tmp_path, algorithms=("snmf", "snmf_fixed", "ms"),
                   rank=8, max_iter=8, verbose=False)
    cond = rep["conditions"]["tmetro/5dB"]
    assert set(cond) == {"noisy", "snmf", "snmf_fixed", "ms"}
    for alg in ("snmf", "snmf_fixed", "ms"):
        assert np.isfinite(cond[alg]["seg_snr_db"])
        assert cond[alg]["stoi"] is not None
        out = tmp_path / "enhanced" / alg / "tmetro" / "5dB" / "clip_00.wav"
        assert out.exists()
    assert rep["mean_seg_snr_db"]["snmf"] > rep["mean_seg_snr_db"]["noisy"]
    assert rep["mean_seg_snr_db"]["snmf_fixed"] > \
        rep["mean_seg_snr_db"]["noisy"]
    assert "nat_minus_fixed_seg_snr_db" in rep


def test_recorded_grid_artifact_nat_beats_fixed():
    """The paper's central claim, pinned on the recorded full-rank grid
    artifact (QUALITY_GRID_r05.json, produced by `python -m
    se_snmf_nat_tpu grid` at rank 100 on the full six-noise x four-SNR
    grid): NAT's mean segmental SNR must not trail SNMF-fixed."""
    art = Path(__file__).resolve().parent.parent / "QUALITY_GRID_r05.json"
    if not art.exists():
        pytest.skip("grid artifact not yet recorded")
    rep = json.loads(art.read_text())
    assert rep["nat_minus_fixed_seg_snr_db"] >= 0.0, rep["mean_seg_snr_db"]
    # sanity: the artifact really is the full grid
    assert len(rep["conditions"]) == 24
    assert set(rep["manifest"]["noises"]) == set(NOISE_TYPES)
