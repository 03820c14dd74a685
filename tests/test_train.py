"""Training subsystem: VAD, sequence assembly, features, basis training,
k-means reduction, DNMF refit.  Device solves are cross-checked in x64
against the float64 oracle solver (reference-exact semantics)."""

from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.io.basis import load_basis
from se_snmf_nat_tpu.io.wavio import write_wav_int16
from se_snmf_nat_tpu.oracle.sparse_nmf_np import sparse_nmf_np
from se_snmf_nat_tpu.train import (
    build_training_sequence, dnmf_refit, energy_vad, kmeans_reduce,
    train_event_basis, training_features)
from se_snmf_nat_tpu.train.basis import (
    exemplar_sample_idx, train_event_basis_cached)
from se_snmf_nat_tpu.train.dataset import normalize_clip
from se_snmf_nat_tpu.train.vad import apply_vad


FS = 16000


def _tone_with_silence():
    """1.2 s: 0.3 s near-silence, 0.6 s loud tone, 0.3 s near-silence."""
    rng = np.random.default_rng(0)
    sil = rng.standard_normal(int(0.3 * FS)) * 10.0
    tone = np.sin(2 * np.pi * 440 * np.arange(int(0.6 * FS)) / FS) * 8000.0
    return np.concatenate([sil, tone, sil])


def test_energy_vad_detects_tone():
    x = _tone_with_silence()
    vad = energy_vad(x, FS)
    mid = vad[int(0.35 * FS): int(0.85 * FS)]
    edges = np.concatenate([vad[: int(0.25 * FS)], vad[-int(0.25 * FS):]])
    assert mid.mean() > 0.95
    assert edges.mean() < 0.05
    kept = apply_vad(x, vad)
    assert 0 < len(kept) < len(x)


def test_normalize_clip():
    x = np.random.default_rng(1).standard_normal(1000) * 123.0
    y = normalize_clip(x)
    assert np.max(np.abs(y)) == pytest.approx(30000.0)


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.default_rng(7)
    for i in range(4):
        x = (rng.standard_normal(FS // 2) * 3000).astype(np.int16)  # 0.5 s
        write_wav_int16(tmp_path / f"clip{i}.wav", x, FS)
    return tmp_path


def test_build_training_sequence_caps(wav_dir):
    cfg = default_config()
    cfg = cfg.evolve(train=replace(cfg.train, train_file_len_max_s=0.25,
                                   train_seq_len_max_s=0.6))
    seq, spec = build_training_sequence(wav_dir, cfg, shuffle=False)
    # each file capped to 0.25 s; sequence capped at 0.6 s after exceeding
    assert len(seq) == int(0.6 * FS)
    assert len(spec.files) == 3          # 3rd file pushes past the cap
    assert np.max(np.abs(seq[: FS // 4])) == pytest.approx(30000.0)


def test_exemplar_sampling_deterministic():
    a = exemplar_sample_idx(500, 40)
    b = exemplar_sample_idx(500, 40)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 40


def test_kmeans_reduce_separated_clusters():
    rng = np.random.default_rng(3)
    centers = np.eye(8) * 10.0
    cols = np.repeat(centers, 5, axis=0) + rng.standard_normal((40, 8)) * 0.05
    keep = kmeans_reduce(cols.T, 8, rng=np.random.default_rng(0))
    assert len(keep) == 8
    # one representative from each true cluster
    assert len({int(i) // 5 for i in keep}) == 8


@pytest.fixture()
def train_cfg():
    cfg = default_config()
    return cfg.evolve(
        sep=replace(cfg.sep, r_x=8, r_d=8),
        nmf=replace(cfg.nmf, max_iter=12, conv_eps=0.0),
        runtime=replace(cfg.runtime, dtype="float64"),
    )


@pytest.fixture()
def features(train_cfg):
    rng = np.random.default_rng(5)
    s = rng.standard_normal(FS * 2) * 5000.0
    return training_features(s, train_cfg)


def test_training_features_shapes(train_cfg, features):
    s = train_cfg.signal
    assert features.tf_mag.shape[0] == s.n_bins
    assert features.tf_mel.shape[0] == s.f_order
    assert features.tf_mag.shape[1] == features.tf_mel.shape[1]
    assert np.all(features.tf_mag >= 0)


def test_train_event_basis_matches_oracle(train_cfg, features):
    """The device full solve must equal the reference-exact float64 oracle:
    same exemplar init, same V4-seeded H init, same MU iterations."""
    r = 8
    res = train_event_basis(features, train_cfg, r, dtype=jnp.float64)
    assert res.basis.b_dft.shape == (train_cfg.signal.n_bins, r)

    idx = exemplar_sample_idx(features.tf_mag.shape[1],
                              train_cfg.train.cluster_buff * r, seed=1)
    w_ref, _, _ = sparse_nmf_np(
        features.tf_mag, cf="kl", sparsity=5.0,
        max_iter=train_cfg.nmf.max_iter, conv_eps=0.0,
        random_seed=1, init_w=features.tf_mag[:, idx])
    wn = np.sqrt((w_ref * w_ref).sum(0))
    np.testing.assert_allclose(res.basis.b_dft, w_ref / wn + 1e-9,
                               rtol=0, atol=1e-9)


def test_train_cached_roundtrip(wav_dir, tmp_path, train_cfg):
    cfg = train_cfg.evolve(
        train=replace(train_cfg.train, train_seq_len_max_s=2.0))
    basis_dir = tmp_path / "basis_out"
    pair1 = train_event_basis_cached(wav_dir, basis_dir, cfg, 8,
                                     dtype=jnp.float64, shuffle_rng=None)
    assert (basis_dir / "R_8.npz").exists()
    pair2 = train_event_basis_cached(wav_dir, basis_dir, cfg, 8,
                                     dtype=jnp.float64)
    np.testing.assert_array_equal(pair1.b_dft, pair2.b_dft)
    loaded = load_basis(basis_dir / "R_8.npz")
    np.testing.assert_array_equal(loaded.b_mel, pair1.b_mel)


def test_dnmf_refit_shapes_and_oracle(train_cfg):
    rng = np.random.default_rng(11)
    x = rng.standard_normal(FS) * 4000.0
    d = rng.standard_normal(FS) * 2000.0
    f = train_cfg.signal.n_bins
    r_x, r_d = train_cfg.sep.r_x, train_cfg.sep.r_d
    b = rng.random((f, r_x + r_d)) + 1e-3
    b_hat = dnmf_refit(x, d, b, train_cfg, dtype=jnp.float64)
    assert b_hat.shape == (f, r_x + r_d)
    assert np.all(b_hat >= 0)
    # column norms 1 after the W-solve's normalization
    np.testing.assert_allclose(
        np.sqrt((b_hat * b_hat).sum(0)), 1.0, atol=1e-9)

    # oracle cross-check of the Eq.(6)+(7) chain
    feats = training_features(np.minimum(len(x), len(d)) and x, train_cfg)
    vy = training_features(x + d, train_cfg).tf_mag
    vx = feats.tf_mag
    from se_snmf_nat_tpu.utils.matlab_compat import matlab_v4_rand_matrix
    _, a_hat, _ = sparse_nmf_np(
        vy, cf="kl", sparsity=5.0, max_iter=train_cfg.nmf.max_iter,
        conv_eps=0.0, random_seed=1, init_w=b,
        w_update_ind=np.zeros(r_x + r_d, bool))
    w_ref, _, _ = sparse_nmf_np(
        vx, cf="kl", sparsity=5.0, max_iter=train_cfg.nmf.max_iter,
        conv_eps=0.0, random_seed=1, init_w=b[:, :r_x],
        init_h=a_hat[:r_x], h_update_ind=np.zeros(r_x, bool))
    np.testing.assert_allclose(b_hat[:, :r_x], w_ref, rtol=0, atol=1e-10)


def test_exemplar_cluster_reduction_e2e(train_cfg, features):
    """cluster_buff=2: over-sample 2R exemplar columns then k-means-reduce
    to R (run_basis_train.m:118-134 path)."""
    from dataclasses import replace
    cfg = train_cfg.evolve(train=replace(train_cfg.train,
                                         train_exemplar=True,
                                         cluster_buff=2))
    res = train_event_basis(features, cfg, 8, dtype=jnp.float64,
                            kmeans_rng=np.random.default_rng(0))
    assert res.basis.b_dft.shape[1] == 8
    assert res.basis.b_mel.shape[1] == 8
    # reduced columns are a subset of the over-sampled normalized exemplars
    idx = exemplar_sample_idx(features.tf_mag.shape[1], 16, seed=1)
    full = features.tf_mag[:, idx]
    full = full / np.sqrt((full * full).sum(0)) + 1e-9
    for col in res.basis.b_dft.T:
        dists = np.abs(full - col[:, None]).sum(0)
        assert dists.min() < 1e-9


@pytest.mark.slow
def test_exemplar_draw_envelope(tmp_path, m03_wav, reference_bases):
    """Bound the documented randsample deviation (PARITY.md): the exemplar
    column draw is the only unreproducible step vs the reference
    (MATLAB randsample's RNG consumption is undocumented), so the honest
    bound on 'our exemplar checkpoint vs a reference one' is the output
    spread ACROSS draws — the reference's own outputs move within the same
    envelope when its session RNG differs.  Trains exemplar noise
    dictionaries with three draw seeds, enhances the same clip, and gates
    the spread: identical seed -> identical output (determinism), distinct
    seeds -> distinct but tightly correlated outputs."""
    from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer
    from se_snmf_nat_tpu.train.basis import train_event_basis

    x, fs = m03_wav
    speech, _ = reference_bases
    # noise training material: the noise-dominated head of the CHiME clip
    write_wav_int16(tmp_path / "noise.wav",
                    x[:24000].astype(np.int16), fs)
    cfg = default_config()
    r = 32
    # cluster_buff=2 is the production exemplar path (over-draw 2R then
    # k-means-reduce, run_basis_train.m:84-98) — the reduction averages
    # out much of the draw variance, so this measures the envelope of the
    # pipeline as actually shipped
    cfg = cfg.evolve(
        train=replace(cfg.train, train_exemplar=True, cluster_buff=2),
        sep=replace(cfg.sep, r_x=r, r_d=r),
        adapt=replace(cfg.adapt, r_a=16, m_a=20),
    )
    seq, _ = build_training_sequence(tmp_path, cfg, shuffle=False)
    feats = training_features(seq, cfg, dc_bin=cfg.signal.dc_bin)
    b_x = speech.b_dft[:, :r]
    clip = x[24000:36000].astype(np.float64)

    outs = {}
    for seed in (1, 1, 2, 3):
        res = train_event_basis(feats, cfg, r, dtype=jnp.float64,
                                exemplar_seed=seed)
        b_d = res.basis.b_dft
        enh = SnmfEnhancer(cfg, b_x, b_d, b_x, b_d,
                           dtype=jnp.float64, matlab_ad_blk_init=False)
        y = enh.enhance(clip).astype(np.float64)
        outs.setdefault(seed, []).append(y)

    # determinism: the same draw reproduces bit-identically
    np.testing.assert_array_equal(outs[1][0], outs[1][1])
    # spread across draws: distinct, but inside a tight envelope — the
    # measured corr floor documents the randsample reproduction bound
    pairs = [(1, 2), (1, 3), (2, 3)]
    corrs = []
    for a, b in pairs:
        ya, yb = outs[a][0], outs[b][0]
        assert not np.array_equal(ya, yb)
        corrs.append(float(np.corrcoef(ya, yb)[0, 1]))
    print("exemplar draw envelope corrs:", corrs)
    assert min(corrs) > 0.95, corrs
