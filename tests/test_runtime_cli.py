"""Runtime services (checkpointing, batch runner) and the CLI."""

import json
from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from se_snmf_nat_tpu.cli import main as cli_main
from se_snmf_nat_tpu.config import default_config
from se_snmf_nat_tpu.io.wavio import read_wav_int16, write_wav_int16
from se_snmf_nat_tpu.runtime.checkpoint import (
    load_adapted_dictionary, load_engine_state, save_adapted_dictionary,
    save_engine_state)
from se_snmf_nat_tpu.runtime.runner import BatchRunner
from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer


FS = 16000


@pytest.fixture(scope="module")
def small_cfg():
    cfg = default_config()
    return cfg.evolve(
        sep=replace(cfg.sep, r_x=8, r_d=8),
        adapt=replace(cfg.adapt, r_a=4, m_a=10),
        nmf=replace(cfg.nmf, max_iter=5),
    )


@pytest.fixture(scope="module")
def small_enh(small_cfg):
    rng = np.random.default_rng(0)
    f = small_cfg.signal.n_bins
    bx = rng.random((f, 8)) + 1e-3
    bd = rng.random((f, 8)) + 1e-3
    return SnmfEnhancer(small_cfg, bx, bd, bx, bd, dtype=jnp.float64,
                        matlab_ad_blk_init=False)


def test_engine_state_checkpoint_roundtrip(small_enh, tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(FS) * 3000
    _, state = small_enh.enhance(x, return_state=True)
    path = tmp_path / "state.npz"
    save_engine_state(path, state)
    loaded = load_engine_state(path, jnp.float64)
    for f in state._fields:
        np.testing.assert_array_equal(np.asarray(getattr(state, f)),
                                      np.asarray(getattr(loaded, f)), err_msg=f)
    # resumed state continues bit-identically
    y1 = small_enh.enhance(x, state=state)
    y2 = small_enh.enhance(x, state=loaded)
    np.testing.assert_array_equal(y1, y2)


def test_adapted_dictionary_checkpoint(small_enh, tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(FS) * 3000
    _, state = small_enh.enhance(x, return_state=True)
    path = tmp_path / "B_D_u.npz"
    save_adapted_dictionary(path, state)
    fresh = small_enh.initial_state()
    seeded = load_adapted_dictionary(path, fresh, jnp.float64)
    np.testing.assert_array_equal(np.asarray(seeded.b_d_head),
                                  np.asarray(state.b_d_head))
    # everything else reset (reference semantics: only B_D persists)
    np.testing.assert_array_equal(np.asarray(seeded.lambda_dav),
                                  np.asarray(fresh.lambda_dav))
    # missing file -> state unchanged (try/catch load)
    same = load_adapted_dictionary(tmp_path / "nope.npz", fresh, jnp.float64)
    assert same is fresh


@pytest.fixture()
def wav_db(tmp_path):
    rng = np.random.default_rng(3)
    d = tmp_path / "db"
    d.mkdir()
    for i in range(3):
        x = (rng.standard_normal(FS // 2) * 2000).astype(np.int16)
        write_wav_int16(d / f"u{i}.wav", x, FS)
    return d


@pytest.mark.slow
def test_batch_runner_skip_and_carry(small_enh, wav_db, tmp_path):
    out = tmp_path / "out"
    state_path = tmp_path / "B_D_u.npz"
    runner = BatchRunner(small_enh, carry_state=True, state_path=state_path,
                         verbose=False)
    rep = runner.run(wav_db, out)
    assert len(rep.processed) == 3 and not rep.skipped
    assert state_path.exists()
    # second run skips everything (idempotence, run_ntf_sep_RT.m:35-40)
    rep2 = BatchRunner(small_enh, carry_state=True, verbose=False).run(
        wav_db, out)
    assert len(rep2.skipped) == 3 and not rep2.processed
    # forced rewrite reprocesses
    rep3 = BatchRunner(small_enh, force_rewrite=True, carry_state=False,
                       verbose=False).run(wav_db, out)
    assert len(rep3.processed) == 3


@pytest.mark.slow
def test_batch_runner_ms_no_cross_file_bleed(wav_db, tmp_path):
    """carry_state with an enhancer lacking a dictionary head (MS) must NOT
    thread stream state across unrelated files: each output equals the
    one-shot enhancement of that file alone (ADVICE r1: MsStreamState si/ssv
    tails were leaking file N's OLA tail into file N+1)."""
    from se_snmf_nat_tpu.enhance.ms import MmseEnhancer
    enh = MmseEnhancer(fs=FS, dtype=jnp.float64)
    out = tmp_path / "out_ms"
    rep = BatchRunner(enh, carry_state=True, verbose=False).run(wav_db, out)
    assert len(rep.processed) == 3
    for f in sorted(wav_db.iterdir()):
        x, fs = read_wav_int16(f)
        want = enh.enhance(x)
        got, _ = read_wav_int16(out / f"{f.stem}_enh.wav")
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_batch_runner_ms_batches_despite_carry_flag(wav_db, tmp_path):
    """batch_size>1 engages the vmapped batch plan for enhancers without a
    dictionary head even when carry_state=True (the CLI default for ms):
    carry is a no-op for them, so batching is semantics-free throughput.
    Outputs equal the one-shot per-file enhancement bit-for-bit."""
    from se_snmf_nat_tpu.enhance.ms import MmseEnhancer
    enh = MmseEnhancer(fs=FS, dtype=jnp.float64)
    out = tmp_path / "out_ms_batch"
    rep = BatchRunner(enh, carry_state=True, verbose=False).run(
        wav_db, out, batch_size=3)
    assert len(rep.processed) == 3
    for f in sorted(wav_db.iterdir()):
        x, fs = read_wav_int16(f)
        got, _ = read_wav_int16(out / f"{f.stem}_enh.wav")
        np.testing.assert_array_equal(got, enh.enhance(x))


@pytest.mark.slow
def test_batch_runner_snmf_carry_is_dictionary_only(small_enh, wav_db,
                                                    tmp_path):
    """Cross-file carry mirrors B_D_u exactly: file N+1 starts from a fresh
    init_buff state with only b_d_head seeded from file N
    (NTF_sep_event_RT.m:28-46,136-139)."""
    out = tmp_path / "out_dict"
    BatchRunner(small_enh, carry_state=True, verbose=False).run(wav_db, out)
    files = sorted(wav_db.iterdir())
    state = small_enh.initial_state()
    for f in files:
        x, fs = read_wav_int16(f)
        want, state_out = small_enh.enhance(x, state=state,
                                            return_state=True)
        state = small_enh.initial_state()._replace(
            b_d_head=state_out.b_d_head)
        got, _ = read_wav_int16(out / f"{f.stem}_enh.wav")
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_cli_enhance_and_eval(small_enh, wav_db, tmp_path, capsys,
                              monkeypatch):
    # single-file enhance via the real CLI with explicit tiny bases
    rng = np.random.default_rng(4)
    f = default_config().signal.n_bins
    from se_snmf_nat_tpu.io.basis import BasisPair, save_basis
    pair = BasisPair(b_dft=rng.random((f, 100)) + 1e-3,
                     b_mel=rng.random((64, 100)) + 1e-3)
    save_basis(tmp_path / "b.npz", pair)
    src = sorted(wav_db.iterdir())[0]
    out = tmp_path / "enh.wav"
    rc = cli_main(["enhance", str(src), "-o", str(out),
                   "--algorithm", "snmf", "--dtype", "float64",
                   "--speech-basis", str(tmp_path / "b.npz"),
                   "--noise-basis", str(tmp_path / "b.npz")])
    assert rc == 0 and out.exists()
    x, fs = read_wav_int16(out)
    assert fs == FS and len(x) > 0
    capsys.readouterr()

    rc = cli_main(["eval", "--got", str(out), "--want", str(out)])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip())
    assert metrics["max_abs_err"] == 0.0 and metrics["corr"] == 1.0


@pytest.mark.slow
def test_cli_demo_viz_artifacts(wav_db, tmp_path, capsys):
    """cli demo with --viz-dir dumps the SE_GUI plot analogs (spectrograms,
    waveform panel, basis evolution) and --ascii-spec prints a terminal
    spectrogram (SE_GUI.m:437-479; src/func/myspectrogram.m role)."""
    rng = np.random.default_rng(5)
    f = default_config().signal.n_bins
    from se_snmf_nat_tpu.io.basis import BasisPair, save_basis
    pair = BasisPair(b_dft=rng.random((f, 100)) + 1e-3,
                     b_mel=rng.random((64, 100)) + 1e-3)
    save_basis(tmp_path / "b.npz", pair)
    src = sorted(wav_db.iterdir())[0]
    viz = tmp_path / "viz"
    rc = cli_main(["demo", str(src), "--mode", "snmf", "--block", "8",
                   "--viz-dir", str(viz), "--ascii-spec",
                   "--speech-basis", str(tmp_path / "b.npz"),
                   "--noise-basis", str(tmp_path / "b.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert len(report["viz"]) == 4
    for p in report["viz"]:
        from pathlib import Path
        assert Path(p).exists() and Path(p).stat().st_size > 1000
    assert "enhanced output spectrogram:" in out
    assert "0s" in out  # the ascii time axis rendered


@pytest.mark.slow
def test_cli_demo_bnmf_mode(wav_db, tmp_path, capsys):
    """demo --mode bnmf drives the BnmfStreamingSession hop by hop (the
    third algorithm family live)."""
    wavs = sorted(wav_db.iterdir())
    out = tmp_path / "bnmf_demo.wav"
    rc = cli_main(["demo", str(wavs[0]), "--mode", "bnmf",
                   "--bnmf-speech", str(wavs[1]), "-o", str(out),
                   "--block", "4", "--dtype", "float64"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["mode"] == "bnmf" and report["hops"] > 0
    y, fs = read_wav_int16(out)
    assert fs == FS and len(y) > 0
    with pytest.raises(SystemExit):
        cli_main(["demo", str(wavs[0]), "--mode", "bnmf"])


@pytest.mark.slow
def test_cli_demo_live_pcm_stream(wav_db, tmp_path, capsys):
    """Live capture path (dsp_record.m role): demo '-' consumes raw int16
    PCM from stdin hop by hop and --pcm-out streams enhanced PCM to stdout;
    the result equals the file-mode demo bit for bit."""
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path
    src = sorted(wav_db.iterdir())[0]
    x, fs = read_wav_int16(src)

    out_wav = tmp_path / "file_mode.wav"
    rc = cli_main(["demo", str(src), "--mode", "ms", "-o", str(out_wav)])
    assert rc == 0
    capsys.readouterr()
    want, _ = read_wav_int16(out_wav)

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu",
                "PYTHONPATH": str(repo) + os.pathsep
                + env.get("PYTHONPATH", "")})
    p = subprocess.run(
        [_sys.executable, "-m", "se_snmf_nat_tpu", "demo", "-",
         "--mode", "ms", "--pcm-out", "--live-rate", str(fs)],
        input=np.asarray(x, np.int16).astype("<i2").tobytes(),
        capture_output=True, env=env, timeout=240)
    assert p.returncode == 0, p.stderr[-2000:]
    got = np.frombuffer(p.stdout, "<i2")
    report = json.loads(p.stderr.decode().strip().splitlines()[-1])
    assert report["hops"] == len(x) // (fs // 100)
    np.testing.assert_array_equal(got, want)


def test_ascii_spectrogram_shape():
    from se_snmf_nat_tpu.utils.visualize import ascii_spectrogram
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000) * 1000
    art = ascii_spectrogram(x, 16000, rows=8, cols=40)
    lines = art.splitlines()
    assert len(lines) == 10  # 8 rows + axis + time labels
    assert all(len(l) >= 40 for l in lines[:8])


@pytest.mark.slow
def test_cli_train(wav_db, tmp_path, capsys):
    rc = cli_main(["train", "--db", str(wav_db), "--basis-dir",
                   str(tmp_path / "bdir"), "--rank", "6",
                   "--dtype", "float64", "--seed", "0"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rank"] == 6
    assert (tmp_path / "bdir" / "R_6.npz").exists()


@pytest.mark.slow
def test_orbax_checkpoint_roundtrip(small_enh, tmp_path):
    from se_snmf_nat_tpu.runtime.checkpoint import (
        load_engine_state_orbax, save_engine_state_orbax)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(FS) * 3000
    _, state = small_enh.enhance(x, return_state=True)
    path = tmp_path / "orbax_ckpt"
    save_engine_state_orbax(path, state)
    loaded = load_engine_state_orbax(path, small_enh.initial_state())
    for f in state._fields:
        np.testing.assert_array_equal(np.asarray(getattr(state, f)),
                                      np.asarray(getattr(loaded, f)),
                                      err_msg=f)
    # pre-r4 checkpoints lack adapt_on (review finding: the orbax loader
    # raised on the tree-structure mismatch instead of falling back to
    # the template default like the npz loader does)
    import orbax.checkpoint as ocp
    legacy_tree = {k: v for k, v in state._asdict().items()
                   if k != "adapt_on"}
    legacy_path = tmp_path / "orbax_legacy"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(legacy_path.absolute(), legacy_tree, force=True)
    restored = load_engine_state_orbax(legacy_path,
                                       small_enh.initial_state())
    assert bool(np.asarray(restored.adapt_on))     # template default
    for f in legacy_tree:
        np.testing.assert_array_equal(np.asarray(getattr(state, f)),
                                      np.asarray(getattr(restored, f)),
                                      err_msg=f)


def test_shard_files_for_host():
    from se_snmf_nat_tpu.parallel.distributed import (
        init_multihost, shard_files_for_host)
    info = init_multihost()            # single-process no-op
    assert info["process_count"] == 1
    files = [f"u{i}.wav" for i in range(10)]
    shards = [shard_files_for_host(files, pi, 3) for pi in range(3)]
    assert sorted(sum(shards, [])) == sorted(files)
    assert not (set(shards[0]) & set(shards[1]))


def test_merged_dictionary_state(small_enh):
    from se_snmf_nat_tpu.parallel.distributed import merged_dictionary_state
    from se_snmf_nat_tpu.parallel.mesh import make_mesh, data_sharding
    import jax
    mesh = make_mesh((8, 1))
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (8,) + a.shape),
        small_enh.initial_state())
    # perturb heads per shard, then merge
    rng = np.random.default_rng(6)
    heads = np.stack([np.asarray(states.b_d_head[i]) + rng.random(
        states.b_d_head[i].shape) for i in range(8)])
    states = states._replace(b_d_head=jax.device_put(
        jnp.asarray(heads), data_sharding(mesh, 3, 0)))
    merged = merged_dictionary_state(states, mesh)
    want = heads.mean(axis=0)
    got = np.asarray(merged.b_d_head)
    for i in range(8):
        np.testing.assert_allclose(got[i], want, rtol=1e-6)


def test_cli_bnmf_slot_clear_error(capsys):
    with pytest.raises(SystemExit) as e:
        cli_main(["enhance", "x.wav", "--algorithm", "bnmf"])
    assert "BNMF_nmoh" in str(e.value)


def test_profiler_trace_mechanics(tmp_path):
    """runtime.profiling.trace (bench --trace) captures a jax.profiler
    dump: the trace directory gains profiler artifacts for a jitted call."""
    import jax
    import jax.numpy as jnp
    from se_snmf_nat_tpu.runtime.profiling import annotate, trace

    f = jax.jit(lambda a: jnp.sum(a * a))
    a = jnp.arange(128.0)
    float(f(a))                                 # compile outside the trace
    out = tmp_path / "trace"
    with trace(str(out)):
        with annotate("probe"):
            float(f(a))
    files = [p for p in out.rglob("*") if p.is_file()]
    assert files, "profiler trace produced no artifacts"


def test_measure_hop_latency_mechanics(small_enh):
    """Latency split harness (bench --latency): device per-hop compute and
    single-hop dispatch both come back positive and self-consistent; real
    numbers are captured on the bench chip (BASELINE.md)."""
    from se_snmf_nat_tpu.runtime.profiling import measure_hop_latency
    rng = np.random.default_rng(2)
    x = rng.standard_normal(FS // 2) * 3000
    rep = measure_hop_latency(small_enh, x, n_rep=1, n_calls=5)
    assert rep["device_ms_per_hop"] > 0
    assert rep["singlehop_wall_ms"] > 0
    assert rep["hop_budget_ms"] == 10.0
    assert rep["n_frames"] > 0
    assert rep["dispatch_overhead_ms"] == pytest.approx(
        rep["singlehop_wall_ms"] - rep["device_ms_per_hop"], abs=0.02)


def test_bfloat16_checkpoint_roundtrip(small_enh, tmp_path):
    """np.savez degrades bf16 to void '|V2' which neither load path could
    read back (review finding): bf16 fields store as f32 and load clean."""
    from se_snmf_nat_tpu.runtime.checkpoint import (
        load_adapted_dictionary, save_adapted_dictionary)
    state = small_enh.initial_state()
    bf16_state = state._replace(
        b_d_head=jnp.asarray(state.b_d_head, jnp.bfloat16))
    p = tmp_path / "bd16.npz"
    save_adapted_dictionary(p, bf16_state)
    out = load_adapted_dictionary(p, state, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(out.b_d_head, np.float32),
        np.asarray(bf16_state.b_d_head, np.float32))


def test_cli_snmf_only_flags_rejected_for_other_algorithms():
    """--dft-matmul / --max-iter / --block-* configure the SNMF plans
    only; combining them with another algorithm must error instead of
    silently ignoring them (review finding)."""
    with pytest.raises(SystemExit) as e:
        cli_main(["enhance", "x.wav", "--algorithm", "imcra",
                  "--dft-matmul"])
    assert "--dft-matmul" in str(e.value) and "snmf" in str(e.value)
    with pytest.raises(SystemExit) as e:
        cli_main(["enhance", "x.wav", "--algorithm", "ms",
                  "--max-iter", "40"])
    assert "--max-iter" in str(e.value)


def test_batch_runner_length_sort_identical_outputs(small_enh, tmp_path):
    """length_sort only reorders the CHUNKING of the batch plan — every
    per-file output must be bit-identical to the unsorted run (lane
    independence), while heterogeneous directories pad less."""
    from se_snmf_nat_tpu.io.wavio import read_wav_int16, write_wav_int16
    rng = np.random.default_rng(3)
    db = tmp_path / "db"
    db.mkdir()
    for i, n in enumerate([4000, 17000, 6000, 12000, 5000, 9000]):
        write_wav_int16(db / f"m{i}.wav",
                        (rng.standard_normal(n) * 2000).astype(np.int16), FS)
    outs = {}
    for tag, sort in (("s", True), ("u", False)):
        out = tmp_path / f"out_{tag}"
        rep = BatchRunner(small_enh, carry_state=False, verbose=False,
                          length_sort=sort).run(db, out, batch_size=2)
        assert len(rep.processed) == 6
        outs[tag] = {p.name: read_wav_int16(p)[0]
                     for p in sorted(out.iterdir())}
    assert outs["s"].keys() == outs["u"].keys()
    for name in outs["s"]:
        np.testing.assert_array_equal(outs["s"][name], outs["u"][name])


@pytest.mark.slow
def test_cli_demo_pmwf_mode(wav_db, tmp_path, capsys):
    """demo --mode pmwf drives the real-time multichannel beamformer from
    comma-separated per-channel wavs (north-star config #4's live form)."""
    from se_snmf_nat_tpu.io.wavio import read_wav_int16, write_wav_int16
    src = sorted(wav_db.iterdir())[0]
    x, fs = read_wav_int16(src)
    x = x[:12000]
    paths = []
    for c in range(3):
        p = tmp_path / f"ch{c}.wav"
        write_wav_int16(p, np.roll(x, 7 * c).astype(np.int16), fs)
        paths.append(str(p))
    out_wav = tmp_path / "pmwf_out.wav"
    rc = cli_main(["demo", ",".join(paths), "--mode", "pmwf",
                   "--block", "8", "-o", str(out_wav)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["mode"] == "pmwf"
    assert report["hops"] >= 40
    assert report["rms_out"] > 0
    y, _ = read_wav_int16(out_wav)
    assert len(y) > 4000


def test_cli_demo_pmwf_rejects_mixed_rates(wav_db, tmp_path):
    """Review finding: per-channel wavs at different sample rates were
    silently beamformed sample-misaligned and written at the last file's
    rate; the CLI must refuse instead."""
    from se_snmf_nat_tpu.io.wavio import read_wav_int16, write_wav_int16
    src = sorted(wav_db.iterdir())[0]
    x, fs = read_wav_int16(src)
    p0 = tmp_path / "c0.wav"
    p1 = tmp_path / "c1.wav"
    write_wav_int16(p0, x[:8000].astype(np.int16), fs)
    write_wav_int16(p1, x[:8000].astype(np.int16), fs // 2)
    with pytest.raises(SystemExit, match="sample rates differ"):
        cli_main(["demo", f"{p0},{p1}", "--mode", "pmwf", "--block", "8",
                  "-o", str(tmp_path / "out.wav")])


def test_cli_demo_toggle_every(wav_db, tmp_path, capsys):
    """demo --toggle-every flips NAT adaptation mid-session (SE_GUI PTT
    parity at the CLI level) and the run still completes cleanly."""
    rng = np.random.default_rng(9)
    f = default_config().signal.n_bins
    from se_snmf_nat_tpu.io.basis import BasisPair, save_basis
    pair = BasisPair(b_dft=rng.random((f, 100)) + 1e-3,
                     b_mel=rng.random((64, 100)) + 1e-3)
    save_basis(tmp_path / "b.npz", pair)
    src = sorted(wav_db.iterdir())[0]
    rc = cli_main(["demo", str(src), "--mode", "snmf", "--block", "4",
                   "--toggle-every", "15", "--verbose",
                   "--speech-basis", str(tmp_path / "b.npz"),
                   "--noise-basis", str(tmp_path / "b.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "NAT adaptation -> OFF" in out
    assert "NAT adaptation -> ON" in out


@pytest.mark.slow
def test_batchrunner_multichannel_grouping(tmp_path):
    """run_IMCRA.m:7-30 ch/filegap semantics: the sorted file list walks
    with stride filegap, each ch-group forms one multichannel session;
    outputs match a direct enhancer call on the stacked channels, and
    skip-if-exists probes the LAST channel's output (the reference's
    fopen(path_denoise(p.ch,:)))."""
    import jax.numpy as jnp
    from se_snmf_nat_tpu.io.wavio import read_wav_int16, write_wav_int16
    from se_snmf_nat_tpu.multichannel.fixture import synth_mixture
    from se_snmf_nat_tpu.multichannel.pmwf import PmwfEnhancer
    from se_snmf_nat_tpu.runtime.runner import BatchRunner

    x, _ = synth_mixture(n=16000, n_ch=2)
    db = tmp_path / "db"
    db.mkdir()
    # two 2-channel sessions: per-mic files in sorted order (CHiME shape)
    for sess in range(2):
        for c in range(2):
            write_wav_int16(db / f"s{sess}_ch{c}.wav",
                            np.rint(x[c] * (1.0 + 0.1 * sess))
                            .astype(np.int16), 16000)
    enh = PmwfEnhancer(dtype=jnp.float64)
    out = tmp_path / "out"
    runner = BatchRunner(enh, verbose=False)
    rep = runner.run(db, out, ch=2)
    assert len(rep.processed) == 4 and not rep.skipped
    for sess in range(2):
        stacked = np.stack([
            read_wav_int16(db / f"s{sess}_ch{c}.wav")[0] for c in (0, 1)])
        want = np.atleast_2d(enh.enhance(stacked))
        for c in range(2):
            got, _ = read_wav_int16(out / f"s{sess}_ch{c}_enh.wav")
            np.testing.assert_array_equal(got, want[c].astype(np.int16))
    # skip-if-exists on rerun (last channel probe)
    rep2 = BatchRunner(enh, verbose=False).run(db, out, ch=2)
    assert not rep2.processed and len(rep2.skipped) == 4
    for bad in ({"ch": 0}, {"ch": 2, "filegap": 0}):
        with pytest.raises(ValueError):
            BatchRunner(enh, verbose=False).run(db, out, **bad)


def test_demo_play_without_sounddevice_exits_clearly(tmp_path, monkeypatch):
    """--play (the SE_GUI replay/soundsc analog) must fail with a clear
    message when the optional sounddevice dependency is absent, BEFORE
    any audio is processed."""
    import builtins
    import sys as _sys

    from se_snmf_nat_tpu.cli import main
    from se_snmf_nat_tpu.io.wavio import write_wav_int16

    wav = tmp_path / "in.wav"
    write_wav_int16(wav, np.zeros(1600, np.int16), 16000)
    real_import = builtins.__import__

    def fake_import(name, *a, **k):
        if name == "sounddevice":
            raise ImportError("no portaudio")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    monkeypatch.delitem(_sys.modules, "sounddevice", raising=False)
    with pytest.raises(SystemExit, match="sounddevice"):
        main(["demo", str(wav), "--play"])
