"""Native C++ IO library vs the Python reference implementations."""

import numpy as np
import pytest

from se_snmf_nat_tpu.dsp.stft import stream_frames
from se_snmf_nat_tpu.io import native
from se_snmf_nat_tpu.io.wavio import (
    enhanced_quantize, read_wav_int16, write_wav_int16)
from se_snmf_nat_tpu.utils.matlab_compat import matlab_int16_write

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C++ toolchain")


def test_quantize_matches_matlab():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.standard_normal(10000) * 20000,
        [0.5, -0.5, 1.5, -1.5, 32767.4, 32767.6, -32768.4, -32768.6,
         0.49999999, -0.49999999]])
    np.testing.assert_array_equal(native.quantize_int16(x),
                                  matlab_int16_write(x))


def test_frame_stream_matches_python():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(16013) * 1000   # non-multiple of hop
    got = native.frame_stream(x, 640, 160, 4)
    want = stream_frames(x, 640, 160, n_flush=4)
    np.testing.assert_array_equal(got, want)


def test_overlap_add_matches_python():
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((37, 640))
    got = native.overlap_add(frames, 160)
    acc = np.zeros(36 * 160 + 640)
    for i in range(37):
        acc[i * 160: i * 160 + 640] += frames[i]
    np.testing.assert_allclose(got, acc, rtol=0, atol=0)


def test_wav_roundtrip_matches_python(tmp_path):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(12345) * 9000).astype(np.int16)
    p_native = tmp_path / "n.wav"
    p_py = tmp_path / "p.wav"
    native.write_wav_int16(p_native, x, 16000)
    write_wav_int16(p_py, x, 16000)
    assert p_native.read_bytes() == p_py.read_bytes()
    got, fs_n = native.read_wav_int16(p_native)
    want, fs_p = read_wav_int16(p_py)
    assert fs_n == fs_p == 16000
    np.testing.assert_array_equal(got, want)


def test_read_reference_wav_matches_python():
    got, fs_n = native.read_wav_int16(
        "/root/reference/wav/M03_423C0213_STR.CH6.wav")
    want, fs_p = read_wav_int16(
        "/root/reference/wav/M03_423C0213_STR.CH6.wav")
    assert fs_n == fs_p
    np.testing.assert_array_equal(got, want)


def test_enhanced_write_chain(tmp_path):
    rng = np.random.default_rng(4)
    y = rng.standard_normal(8000) * 15000
    p = tmp_path / "e.wav"
    native.write_enhanced_wav(p, y, 16000)
    got, _ = native.read_wav_int16(p)
    np.testing.assert_array_equal(got.astype(np.int16), enhanced_quantize(y))


def test_malformed_multichannel_data_chunk_no_overflow(tmp_path):
    """A stereo wav whose data-chunk byte size is not a multiple of
    2*channels must not write past the n_samples*channels buffer
    (review finding: heap overflow in the native reader)."""
    import struct
    p = tmp_path / "bad.wav"
    data = struct.pack("<3h", 100, -200, 300)       # 6 bytes, ch=2 -> 1 frame
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000,
                                   64000, 4, 16)
           + b"data" + struct.pack("<I", len(data)))
    p.write_bytes(hdr + data)
    from se_snmf_nat_tpu.io import native
    if native._load() is None:
        pytest.skip("native lib unavailable")
    x, fs = native.read_wav_int16(p)
    assert fs == 16000 and x.shape == (2, 1)
    np.testing.assert_array_equal(x, [[100.0], [-200.0]])
