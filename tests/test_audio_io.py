"""WAV I/O: round-trips, native-vs-NumPy bit equality, malformed inputs.

The NumPy RIFF codec in `utils/audio_io.py` is the oracle; when the native
library is present (`HAS_NATIVE`), every read/write is additionally asserted
bit-identical across the two paths, the analog of the reference's
`test_cpp_extension.py` fallback-parity suite.
"""

import io
import struct
import wave

import numpy as np
import pytest

from mlx_audio_primitives_tpu._native import HAS_NATIVE
from mlx_audio_primitives_tpu.utils.audio_io import read_wav, wav_info, write_wav


def _sig(frames=1000, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    x = 0.7 * np.sin(2 * np.pi * 440 * np.arange(frames) / 16000)
    x = x[None] + 0.1 * rng.standard_normal((channels, frames))
    return np.clip(x, -1, 1).astype(np.float32)


# quantization bound: |round(x*(S-1))/S - x| <= 1.5/S for |x| <= 1
@pytest.mark.parametrize("bits,tol", [(16, 2 ** -14), (24, 2 ** -22), (32, 0.0)])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(tmp_path, bits, tol, channels):
    x = _sig(channels=channels)
    p = tmp_path / f"t{bits}_{channels}.wav"
    write_wav(p, x if channels > 1 else x[0], 16000, bits=bits)
    y, sr = read_wav(p)
    assert sr == 16000
    if channels == 1:
        assert y.shape == (1000,)
        y = y[None]
    else:
        assert y.shape == (channels, 1000)
    np.testing.assert_allclose(y, x, atol=tol)
    info = wav_info(p)
    assert info == {
        "sr": 16000,
        "channels": channels,
        "frames": 1000,
        "bits": bits,
        "format": "float" if bits == 32 else "pcm",
    }


def test_always_2d(tmp_path):
    p = tmp_path / "m.wav"
    write_wav(p, _sig()[0], 8000)
    y, _ = read_wav(p, always_2d=True)
    assert y.shape == (1, 1000)


def test_stdlib_wave_interop(tmp_path):
    """Our PCM16 files parse with the stdlib `wave` module and match."""
    x = _sig()[0]
    p = tmp_path / "w.wav"
    write_wav(p, x, 22050, bits=16)
    with wave.open(str(p)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (
            22050, 1, 2,
        )
        raw = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_array_equal(
        raw, np.round(x.astype(np.float64) * 32767.0).astype(np.int16)
    )
    # and the reverse: a stdlib-written file reads back through us
    p2 = tmp_path / "w2.wav"
    with wave.open(str(p2), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(raw.tobytes())
    y, sr = read_wav(p2)
    assert sr == 22050
    np.testing.assert_allclose(y, raw.astype(np.float32) / 32768.0, atol=0)


@pytest.mark.skipif(not HAS_NATIVE, reason="native library unavailable")
@pytest.mark.parametrize("bits", [16, 24, 32])
def test_native_matches_numpy(tmp_path, bits):
    x = _sig(channels=2, seed=3)
    pn = tmp_path / "native.wav"
    pf = tmp_path / "numpy.wav"
    write_wav(pn, x, 44100, bits=bits, use_native=True)
    write_wav(pf, x, 44100, bits=bits, use_native=False)
    assert pn.read_bytes() == pf.read_bytes()  # byte-identical files
    yn, srn = read_wav(pn, use_native=True)
    yf, srf = read_wav(pn, use_native=False)
    assert srn == srf == 44100
    np.testing.assert_array_equal(yn, yf)  # bit-identical decodes


def test_clipping_on_write(tmp_path):
    p = tmp_path / "c.wav"
    write_wav(p, np.asarray([2.0, -2.0, 0.0], np.float32), 8000, bits=16)
    y, _ = read_wav(p)
    np.testing.assert_allclose(y, [32767 / 32768, -32767 / 32768, 0.0])


def test_extensible_format_reads(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE headers resolve through the subformat tag."""
    x = np.round(_sig()[0].astype(np.float64) * 32767).astype("<i2")
    payload = x.tobytes()
    # base(16) + cbSize/validBits/channelMask(8) + GUID(16, first 2 = tag)
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
        + struct.pack("<HHI", 22, 16, 0)
        + struct.pack("<H", 1)
        + b"\x00" * 14
    )
    buf = io.BytesIO()
    buf.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE")
    buf.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    buf.write(b"data" + struct.pack("<I", len(payload)) + payload)
    p = tmp_path / "ext.wav"
    p.write_bytes(buf.getvalue())
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0)


def test_skips_extra_chunks(tmp_path):
    """LIST/INFO chunks (with odd sizes needing pad bytes) are skipped."""
    x = np.asarray([0.25, -0.25], np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, x, 8000, bits=16)
    raw = p.read_bytes()
    # splice an odd-sized LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    p2 = tmp_path / "x2.wav"
    p2.write_bytes(patched)
    y, sr = read_wav(p2)
    np.testing.assert_allclose(y, [0.25, -0.25], atol=2 ** -15)
    if HAS_NATIVE:
        yn, _ = read_wav(p2, use_native=True)
        np.testing.assert_array_equal(yn, y)


@pytest.mark.parametrize(
    "blob,err",
    [
        (b"RIFX" + b"\x00" * 20, "RIFF"),
        (b"RIFF" + struct.pack("<I", 4) + b"AIFF", "RIFF"),
        (b"RIFF" + struct.pack("<I", 40) + b"WAVE"
         + b"fmt " + struct.pack("<I", 16)
         + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
         + b"data" + struct.pack("<I", 0), "bit depth"),
    ],
)
def test_malformed_raises(tmp_path, blob, err):
    p = tmp_path / "bad.wav"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match=err):
        read_wav(p, use_native=False)


def test_truncated_final_data_chunk_tolerated(tmp_path):
    p = tmp_path / "t.wav"
    write_wav(p, np.zeros(100, np.float32), 8000, bits=16)
    raw = p.read_bytes()
    p.write_bytes(raw[:-50])  # chop mid-data
    y, _ = read_wav(p, use_native=False)
    assert y.shape == (75,)
    if HAS_NATIVE:
        yn, _ = read_wav(p, use_native=True)
        np.testing.assert_array_equal(yn, y)


def test_write_validation(tmp_path):
    with pytest.raises(ValueError, match="bits"):
        write_wav(tmp_path / "a.wav", np.zeros(4), 8000, bits=8)
    with pytest.raises(ValueError, match="sample rate"):
        write_wav(tmp_path / "a.wav", np.zeros(4), 0)
    with pytest.raises(ValueError, match="1-D or 2-D"):
        write_wav(tmp_path / "a.wav", np.zeros((1, 2, 3)), 8000)


def test_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        read_wav(tmp_path / "nope.wav")


def test_riff_size_counts_pad_byte(tmp_path):
    """Odd payloads: file length must equal 8 + the declared RIFF size."""
    for use_native in ([False, True] if HAS_NATIVE else [False]):
        p = tmp_path / f"odd{use_native}.wav"
        write_wav(p, np.zeros(3, np.float32), 8000, bits=24,
                  use_native=use_native)  # 9-byte payload + pad
        raw = p.read_bytes()
        (declared,) = struct.unpack_from("<I", raw, 4)
        assert len(raw) == 8 + declared


def test_nan_inf_encode_deterministically(tmp_path):
    """NaN -> 0, +/-inf -> full scale, identical on both codecs."""
    x = np.asarray([np.nan, np.inf, -np.inf, 0.5], np.float32)
    pf = tmp_path / "nan_numpy.wav"
    write_wav(pf, x, 8000, bits=16, use_native=False)
    y, _ = read_wav(pf, use_native=False)
    np.testing.assert_allclose(
        y, [0.0, 32767 / 32768, -32767 / 32768, 0.5], atol=2 ** -14
    )
    if HAS_NATIVE:
        pn = tmp_path / "nan_native.wav"
        write_wav(pn, x, 8000, bits=16, use_native=True)
        assert pn.read_bytes() == pf.read_bytes()


def test_two_data_chunks_info_matches_read(tmp_path):
    """wav_info and read_wav agree on the FIRST data chunk."""
    p = tmp_path / "a.wav"
    write_wav(p, np.zeros(10, np.float32), 8000, bits=16)
    raw = p.read_bytes()
    extra = b"data" + struct.pack("<I", 4) + b"\x00" * 4  # bogus 2nd chunk
    patched = raw + extra
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    p2 = tmp_path / "b.wav"
    p2.write_bytes(patched)
    assert wav_info(p2)["frames"] == 10
    y, _ = read_wav(p2, use_native=False)
    assert y.shape == (10,)
    if HAS_NATIVE:
        yn, _ = read_wav(p2, use_native=True)
        assert yn.shape == (10,)


def test_no_data_chunk_raises(tmp_path):
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 24) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    )
    p = tmp_path / "nodata.wav"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="data"):
        wav_info(p)
    with pytest.raises(ValueError, match="data"):
        read_wav(p, use_native=False)


@pytest.mark.skipif(not HAS_NATIVE, reason="native library unavailable")
def test_use_native_true_bad_file_raises_valueerror(tmp_path):
    """A format problem surfaces as the NumPy parser's ValueError, not a
    misleading 'codec unavailable' RuntimeError."""
    blob = (
        b"RIFF" + struct.pack("<I", 40) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)  # 8-bit: rejected
        + b"data" + struct.pack("<I", 0)
    )
    p = tmp_path / "8bit.wav"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="bit depth"):
        read_wav(p, use_native=True)


class TestLoad:
    def test_load_roundtrip(self, tmp_path):
        from mlx_audio_primitives_tpu.utils import load, write_wav

        rng = np.random.default_rng(0)
        y = (0.5 * rng.standard_normal(22050)).astype(np.float32)
        p = tmp_path / "a.wav"
        write_wav(p, y, 22050, bits=32)
        out, sr = load(p, sr=None)
        assert sr == 22050
        np.testing.assert_array_equal(out, y)

    def test_load_resamples(self, tmp_path):
        from mlx_audio_primitives_tpu.utils import load, write_wav

        t = np.arange(44100) / 44100
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        p = tmp_path / "b.wav"
        write_wav(p, y, 44100, bits=32)
        out, sr = load(p, sr=22050)
        assert sr == 22050
        assert abs(out.shape[-1] - 22050) <= 1
        # the tone survives resampling at the same frequency
        zc = np.sum(np.abs(np.diff(np.signbit(out[100:-100]))))
        np.testing.assert_allclose(zc / 2 / (len(out[100:-100]) / 22050),
                                   440.0, rtol=0.01)

    def test_load_mono_mixdown(self, tmp_path):
        from mlx_audio_primitives_tpu.utils import load, write_wav

        rng = np.random.default_rng(1)
        st = (0.25 * rng.standard_normal((2, 1000))).astype(np.float32)
        p = tmp_path / "c.wav"
        write_wav(p, st, 22050, bits=32)
        mono, _ = load(p, sr=None)
        np.testing.assert_allclose(mono, st.mean(axis=0), atol=1e-7)
        stereo, _ = load(p, sr=None, mono=False)
        assert stereo.shape == (2, 1000)

    def test_offset_duration(self, tmp_path):
        from mlx_audio_primitives_tpu.utils import load, write_wav

        y = np.arange(1000, dtype=np.float32) / 2000.0
        p = tmp_path / "d.wav"
        write_wav(p, y, 1000, bits=32)
        out, _ = load(p, sr=None, offset=0.25, duration=0.5)
        np.testing.assert_array_equal(out, y[250:750])
        with pytest.raises(ValueError):
            load(p, sr=None, offset=5.0)

    def test_get_duration_and_to_mono(self, tmp_path):
        from mlx_audio_primitives_tpu.utils import (
            get_duration,
            to_mono,
            write_wav,
        )

        y = np.zeros(4410, np.float32)
        p = tmp_path / "e.wav"
        write_wav(p, y, 22050)
        np.testing.assert_allclose(get_duration(path=p), 0.2)
        np.testing.assert_allclose(get_duration(y=y, sr=22050), 0.2)
        assert to_mono(np.ones((2, 5), np.float32)).shape == (5,)
        with pytest.raises(ValueError):
            get_duration()
