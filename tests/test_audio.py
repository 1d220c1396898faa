"""WAV (RIFF/PCM) codec conformance and distributed audio features.

The decoder must interoperate with files produced by the stdlib
``wave`` writer (an independent implementation of the public WAV spec),
not merely roundtrip its own output."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from hadoop_3_3_6_spark.functions.multimodal import audio_features, decode_wav, encode_wav


def _stdlib_wav(samples: np.ndarray, rate: int, sampwidth: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1] if samples.ndim == 2 else 1)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            w.writeframes((samples.astype(np.int16) // 256 + 128).astype(np.uint8).tobytes())
        else:
            w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_roundtrip_stereo():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=(501, 2), dtype=np.int64).astype(np.int16)
    decoded, rate = decode_wav(encode_wav(samples, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(decoded, samples)


def test_decode_stdlib_written():
    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=(257, 2), dtype=np.int64).astype(np.int16)
    decoded, rate = decode_wav(_stdlib_wav(samples, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(decoded, samples)


def test_stdlib_reads_our_encoding():
    samples = (np.sin(np.arange(300) / 10.0) * 20000).astype(np.int16).reshape(-1, 1)
    with wave.open(io.BytesIO(encode_wav(samples, 8000)), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()) == (1, 2, 8000, 300)
        np.testing.assert_array_equal(
            np.frombuffer(w.readframes(300), dtype="<i2"), samples.ravel()
        )


def test_decode_8bit_and_chunk_padding():
    # 8-bit mono with an ODD-size data chunk, followed by a trailing
    # chunk — exercises unsigned bias and even-padding in the walker.
    raw8 = np.array([0, 64, 128, 192, 255], dtype=np.uint8)  # odd count
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(raw8)) + raw8.tobytes() + b"\x00"  # pad
        + struct.pack("<4sI", b"LIST", 4) + b"INFO"
    )
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    decoded, rate = decode_wav(payload)
    assert rate == 8000
    np.testing.assert_array_equal(decoded.ravel(), (raw8.astype(np.int16) - 128) * 256)


def test_wav_roundtrip_property():
    """Property: encode→decode is the identity for arbitrary int16
    signals, channel counts, and rates (pure-python, no Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
        st.integers(1, 4),
        st.sampled_from([8000, 16000, 44100]),
    )
    def check(values, n_channels, rate):
        n = (len(values) // n_channels) * n_channels
        if n == 0:
            return
        samples = np.array(values[:n], dtype=np.int16).reshape(-1, n_channels)
        decoded, out_rate = decode_wav(encode_wav(samples, rate))
        assert out_rate == rate
        np.testing.assert_array_equal(decoded, samples)

    check()


def test_pii_redact_property(spark):
    """Property: k injected emails are all counted and fully scrubbed
    regardless of surrounding safe text (batched into ONE Spark job)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcdefg ", min_size=0, max_size=12)
    cases = []

    @settings(max_examples=30, deadline=None)
    @given(word, word, st.integers(0, 3))
    def gen(prefix, sep, k):
        emails = f" x{len(cases)}@ex.org ".join([""] * (k + 1)) if k else ""
        cases.append((len(cases), f"{prefix} {emails} {sep}".strip(), k))

    gen()
    from hadoop_3_3_6_spark.functions.text import pii_redact

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in pii_redact(df, "text", "doc_id").collect()}
    for i, _, k in cases:
        assert rows[i].n_email == k, (i, k, rows[i])
        assert "@" not in rows[i].clean_text or k == 0


def test_audio_features_permissive_skips_bad_records(spark):
    """SkipBadRecords analogue: corrupt payloads become decode_ok=false
    rows in permissive mode and raise in strict mode."""
    import pytest
    from pyspark.errors import PythonException

    good = encode_wav(np.array([7, -7, 7], dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"not a wav at all"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in audio_features(df, "payload", "doc_id", permissive=True).collect()}
    assert rows[0].decode_ok and rows[0].peak == 7
    assert rows[1].decode_ok is False and rows[1].sample_rate is None

    with pytest.raises(PythonException, match="not a RIFF"):
        audio_features(df, "payload", "doc_id").collect()


def test_audio_features_distributed(spark):
    sigs = {
        0: np.array([100, 100, -100, -100, 100], dtype=np.int16),  # 2 crossings
        1: np.array([5, -5, 5, -5], dtype=np.int16),  # 3 crossings
        2: np.zeros(10, dtype=np.int16),  # no crossings, peak 0
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_wav(s, 8000))) for i, s in sigs.items()],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in audio_features(df, "payload", "doc_id").collect()}
    assert (rows[0].n_samples, rows[0].peak, rows[0].zero_crossings) == (5, 100, 2)
    assert (rows[1].n_samples, rows[1].peak, rows[1].zero_crossings) == (4, 5, 3)
    assert (rows[2].peak, rows[2].zero_crossings) == (0, 0)
    assert rows[0].sample_rate == 8000 and rows[0].n_channels == 1


def _mp3_frame(version=3, kbps_idx=9, sr_idx=0, padding=0, mode=0):
    """Hand-built MPEG-1 Layer III frame (header per ISO 11172-3):
    sync, version, layer-III, bitrate/samplerate indices, mode."""
    b1 = 0xE0 | (version << 3) | (1 << 1) | 1  # sync-low, version, layer III, no CRC
    b2 = (kbps_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = mode << 6
    from hadoop_3_3_6_spark.functions.multimodal import _MP3_BITRATES_V1_L3, _MP3_RATES

    kbps = _MP3_BITRATES_V1_L3[kbps_idx]
    rate = _MP3_RATES[version][sr_idx]
    length = 144 * kbps * 1000 // rate + padding
    return bytes([0xFF, b1, b2, b3]) + bytes(length - 4)


def test_mp3_metadata_frame_walk():
    """MP3 frame-header walk: ID3v2 skip, frame count, duration,
    average bitrate, VBR flag, channel mode."""
    from hadoop_3_3_6_spark.functions.multimodal import parse_mp3_metadata

    frames = _mp3_frame(kbps_idx=9) * 1 + _mp3_frame(kbps_idx=11) + _mp3_frame(kbps_idx=9, mode=3)
    id3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 17]) + bytes(17)  # synchsafe size 17
    meta = parse_mp3_metadata(id3 + frames)
    assert meta["n_frames"] == 3
    assert meta["sample_rate"] == 44100
    # 3 frames x 1152 samples at 44100 Hz
    assert meta["duration_ms"] == round(3 * 1152 * 1000 / 44100)
    assert meta["vbr"] is True  # 128/160/128 mix
    assert meta["channels"] == 1  # last frame mode 3 = mono

    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_mp3_metadata(b"\x00" * 64)


def test_mp4_metadata_box_walk():
    """ISO-BMFF box walk: ftyp brand, mvhd duration, video trak dims,
    handler types."""
    import struct

    from hadoop_3_3_6_spark.functions.multimodal import parse_mp4_metadata

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mvhd = box(b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", 1000, 5500) + bytes(80))
    tkhd = box(b"tkhd", bytes(4) + bytes(72) + struct.pack(">II", 640 << 16, 360 << 16))
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(14))
    trak_v = box(b"trak", tkhd + box(b"mdia", hdlr))
    hdlr_a = box(b"hdlr", bytes(8) + b"soun" + bytes(14))
    trak_a = box(b"trak", box(b"tkhd", bytes(4) + bytes(72) + struct.pack(">II", 0, 0)) + box(b"mdia", hdlr_a))
    payload = ftyp + box(b"moov", mvhd + trak_v + trak_a)

    meta = parse_mp4_metadata(payload)
    assert meta["brand"] == "isom"
    assert meta["duration_ms"] == 5500
    assert {t["type"] for t in meta["tracks"]} == {"vide", "soun"}
    vid = next(t for t in meta["tracks"] if t["type"] == "vide")
    assert (vid["width"], vid["height"]) == (640, 360)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_mp4_metadata(b"RIFF" + bytes(32))


def test_media_metadata_distributed_scan(spark):
    """The distributed lossy-container metadata stage: mp3 + mp4 +
    garbage payloads in one frame — typed rows out, ok=false for the
    unparseable one (SkipBadRecords stance)."""
    import struct

    from hadoop_3_3_6_spark.functions.multimodal import media_metadata

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mp4 = (
        box(b"ftyp", b"mp42" + bytes(4))
        + box(b"moov", box(b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", 600, 1200) + bytes(80)))
    )
    mp3 = _mp3_frame() * 5
    rows = [(1, mp3), (2, mp4), (3, b"not media at all")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary").repartition(2)
    got = {r.doc_id: r for r in media_metadata(df, "payload", "doc_id").collect()}
    assert got[1].fmt == "mp3" and got[1].ok and got[1].sample_rate == 44100
    assert got[2].fmt == "mp4" and got[2].ok and got[2].duration_ms == 2000
    assert got[3].ok is False and got[3].fmt == "unknown"


def test_wav_format_extensible_pcm():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping PCM — the standard
    multichannel/unambiguous fmt variant — must decode identically to
    the plain PCM form (round-11 conformance fix); a non-PCM SubFormat
    GUID stays rejected."""
    import struct

    import pytest

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=(200, 2), dtype=np.int64).astype(np.int16)
    data = samples.astype("<i2").tobytes()
    pcm_guid = b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"

    def wav_ext(guid: bytes) -> bytes:
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, 2, 44100, 44100 * 4, 4, 16, 22, 16, 0x3
        ) + guid
        return (
            struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
            + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
            + struct.pack("<4sI", b"data", len(data)) + data
        )

    decoded, rate = decode_wav(wav_ext(pcm_guid))
    assert rate == 44100
    assert np.array_equal(decoded, samples)
    ieee_float_guid = b"\x03" + pcm_guid[1:]
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(wav_ext(ieee_float_guid))
