"""Multimodal (opaque binary) column plumbing (north-star extension).

Treats image/audio/video payloads as ``binary`` columns with typed
metadata, processed through Arrow-batched ``mapInPandas`` — the real
Spark-side plumbing (schema, partitioning, batch shape) for a decode /
feature-extract stage.

Image decode is REAL for PPM (P6), BMP (24-bit uncompressed), PNG
(8-bit truecolor RGB/RGBA, stdlib-zlib inflate + spec defilter), and
baseline JPEG (pure-numpy ITU T.81 codec in ``functions/jpeg.py``) —
``decode_image`` / ``decode_png`` / ``encode_ppm`` / ``encode_bmp`` /
``encode_png`` / ``resize_nearest``: exact (or PSNR-tested lossy)
roundtrips, nearest-neighbor resize, no PIL/opencv needed.  Audio
decode is REAL for RIFF/WAVE PCM (8/16-bit, any channel count) —
``decode_wav`` / ``encode_wav`` / ``audio_features``,
conformance-tested against the stdlib ``wave`` writer.  Video decode
is REAL for YUV4MPEG2 (C420/C444) — ``decode_y4m`` / ``encode_y4m``;
``frame_sample_stub`` samples real y4m frames.  MP3/MP4 METADATA
extraction is REAL (``parse_mp3_metadata`` walks MPEG audio frame
headers, ``parse_mp4_metadata`` walks ISO-BMFF boxes — the typed
metadata a corpus-stats pass needs); only their full sample decode
stays gated behind ``fake=True`` / NotImplementedError — that
genuinely requires external codec libraries not in this environment.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def binary_metadata(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Extract (id, n_bytes, sha256-hex digest) from a binary column via
    mapInPandas.  Arrow carries the bytes to Python in batches; output
    schema is fixed and narrow so downstream stays columnar."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "digest": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(extract, schema=f"{id_col} bigint, n_bytes int, digest string")


# --- pure-numpy image codecs (PPM P6 and 24-bit BMP) ---------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a PPM (P6, maxval 255), uncompressed 24-bit BMP, 8-bit
    truecolor PNG, or baseline JPEG payload to an (h, w, 3) uint8 RGB
    array (PNG alpha is dropped).  Pure numpy + stdlib zlib (JPEG via
    the T.81 baseline codec in ``functions/jpeg.py``); raises
    ValueError for any other format (the caller falls back to the stub
    gate)."""
    if payload[:8] == _PNG_SIG:
        arr = decode_png(payload)
        return arr[:, :, :3].copy()
    if payload[:2] == b"\xff\xd8":
        from hadoop_3_3_6_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:2] == b"P6":
        # header: P6 <ws> width <ws> height <ws> maxval <single ws>, then raw RGB
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                while payload[pos : pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"PPM maxval {maxval} unsupported (only 8-bit)")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return arr.reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        data_offset, = struct.unpack_from("<I", payload, 10)
        header_size, = struct.unpack_from("<I", payload, 14)
        if header_size < 40:
            raise ValueError("BMP core-header variant unsupported")
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression, = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0:
            raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported (24-bit uncompressed only)")
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=data_offset)
        rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    raise ValueError("not a PPM(P6)/BMP(24) payload")


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a bottom-up 24-bit BMP."""
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    pixel_bytes = padded.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + pixel_bytes


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize to (height, width, 3) — pure numpy
    fancy-indexing, deterministic (pixel centers, round-half-down)."""
    h, w, _ = arr.shape
    rows = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(np.int64)
    cols = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(np.int64)
    return arr[rows][:, cols]


# --- PNG codec (stdlib zlib inflate + numpy defilter) --------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor PNG (RGB or RGBA, non-interlaced) to
    an (h, w, 3|4) uint8 array.  Needs only stdlib zlib (IDAT inflate)
    plus the five spec filters (None/Sub/Up/Average/Paeth) undone
    per scanline; raises ValueError for other PNG flavors.  Palette /
    16-bit / interlaced variants and JPEG remain codec-library gates."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"PNG {ctype.decode('ascii', 'replace')} chunk truncated")
        data = payload[pos + 8 : pos + 8 + length]
        # 5.3: every chunk carries a CRC-32 over type+data; verify the
        # CRITICAL chunks (bit 5 of the first type byte clear) — a
        # flipped bit in IHDR/IDAT must fail loudly, not decode to
        # garbage (ancillary chunks are skipped unread, so their CRCs
        # are not load-bearing here)
        if not (ctype[0] & 0x20):
            (crc_stored,) = struct.unpack_from(">I", payload, pos + 8 + length)
            if zlib.crc32(payload[pos + 4 : pos + 8 + length]) & 0xFFFFFFFF != crc_stored:
                raise ValueError(f"PNG {ctype.decode('ascii', 'replace')} chunk CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            meta = (w, h, depth, color, interlace)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, interlace = meta
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise ValueError(f"PNG depth={depth} color={color} interlace={interlace} unsupported")
    bpp = 3 if color == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, row = line[0], np.frombuffer(line, dtype=np.uint8, offset=1).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            row += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            cur = row.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(pv[i])
                if ftype == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (cur[i] + (a + b) // 2) & 0xFF
                else:
                    c = int(pv[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) & 0xFF
            row = cur.astype(np.uint8)
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = row
        prev = out[y]
    return out.reshape(h, w, bpp)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a non-interlaced 8-bit PNG
    (filter 0 scanlines, one zlib IDAT)."""
    import zlib

    h, w, ch = arr.shape
    color = 2 if ch == 3 else 6
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --- pure-numpy audio codec (RIFF/WAVE, PCM 8/16-bit) --------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload (8-bit unsigned or 16-bit signed,
    any channel count) to ((n_samples, n_channels) int16 array,
    sample_rate).  Pure struct/numpy chunk walk — no codec library;
    raises ValueError for non-WAV or compressed formats."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fmt_body, data = 12, None, b"", None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are padded to even size
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format == 0xFFFE and len(fmt_body) >= 40:
        # WAVE_FORMAT_EXTENSIBLE (the public multichannel/unambiguous
        # form): the real format is the SubFormat GUID at offset 24 —
        # KSDATAFORMAT_SUBTYPE_PCM begins 01 00 00 00; the container
        # bits (already parsed) drive the sample layout even when
        # wValidBitsPerSample is smaller
        if fmt_body[24:28] == b"\x01\x00\x00\x00":
            audio_format = 1
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only PCM 8/16-bit supported (format={audio_format}, bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(np.int16)
    else:
        # 8-bit WAV is unsigned with 128 bias
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
    n = (len(samples) // n_channels) * n_channels
    return samples[:n].reshape(-1, n_channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_samples, n_channels) int16 array as 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    n_channels = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, sample_rate * n_channels * 2, n_channels * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", permissive: bool = False
) -> DataFrame:
    """Distributed audio feature extraction over WAV binary payloads:
    mapInPandas → (id, sample_rate, n_channels, n_samples, peak,
    zero_crossings).  All-integer outputs (peak = max |sample| of the
    first channel; zero crossings = strict sign changes), so a SQL
    oracle can reproduce them exactly when the signal is deterministic.
    The batch shape is what a real audio embedder (spectrogram/codec
    frontend) would use — only the per-payload function changes.

    ``permissive=True`` is the SkipBadRecords analogue for media
    (reference: MRC/mapred/SkipBadRecords.java:1): undecodable payloads
    yield a row with NULL features and ``decode_ok = false`` instead of
    failing the task — at crawl scale some corrupt payloads are a
    certainty, and dropping the whole task to one bad record is not an
    option.  Default (strict) raises, keeping the exact-oracle
    contract."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = (id_col, "sample_rate", "n_channels", "n_samples", "peak", "zero_crossings", "decode_ok")
            rows = {k: [] for k in cols}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate = decode_wav(bytes(b))
                except ValueError:
                    if not permissive:
                        raise
                    for k, v in zip(cols, (i, None, None, None, None, None, False)):
                        rows[k].append(v)
                    continue
                mono = samples[:, 0].astype(np.int64)
                vals = (
                    i,
                    rate,
                    samples.shape[1],
                    samples.shape[0],
                    int(np.abs(mono).max(initial=0)),
                    int(np.sum(mono[1:] * mono[:-1] < 0)),
                    True,
                )
                for k, v in zip(cols, vals):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    out = df.mapInPandas(
        extract,
        schema=(
            f"{id_col} bigint, sample_rate int, n_channels int, n_samples int, "
            f"peak int, zero_crossings int, decode_ok boolean"
        ),
    )
    return out if permissive else out.drop("decode_ok")


# --- pure-numpy video codec (YUV4MPEG2 / y4m, C420 + C444) ---------------


def decode_y4m(payload: bytes) -> tuple[dict, list[bytes]]:
    """Decode a YUV4MPEG2 stream (the classic uncompressed video
    container: text header + raw planar frames) to (meta, frames).
    ``meta`` has width/height/fps_num/fps_den/colorspace; each frame is
    the raw planar payload (Y then U then V).  Supports C420* (1.5
    bytes/px, the default) and C444 (3 bytes/px).  Pure byte walk —
    no ffmpeg; raises ValueError otherwise."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    meta = {"width": 0, "height": 0, "fps_num": 25, "fps_den": 1, "colorspace": "420"}
    for tok in payload[9:nl].split():
        tag, val = tok[:1], tok[1:].decode()
        if tag == b"W":
            meta["width"] = int(val)
        elif tag == b"H":
            meta["height"] = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            meta["fps_num"], meta["fps_den"] = int(num), int(den)
        elif tag == b"C":
            meta["colorspace"] = val
    w, h = meta["width"], meta["height"]
    if w <= 0 or h <= 0:
        raise ValueError("y4m missing W/H")
    if meta["colorspace"].startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif meta["colorspace"].startswith("444"):
        frame_bytes = w * h * 3
    else:
        raise ValueError(f"y4m colorspace {meta['colorspace']} unsupported (420/444 only)")
    frames, pos = [], nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed y4m FRAME marker")
        fnl = payload.index(b"\n", pos)
        frame = payload[fnl + 1 : fnl + 1 + frame_bytes]
        if len(frame) < frame_bytes:
            raise ValueError(
                f"y4m truncated frame: {len(frame)} of {frame_bytes} bytes"
            )
        frames.append(frame)
        pos = fnl + 1 + frame_bytes
    return meta, frames


def encode_y4m(meta: dict, frames: list[bytes]) -> bytes:
    """Encode raw planar frames as a YUV4MPEG2 stream."""
    header = (
        f"YUV4MPEG2 W{meta['width']} H{meta['height']} "
        f"F{meta.get('fps_num', 25)}:{meta.get('fps_den', 1)} "
        f"C{meta.get('colorspace', '420')}\n"
    ).encode()
    return header + b"".join(b"FRAME\n" + f for f in frames)


def y4m_frame_luma(meta: dict, frame: bytes) -> np.ndarray:
    """The (h, w) uint8 Y (luma) plane of one raw y4m frame."""
    w, h = meta["width"], meta["height"]
    return np.frombuffer(frame, dtype=np.uint8, count=w * h).reshape(h, w)


def decode_stub(payload: bytes, modality: str = "image", fake: bool = False) -> dict:
    """Decode one payload to typed metadata + an 8-dim feature.

    Real path: PPM/BMP/PNG/baseline-JPEG images decode via
    ``decode_image`` — the feature is [per-channel mean (3),
    per-channel max (3), normalized aspect terms (2)].  Remaining
    formats (MP3/MP4 audio/video) require codec libraries not in this
    environment: ``fake=True`` substitutes a digest-derived
    pseudo-feature with the same contract, else NotImplementedError."""
    if modality == "image":
        try:
            arr = decode_image(bytes(payload))
        except ValueError:
            arr = None
        if arr is not None:
            h, w, _ = arr.shape
            means = arr.reshape(-1, 3).mean(axis=0) / 255.0
            maxes = arr.reshape(-1, 3).max(axis=0) / 255.0
            return {
                "width": w,
                "height": h,
                "channels": 3,
                "feature": [*means.tolist(), *maxes.tolist(), w / (w + h), h / (w + h)],
            }
    if not fake:
        raise NotImplementedError(
            f"media decode for modality={modality!r} requires external libraries not present in this environment"
        )
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 1 + digest[0],
        "height": 1 + digest[1],
        "channels": 3,
        "feature": [b / 255.0 for b in digest[:8]],
    }


def resize_stub(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize one image payload.  Real path: PPM/BMP/PNG/JPEG decode →
    nearest-neighbor resize → re-encode in the same container format.
    Other formats: ``fake=True`` returns a deterministic digest-derived
    pseudo-thumbnail (same bytes-in/bytes-out contract), else
    NotImplementedError."""
    payload = bytes(payload)
    try:
        arr = decode_image(payload)
    except ValueError:
        arr = None
    if arr is not None:
        small = resize_nearest(arr, width, height)
        if payload[:8] == _PNG_SIG:
            return encode_png(small)
        if payload[:2] == b"\xff\xd8":
            from hadoop_3_3_6_spark.functions.jpeg import encode_jpeg

            return encode_jpeg(small)
        return encode_ppm(small) if payload[:2] == b"P6" else encode_bmp(small)
    if not fake:
        raise NotImplementedError(
            "resize of non-PPM/BMP/PNG/JPEG images requires PIL/opencv, not present in this environment"
        )
    digest = hashlib.sha256(payload).digest()
    need = width * height
    return (digest * (need // len(digest) + 1))[:need]


def frame_sample_stub(payload: bytes, every_n: int = 10, fake: bool = False) -> list[bytes]:
    """Video frame sampling.  Real path: YUV4MPEG2 streams decode via
    ``decode_y4m`` and every n-th frame is re-encoded as a standalone
    single-frame y4m (self-describing blob).  Compressed containers
    (MP4/MKV) require ffmpeg: ``fake=True`` treats the payload as a
    byte stream of 16-byte 'frames' with the same output contract,
    else NotImplementedError."""
    payload = bytes(payload)
    try:
        meta, frames = decode_y4m(payload)
    except ValueError:
        meta = None
    if meta is not None:
        return [encode_y4m(meta, [f]) for f in frames[::every_n]]
    if not fake:
        raise NotImplementedError("compressed video decode requires ffmpeg, not present in this environment")
    frames = [payload[i : i + 16] for i in range(0, len(payload), 16)]
    return frames[::every_n]


def resize_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Distributed resize stage: mapInPandas over binary payloads →
    (id, thumbnail binary, n_bytes).  Arrow carries bytes both ways."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf[payload_col].map(lambda b: resize_stub(bytes(b), width, height, fake=fake))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "thumbnail": thumbs, "n_bytes": thumbs.map(len).astype("int32")}
            )

    return df.mapInPandas(run, schema=f"{id_col} bigint, thumbnail binary, n_bytes int")


def sample_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Distributed frame sampling: one output row per kept frame
    (id, frame_idx, frame binary) — the explode-shaped mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                for j, fr in enumerate(frame_sample_stub(bytes(b), every_n, fake=fake)):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=f"{id_col} bigint, frame_idx int, frame binary")


def decode_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Decode/feature-extract stage over binary payloads: mapInPandas
    with an 8-dim feature vector output — the batch shape a real
    image embedder would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(lambda b: decode_stub(bytes(b), fake=fake))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": feats.map(lambda d: d["width"]).astype("int32"),
                    "height": feats.map(lambda d: d["height"]).astype("int32"),
                    "feature": feats.map(lambda d: d["feature"]),
                }
            )

    return df.mapInPandas(extract, schema=f"{id_col} bigint, width int, height int, feature array<double>")


# --- lossy-container METADATA parsers (MP3 frame headers, MP4 boxes) ------

_MP3_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def parse_mp3_metadata(payload: bytes) -> dict:
    """Walk MPEG audio (Layer III) frame headers — the REAL metadata
    path for MP3 corpora (public ISO/IEC 11172-3 header layout): skips
    a leading ID3v2 tag (synchsafe size), then reads each 4-byte frame
    header for version/bitrate/samplerate/channel mode and steps by
    the computed frame length.  Full sample decode (hybrid filterbank)
    stays gated; a corpus-stats pass only needs this.

    Returns {sample_rate, channels, n_frames, duration_ms,
    bitrate_kbps (average), vbr}.  Raises ValueError if no valid frame
    sync is found."""
    data = bytes(payload)
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        pos = 10 + size
    n_frames = 0
    total_samples = 0
    sample_rate = None
    channels = None
    bitrates = []
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing junk / ID3v1 tag after last frame
            pos += 1
            continue
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3  # 1 = Layer III
        if version == 1 or layer != 1:
            if n_frames:
                break
            pos += 1
            continue
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            if n_frames:
                break
            pos += 1
            continue
        padding = (b2 >> 1) & 0x1
        mode = (b3 >> 6) & 0x3
        rate = _MP3_RATES[version][sr_idx]
        kbps = (_MP3_BITRATES_V1_L3 if version == 3 else _MP3_BITRATES_V2_L3)[br_idx]
        spf = 1152 if version == 3 else 576  # samples per L3 frame
        frame_len = (spf // 8) * kbps * 1000 // rate + padding
        if frame_len <= 4:
            break
        n_frames += 1
        total_samples += spf
        sample_rate = rate
        channels = 1 if mode == 3 else 2
        bitrates.append(kbps)
        pos += frame_len
    if not n_frames:
        raise ValueError("no MPEG audio frame sync found")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": int(round(total_samples * 1000.0 / sample_rate)),
        "bitrate_kbps": int(round(sum(bitrates) / len(bitrates))),
        "vbr": len(set(bitrates)) > 1,
    }


def parse_mp4_metadata(payload: bytes) -> dict:
    """Walk the ISO-BMFF (MP4/MOV) box tree — the REAL metadata path
    for MP4 corpora (public ISO/IEC 14496-12 box layout): ftyp brand,
    mvhd timescale/duration, per-trak handler type + tkhd dimensions.
    Full sample decode (H.264 et al) stays gated; corpus stats,
    routing and dedup only need this.

    Returns {brand, duration_ms, tracks: [{type, width, height}]}.
    Raises ValueError on a non-BMFF payload."""
    data = bytes(payload)

    def boxes(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", data, pos)
            btype = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                (size,) = struct.unpack_from(">Q", data, pos + 8)
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("malformed BMFF box")
            yield btype, pos + hdr, pos + size
            pos += size

    top = list(boxes(0, len(data)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no ftyp)")
    brand = data[top[0][1] : top[0][1] + 4].decode("ascii", "replace")
    out = {"brand": brand, "duration_ms": 0, "tracks": []}
    for btype, b0, b1 in top:
        if btype != b"moov":
            continue
        for mtype, m0, m1 in boxes(b0, b1):
            if mtype == b"mvhd":
                ver = data[m0]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, m0 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, m0 + 12)
                out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
            elif mtype == b"trak":
                track = {"type": "", "width": 0, "height": 0}
                for ttype, t0, t1 in boxes(m0, m1):
                    if ttype == b"tkhd":
                        # width/height sit in the last 8 bytes of BOTH
                        # tkhd versions (v0 and v1 differ only in the
                        # leading time/id field widths)
                        off = t1 - 8  # 16.16 fixed
                        w_fx, h_fx = struct.unpack_from(">II", data, off)
                        track["width"] = w_fx >> 16
                        track["height"] = h_fx >> 16
                    elif ttype == b"mdia":
                        for dtype, d0, d1 in boxes(t0, t1):
                            if dtype == b"hdlr":
                                track["type"] = data[d0 + 8 : d0 + 12].decode("ascii", "replace")
                out["tracks"].append(track)
    return out


def media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", fmt_col: str | None = None
) -> DataFrame:
    """Distributed lossy-container metadata scan: mapInPandas over
    binary payloads, dispatching on magic bytes to the MP3 frame-header
    walk or the MP4 box walk (images/WAV route through their full
    decoders elsewhere).  Unparseable payloads yield ok=false rows
    (SkipBadRecords stance), never task failures."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("fmt", "ok", "duration_ms", "sample_rate", "channels", "width", "height", "detail")}
            for b in pdf[payload_col]:
                b = bytes(b)
                try:
                    if b[4:8] == b"ftyp":
                        m = parse_mp4_metadata(b)
                        v = next((t for t in m["tracks"] if t["type"] == "vide"), None)
                        rows["fmt"].append("mp4")
                        rows["ok"].append(True)
                        rows["duration_ms"].append(m["duration_ms"])
                        rows["sample_rate"].append(0)
                        rows["channels"].append(0)
                        rows["width"].append(v["width"] if v else 0)
                        rows["height"].append(v["height"] if v else 0)
                        rows["detail"].append(m["brand"])
                    else:
                        m = parse_mp3_metadata(b)
                        rows["fmt"].append("mp3")
                        rows["ok"].append(True)
                        rows["duration_ms"].append(m["duration_ms"])
                        rows["sample_rate"].append(m["sample_rate"])
                        rows["channels"].append(m["channels"])
                        rows["width"].append(0)
                        rows["height"].append(0)
                        rows["detail"].append(f"{m['bitrate_kbps']}kbps{' vbr' if m['vbr'] else ''}")
                except (ValueError, IndexError, struct.error):
                    for k, v in (("fmt", "unknown"), ("ok", False), ("duration_ms", 0),
                                 ("sample_rate", 0), ("channels", 0), ("width", 0),
                                 ("height", 0), ("detail", "")):
                        rows[k].append(v)
            yield pd.DataFrame({id_col: pdf[id_col], **rows})

    return df.mapInPandas(
        extract,
        schema=(
            f"{id_col} bigint, fmt string, ok boolean, duration_ms bigint, "
            "sample_rate int, channels int, width int, height int, detail string"
        ),
    )


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash (dHash — the classic perceptual image
    fingerprint: Krawetz, "Kind of Like That", 2013): nearest-resize
    to a 9×8 grid (the deterministic resize_nearest), integer luma
    (299·R + 587·G + 114·B) // 1000, then one bit per horizontal
    neighbor comparison (luma[y,x] > luma[y,x+1]), row-major, first
    comparison in bit 63.  All-integer arithmetic end-to-end, so the
    hash is bit-reproducible by any independent replica.  Returned as
    the SIGNED int64 two's-complement view (Spark BIGINT)."""
    small = resize_nearest(arr, 9, 8)
    luma = (
        small[..., 0].astype(np.int64) * 299
        + small[..., 1].astype(np.int64) * 587
        + small[..., 2].astype(np.int64) * 114
    ) // 1000
    h = 0
    for bit in (luma[:, :-1] > luma[:, 1:]).flatten():
        h = (h << 1) | int(bit)
    return h - (1 << 64) if h >= (1 << 63) else h


def image_dhash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode + perceptual-hash stage: Arrow-batched mapInPandas over
    binary image payloads (PPM/BMP/PNG/JPEG via decode_image), one
    64-bit dHash per image.  Python IS the semantics here (the codec
    work), so the batch shape is the multimodal contract: payloads
    cross the Arrow boundary once, hashes come back as one BIGINT
    column — at 100 TB this is a pure map stage over the image store
    with an 8-byte-per-image output."""
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(i)
                hashes.append(dhash64(decode_image(bytes(payload))))
            yield pd.DataFrame(
                {id_col: ids, "dhash": pd.array(hashes, dtype="int64")}
            )

    return df.mapInPandas(extract, schema=f"{id_col} bigint, dhash bigint")


def phash_near_duplicates(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Banded Hamming near-duplicate detection over perceptual hashes
    — the minhash-LSH discipline applied to the 64-bit dHash space: a
    pair is a CANDIDATE iff any of its ``bands`` (64/bands)-bit
    segments match exactly (guaranteed to catch every pair with
    Hamming distance < bands; probabilistically more), then verified
    with the exact popcount of the XOR.  The DEFAULT max_hamming=3
    satisfies the guarantee (max_hamming < bands, so every in-threshold
    pair is found); callers raising max_hamming to >= bands get the
    probabilistic recall regime and should say so — the registered
    query runs at 4 deliberately, with the boundary pinned in tests.  Returns one row per input
    hash: (id, hash, dup_with = lowest-id near-duplicate or NULL,
    keep) — the semdedup keep-lowest-representative rule.

    Scale shape: the band explode is ×bands (8-byte rows); candidates
    come from an EQUI self-join on (band_idx, band_val) — pair work is
    sum over buckets of |bucket|², never corpus²; the Hamming verify
    is two integer ops per candidate.  Everything is engine-exact
    (integer hashes, exact popcount), so the whole operator carries a
    closed-form oracle."""
    from pyspark.sql import functions as F

    b = _hash_bands(hashes, id_col, hash_col, bands)
    a, c = b.alias("a"), b.alias("b")
    pairs = (
        a.join(
            c,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("_ha"),
            F.col(f"b.{hash_col}").alias("_hb"),
        )
        .distinct()
        .filter(F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= max_hamming)
    )
    dups = pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_with"))
    return (
        hashes.join(dups, hashes[id_col] == dups["id_b"], "left")
        .select(
            F.col(id_col),
            F.col(hash_col),
            F.col("dup_with"),
            F.col("dup_with").isNull().alias("keep"),
        )
    )


def _hash_bands(
    hashes: DataFrame, id_col: str, hash_col: str, bands: int
) -> DataFrame:
    """(id, hash) -> one row per (id, hash, band_idx, 16-bit band
    value) — the banding projection shared by the batch dedup and the
    incremental index path (unsigned shifts, so sign-bit hashes band
    correctly).  ``bands`` must divide 64: a non-divisor would
    silently drop the top ``64 mod bands`` bits from banding and
    degrade candidate recall with no error (round-9 ADVICE fix,
    mirroring the minhash_bands divisor guard)."""
    from pyspark.sql import functions as F

    if bands < 1 or 64 % bands != 0:
        raise ValueError(
            f"bands must be a positive divisor of 64 (1, 2, 4, 8, 16, 32, 64); "
            f"got {bands} — a non-divisor silently ignores the top "
            f"{64 % bands if bands >= 1 else 64} hash bits in banding"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    return hashes.select(
        F.col(id_col),
        F.col(hash_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(hash_col), k * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for k in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )


def build_phash_index(
    df: DataFrame,
    path: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    bands: int = 4,
) -> None:
    """Persist a corpus perceptual-hash index: decode + dHash ONCE,
    store the banded rows (id, dhash, band_idx, band_val) repartitioned
    by (band_idx, band_val) so future batch joins co-locate — the
    build_minhash_index contract for the image tier."""
    _hash_bands(image_dhash(df, payload_col, id_col), id_col, "dhash", bands).repartition(
        "band_idx", "band_val"
    ).write.mode("overwrite").parquet(path)


def phash_dedup_incremental(
    new_hashes: DataFrame,
    index_bands: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Incremental image near-dedup: match a NEW batch of perceptual
    hashes against an existing corpus band index (live from
    ``_hash_bands`` or persisted by ``build_phash_index``).  Returns
    distinct verified (new_id, corpus_id, hamming) pairs; new images
    absent from the result are novel.  The batch side BROADCASTS (a
    crawl increment is small next to the history), so the only data
    movement is the increment — dedup a new batch against 100 TB of
    image history at batch cost, never corpus cost (the
    dedup_against_index contract for the image tier)."""
    from pyspark.sql import functions as F

    batch = _hash_bands(new_hashes, id_col, hash_col, bands)
    a, b = batch.alias("a"), index_bands.alias("b")
    return (
        b.join(
            F.broadcast(a),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col(f"a.{id_col}") != F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("new_id"),
            F.col(f"b.{id_col}").alias("corpus_id"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
