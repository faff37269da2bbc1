"""Multimodal column operators (SURVEY §2.11): opaque binary payloads
with typed metadata, decoded/sampled by Arrow-batched Python.

This container ships no imaging/video libraries; modalities are
handled three ways, as the build contract requires:

- AUDIO is decoded for REAL: ``decode_wav_features`` parses RIFF/WAV
  PCM with the stdlib ``wave`` codec and extracts numpy DSP features
  (RMS / zero-crossing rate / dominant FFT frequency), pinned against
  analytic ground truth in tests.
- PNG IMAGES are decoded for REAL too: PNG is DEFLATE + per-scanline
  byte filters, both in the standard library — ``decode_png`` walks
  CRC-verified chunks, inflates with zlib and undoes all five filter
  types (pinned against an independent forward-filter implementation
  + analytic solid/gradient truth in tests).
- JPEG (DCT/huffman) and video remain the clearly-marked
  ``decode_image`` NotImplementedError seam where Pillow/ffmpeg plugs
  in; the ``*_fake`` paths keep that plumbing (binary schema, Arrow
  batch iteration, 1:N fan-out, partitioning) real and testable, with
  a DuckDB oracle over the stand-in arithmetic.

At 100 TB: payloads stay columnar-binary end to end (no base64, no
driver round-trip); frame sampling is a mapInPandas fan-out whose
output is re-partitionable by (doc_id) for downstream per-asset work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_image(payload: bytes) -> dict:
    """General image decode seam — intentionally unimplemented for
    formats needing a real imaging library (JPEG/WebP/...).  PNG has a
    REAL pure-stdlib decoder below (``decode_png``); a deployment with
    Pillow installs this one as:
        img = PIL.Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, ...}
    """
    raise NotImplementedError(
        "non-PNG image decoding requires an imaging library not present "
        "in this container; PNG decodes for real via decode_png, and the "
        "*_fake paths cover plumbing tests"
    )


def sample_frames_fake(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_size: int = 128,
    max_frames: int = 4,
    unit: str = "bytes",
) -> DataFrame:
    """'Video' frame sampling with a deterministic fake decoder: emit one
    row per frame_size-sized window (capped at max_frames), fingerprinted
    with md5.  Demonstrates the 1:N mapInPandas fan-out a real
    frame-sampler uses; swap the md5 for a codec call at the
    ``decode_image`` seam.

    ``unit='bytes'`` windows raw bytes (the real multimodal case);
    ``unit='chars'`` decodes the payload as UTF-8 and windows CHARACTERS
    (md5 of each slice's UTF-8 bytes) — the mode whose arithmetic a
    SQL oracle can replicate (md5/substr over VARCHAR), since engines'
    blob functions diverge on non-ASCII."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests, sizes = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if unit == "chars":
                    data = data.decode("utf-8")
                n_frames = min(max_frames, max(1, -(-len(data) // frame_size)))
                for i in range(n_frames):
                    chunk = data[i * frame_size : (i + 1) * frame_size]
                    raw = chunk.encode("utf-8") if unit == "chars" else chunk
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(hashlib.md5(raw).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": digests,
                    "frame_len": pd.Series(sizes, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema="doc_id bigint, frame_idx int, frame_md5 string, frame_len int"
    )


def embed_payload_fake(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
) -> DataFrame:
    """Feature extraction stub: a deterministic pseudo-embedding from the
    payload bytes (per-dimension byte sums) — the CLIP/whisper seam with
    the same (id, array<float>) output contract the similarity operators
    consume."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                vec = [0.0] * dim
                for i, b in enumerate(data):
                    vec[i % dim] += float(b)
                norm = sum(v * v for v in vec) ** 0.5 or 1.0
                ids.append(doc_id)
                vecs.append([v / norm for v in vec])
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "embedding": vecs})

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema="doc_id bigint, embedding array<double>"
    )


# ---------------------------------------------------------------------------
# REAL audio: RIFF/WAV PCM decode via the stdlib wave module (no external
# codec needed) — this is the one modality the container CAN decode for
# real, so the image/video NotImplementedError seam gets a working
# reference implementation of the same contract.
# ---------------------------------------------------------------------------
def synth_wav_bytes(
    freq_hz: float, duration_s: float = 0.1, sample_rate: int = 8000,
    amplitude: float = 0.5,
) -> bytes:
    """Deterministic 16-bit mono PCM WAV: a pure sine at ``freq_hz``.
    Real RIFF container bytes (header + data chunk), byte-identical for
    identical args — usable as a reproducible payload fixture."""
    import io
    import wave

    import numpy as np

    n = int(duration_s * sample_rate)
    t = np.arange(n, dtype=np.float64) / sample_rate
    samples = (amplitude * np.sin(2 * np.pi * freq_hz * t) * 32767.0).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio decode + feature extraction over a binary WAV column:
    parse the RIFF container (stdlib ``wave``), then numpy-vectorized
    features per asset — duration, RMS level, zero-crossing rate, and
    the dominant frequency via rFFT peak.

    The decode runs inside mapInPandas: payload bytes arrive as Arrow
    binary batches, never leave the executor, and the output is a slim
    typed feature row per asset — the exact shape the fake decoders
    stub, now with a real codec behind it.  Corrupt payloads yield a
    null feature row instead of failing the task (one bad asset must
    not kill a 100 TB pass)."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_s": [], "rms": [], "zero_cross_rate": [],
                "dominant_freq_hz": [], "decode_ok": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                try:
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        sr = w.getframerate()
                        n = w.getnframes()
                        raw = w.readframes(n)
                        if w.getsampwidth() != 2 or w.getnchannels() != 1:
                            raise ValueError("only 16-bit mono supported")
                    x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                    x /= 32767.0
                    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                    zcr = (
                        float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
                    )
                    spec = np.abs(np.fft.rfft(x)) if n else np.array([0.0])
                    dom = float(np.argmax(spec) * sr / n) if n else 0.0
                    out["sample_rate"].append(sr)
                    out["n_samples"].append(n)
                    out["duration_s"].append(round(n / sr, 6))
                    out["rms"].append(round(rms, 6))
                    out["zero_cross_rate"].append(round(zcr, 6))
                    out["dominant_freq_hz"].append(round(dom, 2))
                    out["decode_ok"].append(True)
                except Exception:
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["duration_s"].append(None)
                    out["rms"].append(None)
                    out["zero_cross_rate"].append(None)
                    out["dominant_freq_hz"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="Int64"),
                    "duration_s": pd.Series(out["duration_s"], dtype="float64"),
                    "rms": pd.Series(out["rms"], dtype="float64"),
                    "zero_cross_rate": pd.Series(
                        out["zero_cross_rate"], dtype="float64"
                    ),
                    "dominant_freq_hz": pd.Series(
                        out["dominant_freq_hz"], dtype="float64"
                    ),
                    "decode_ok": pd.Series(out["decode_ok"], dtype="boolean"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema=(
            "doc_id bigint, sample_rate int, n_samples bigint, "
            "duration_s double, rms double, zero_cross_rate double, "
            "dominant_freq_hz double, decode_ok boolean"
        ),
    )


# ---------------------------------------------------------------------------
# REAL image decode: PNG via stdlib zlib + struct (no Pillow needed).
# PNG is DEFLATE + per-scanline byte filters — both fully decodable with
# the standard library, so the image seam gets a working codec the same
# way audio did.  JPEG (DCT/huffman) and video stay behind the
# NotImplementedError seam.
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def synth_png_bytes(width: int, height: int, rgb=(128, 64, 32),
                    gradient: bool = False) -> bytes:
    """Deterministic 8-bit RGB PNG: solid ``rgb`` color, or a horizontal
    gradient r = column * 255 // (width-1) when ``gradient``.  Real PNG
    container (signature + IHDR/IDAT/IEND chunks, CRCs, zlib stream,
    filter-0 scanlines) — byte-identical for identical args."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    rows = bytearray()
    for _y in range(height):
        rows.append(0)  # filter type 0 (None)
        for x in range(width):
            if gradient:
                g = x * 255 // max(width - 1, 1)
                rows += bytes((g, g, g))
            else:
                rows += bytes(rgb)
    idat = zlib.compress(bytes(rows), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int):
    """Undo PNG scanline filters (types 0-4) -> (height, width*bpp)
    uint8 array.  Sequential per the spec: Sub/Average/Paeth reference
    the reconstructed left/up/up-left bytes (0 outside the image)."""
    import numpy as np

    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint16)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(np.uint16)
        pos += stride
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.uint16)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — vectorizable
            rec = (line + prior) & 0xFF
        else:  # Sub / Average / Paeth need the reconstructed left byte
            rec = np.zeros(stride, dtype=np.uint16)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prior[i]
                if ftype == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    rec[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    c = prior[i - bpp] if i >= bpp else 0
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (line[i] + pr) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> dict:
    """REAL PNG decode: signature + chunk walk (CRC-verified), zlib
    inflate, scanline unfilter.  Supports 8-bit depth, color types
    0/2/6 (gray/RGB/RGBA), non-interlaced — the shapes a data pipeline
    synthesizes and stores.  Returns {width, height, channels, pixels
    (h, w*c uint8 array)}; raises on anything malformed."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace or comp or filt:
        raise ValueError(
            f"unsupported PNG shape: depth={depth} ctype={ctype} "
            f"interlace={interlace}"
        )
    channels = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * channels)
    if len(raw) != expected:
        raise ValueError("PNG pixel payload truncated")
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": _png_unfilter(raw, width, height, channels),
    }


def decode_png_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL image decode + stats over a binary PNG column, the visual
    twin of decode_wav_features: per asset — dimensions, channel
    count, per-channel means and mean luma (Rec.601).  Runs in
    mapInPandas (Arrow binary batches, bytes never leave the
    executor); corrupt payloads degrade to decode_ok=false rows."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "channels": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "mean_luma": [],
                "decode_ok": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                try:
                    img = decode_png(bytes(payload))
                    px = img["pixels"].astype(np.float64)
                    c = img["channels"]
                    planes = [px[:, i::c] for i in range(c)]
                    if c == 1:
                        r = g = b = float(planes[0].mean())
                    else:
                        r = float(planes[0].mean())
                        g = float(planes[1].mean())
                        b = float(planes[2].mean())
                    out["width"].append(img["width"])
                    out["height"].append(img["height"])
                    out["channels"].append(c)
                    out["mean_r"].append(round(r, 4))
                    out["mean_g"].append(round(g, 4))
                    out["mean_b"].append(round(b, 4))
                    out["mean_luma"].append(
                        round(0.299 * r + 0.587 * g + 0.114 * b, 4)
                    )
                    out["decode_ok"].append(True)
                except Exception:
                    for k in ("width", "height", "channels"):
                        out[k].append(None)
                    for k in ("mean_r", "mean_g", "mean_b", "mean_luma"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema="doc_id long, width int, height int, channels int, "
        "mean_r double, mean_g double, mean_b double, mean_luma double, "
        "decode_ok boolean",
    )


# ---------------------------------------------------------------------------
# REAL video frame-sampling over a PNG-frame container.  Industry video
# codecs (H.264 etc.) need ffmpeg and stay stubbed; but the MECHANICS of
# video-as-a-column — parse a container, seek frames, sample every k-th,
# decode each sampled frame, 1:N fan-out — are fully real here using a
# simple length-prefixed container of real PNG frames (the shape an
# MJPEG/image2 pipeline produces).
# ---------------------------------------------------------------------------
_VID_MAGIC = b"PNGV"


def synth_png_video_bytes(n_frames: int, width: int = 8, height: int = 8,
                          base: int = 0) -> bytes:
    """Deterministic 'video': ``n_frames`` real PNG frames (frame i is
    solid gray level (base + 7*i) % 256) in a length-prefixed container:
    magic | u32 n_frames | (u32 len | png_bytes)*."""
    import struct

    out = bytearray(_VID_MAGIC + struct.pack(">I", n_frames))
    for i in range(n_frames):
        g = (base + 7 * i) % 256
        png = synth_png_bytes(width, height, (g, g, g))
        out += struct.pack(">I", len(png)) + png
    return bytes(out)


def sample_video_frames(
    df: DataFrame,
    every_k: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL frame sampling + per-frame decode: parse the container,
    take frames 0, k, 2k, ..., decode each sampled frame with the real
    PNG codec, and fan out 1:N rows of (doc_id, frame_idx, width,
    height, mean_luma).  Frames that are NOT sampled are never
    decoded — the container's length prefixes let the parser SKIP
    their bytes, which is the entire economics of frame sampling at
    100 TB (decode cost proportional to sampled frames, I/O to the
    container scan).  Corrupt containers/frames degrade per-asset."""
    import struct

    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "width": [], "height": [],
                "mean_luma": [], "decode_ok": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    buf = bytes(payload)
                    if buf[:4] != _VID_MAGIC:
                        raise ValueError("bad container magic")
                    (n,) = struct.unpack(">I", buf[4:8])
                    pos = 8
                    for i in range(n):
                        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
                        pos += 4
                        frame = buf[pos : pos + ln]
                        pos += ln
                        if i % every_k:
                            continue  # skipped frames are never decoded
                        img = decode_png(frame)
                        px = img["pixels"].astype(np.float64)
                        c = img["channels"]
                        planes = [px[:, j::c] for j in range(max(c, 1))]
                        if c >= 3:
                            luma = (
                                0.299 * planes[0].mean()
                                + 0.587 * planes[1].mean()
                                + 0.114 * planes[2].mean()
                            )
                        else:
                            luma = planes[0].mean()
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(i)
                        rows["width"].append(img["width"])
                        rows["height"].append(img["height"])
                        rows["mean_luma"].append(round(float(luma), 4))
                        rows["decode_ok"].append(True)
                except Exception:
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(None)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["mean_luma"].append(None)
                    rows["decode_ok"].append(False)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema="doc_id long, frame_idx int, width int, height int, "
        "mean_luma double, decode_ok boolean",
    )
