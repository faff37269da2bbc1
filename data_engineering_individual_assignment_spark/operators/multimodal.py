"""Multimodal column operators (SURVEY §2.11): opaque binary payloads
with typed metadata, decoded/sampled by Arrow-batched Python.

This container ships no image/video libraries, so those codec steps are
stubbed two ways, as the build contract requires:

- ``decode_image`` raises a clearly-marked NotImplementedError — the
  seam where Pillow/ffmpeg plugs in;
- the ``*_fake`` paths compute deterministic stand-ins from the bytes
  so the Spark-side plumbing (binary schema, Arrow batch iteration,
  1:N row fan-out, output schemas, partitioning) is real and testable
  end-to-end, with a DuckDB oracle over the same arithmetic.

AUDIO is decoded for REAL: ``decode_wav_features`` parses RIFF/WAV PCM
with the stdlib ``wave`` codec and extracts numpy DSP features
(RMS / zero-crossing rate / dominant FFT frequency), pinned against
analytic ground truth in tests — the working reference implementation
of the contract the image/video seams stub.

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
    """REAL image decode seam — intentionally unimplemented here.

    A deployment with Pillow installs it as:
        img = PIL.Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, ...}
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; use the *_fake paths for plumbing tests"
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
