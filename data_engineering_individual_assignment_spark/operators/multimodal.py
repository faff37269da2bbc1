"""Multimodal column operators (SURVEY §2.11): opaque binary payloads
with typed metadata, decoded/sampled by Arrow-batched Python.

This container ships no image/audio/video libraries, so the actual
codec step is stubbed two ways, as the build contract requires:

- ``decode_image`` raises a clearly-marked NotImplementedError — the
  seam where Pillow/ffmpeg plugs in;
- the ``*_fake`` paths compute deterministic stand-ins from the bytes
  so the Spark-side plumbing (binary schema, Arrow batch iteration,
  1:N row fan-out, output schemas, partitioning) is real and testable
  end-to-end, with a DuckDB oracle over the same arithmetic.

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
