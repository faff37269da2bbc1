"""Perceptual video dedup: per-sampled-frame dHash signatures over the
real frame container plus the grouped Multi-Index-Hashing join
(operators/imagehash.video_dhash_signatures / video_near_dup_pairs).

Strategy mirrors the image and audio families: the Spark signature
path is pinned against local reference hashes, the grouped join is
differentially tested against a brute-force all-pairs scan, and the
catalog query's planted-clone pair set is pinned exactly."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineering_individual_assignment_spark.operators.imagehash import (
    build_video_container,
    dhash64_gray,
    luma_plane,
    phash_near_pairs,
    synth_texture_gray,
    video_dhash_signatures,
    video_near_dup_pairs,
)
from data_engineering_individual_assignment_spark.operators.multimodal import (
    decode_image,
    encode_jpeg_planes,
    encode_png_gray,
)

from .conftest import SF_SMALL

N_FRAMES, SIZE, EVERY_K = 6, 32, 2


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _jpeg(g) -> bytes:
    return encode_jpeg_planes(
        [g, np.full_like(g, 128.0), np.full_like(g, 128.0)],
        SIZE,
        SIZE,
        subsample=True,
    )


def _grays(d: int):
    return [synth_texture_gray(d * 100 + i, SIZE) for i in range(N_FRAMES)]


def _fixture_payloads(d: int):
    """(base_payload, variant_payload or None) replicating the catalog
    fixture."""
    grays = _grays(d)
    base = build_video_container([encode_png_gray(g) for g in grays])
    v = d % 4
    if v == 1:
        return base, build_video_container(
            [encode_png_gray(g + 12.0) for g in grays]
        )
    if v == 2:
        return base, build_video_container([_jpeg(g) for g in grays])
    if v == 3:
        return base, build_video_container([_jpeg(g + 12.0) for g in grays])
    return base, None


def _local_signature(payload: bytes) -> dict[int, int]:
    """Reference decode of the sampled frames, bypassing Spark."""
    import struct

    (n,) = struct.unpack(">I", payload[4:8])
    pos, out = 8, {}
    for i in range(n):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        pos += 4
        frame = payload[pos : pos + ln]
        pos += ln
        if i % EVERY_K == 0:
            out[i] = dhash64_gray(luma_plane(decode_image(frame)))
    return out


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def sig_df(spark):
    """12 videos (8 bases + 2 brightness copies + 2 distinct) + 1
    corrupt payload, hashed through the Spark path."""
    import pandas as pd

    rows = []
    for d in range(8):
        grays = _grays(d)
        rows.append(
            (d * 10, build_video_container([encode_png_gray(g) for g in grays]))
        )
        if d % 4 == 0:
            rows.append(
                (
                    d * 10 + 1,
                    build_video_container(
                        [encode_png_gray(g + 12.0) for g in grays]
                    ),
                )
            )
    rows.append((999, b"not a video"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "payload"])
    return video_dhash_signatures(
        spark.createDataFrame(pdf), every_k=EVERY_K
    ).cache()


def test_video_signatures_match_local_and_degrade(sig_df):
    rows = sig_df.collect()
    bad = [r for r in rows if r.doc_id == 999]
    assert len(bad) == 1 and bad[0].phash is None and not bad[0].decode_ok
    got = {}
    for r in rows:
        if r.doc_id != 999:
            got.setdefault(r.doc_id, {})[r.frame_idx] = r.phash
    # only sampled frames appear; hashes match the local reference
    for d in range(8):
        payload = build_video_container(
            [encode_png_gray(g) for g in _grays(d)]
        )
        expect = _local_signature(payload)
        assert got[d * 10] == expect, d
        assert sorted(expect) == [0, 2, 4]


def test_grouped_mih_matches_brute_force(sig_df):
    """phash_near_pairs(group_cols=frame_idx) == brute-force per-frame
    all-pairs at several thresholds."""
    sigs = {}
    for r in sig_df.collect():
        if r.phash is not None:
            sigs.setdefault(r.doc_id, {})[r.frame_idx] = r.phash
    base = sig_df.where("decode_ok")
    for max_h, bands in ((3, 4), (7, 4), (15, 8)):
        got = {
            (r.frame_idx, r.doc_a, r.doc_b, r.hamming)
            for r in phash_near_pairs(
                base,
                max_hamming=max_h,
                num_bands=bands,
                group_cols=("frame_idx",),
            ).collect()
        }
        ids = sorted(sigs)
        expect = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                for f in sigs[a]:
                    if f in sigs[b]:
                        h = _ham(sigs[a][f], sigs[b][f])
                        if h <= max_h:
                            expect.add((f, a, b, h))
        assert got == expect, (max_h, bands)


def test_video_near_dup_pairs_matches_brute_force(sig_df):
    sigs = {}
    for r in sig_df.collect():
        if r.phash is not None:
            sigs.setdefault(r.doc_id, {})[r.frame_idx] = r.phash
    ids = sorted(sigs)
    for min_frac in (0.8, 1.0):
        got = {
            (r.doc_a, r.doc_b): (r.n_matched, r.match_frac, r.mean_hamming)
            for r in video_near_dup_pairs(
                sig_df, max_hamming=7, min_frac=min_frac
            ).collect()
        }
        expect = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                hams = [
                    _ham(sigs[a][f], sigs[b][f])
                    for f in sigs[a]
                    if f in sigs[b]
                ]
                matched = [h for h in hams if h <= 7]
                if not matched:
                    continue
                frac = round(
                    len(matched) / max(len(sigs[a]), len(sigs[b])), 6
                )
                if frac >= min_frac:
                    expect[(a, b)] = (
                        len(matched),
                        frac,
                        round(sum(matched) / len(matched), 2),
                    )
        assert got == expect, min_frac


def test_catalog_query_planted_pairs_exact(spark):
    """The catalog entry matches the LOCAL REFERENCE pair set exactly
    on the real sf0.001 documents table: every planted (base, variant)
    pair — brightness variants are dHash-identical and JPEG re-encodes
    sit <= 4 bits/frame vs the 7-bit threshold — and NOTHING else:
    zero cross-video pairs."""
    from data_engineering_individual_assignment_spark.plans import CATALOG
    from data_engineering_individual_assignment_spark.sources.readers import (
        load_table,
    )

    rows = CATALOG["video_near_dup_signature"].fn(spark, SF_SMALL).collect()
    got = {
        (r.video_a, r.video_b): (r.n_matched, r.match_frac)
        for r in rows
    }

    doc_ids = [
        r.doc_id
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id")
        .collect()
    ]
    expect, planted = {}, 0
    for d in doc_ids:
        base, variant = _fixture_payloads(d)
        if variant is None:
            continue
        planted += 1
        sa = _local_signature(base)
        sb = _local_signature(variant)
        matched = [
            f for f in sa if f in sb and _ham(sa[f], sb[f]) <= 7
        ]
        frac = round(len(matched) / max(len(sa), len(sb)), 6)
        if frac >= 0.8:
            expect[(d * 10, d * 10 + d % 4)] = (len(matched), frac)
    assert got == expect
    assert len(expect) == planted  # 100% planted recall at these margins
    assert all(a < b for a, b in got)


def test_corrupt_frame_flags_but_does_not_truncate(spark):
    """A corrupt individual frame inside a VALID container flags its own
    row and the remaining frames still decode (regression: appending
    columns mid-loop left the output ragged — pandas index-aligned the
    unequal Series into a phantom decode_ok=NULL row and every frame
    after the first bad one was silently dropped, truncating the
    signature that video_near_dup_pairs divides by)."""
    import pandas as pd

    grays = _grays(3)
    frames = [encode_png_gray(g) for g in grays]
    frames[2] = b"corrupt frame bytes"  # sampled (0, 2, 4): middle one
    payload = build_video_container(frames)
    pdf = pd.DataFrame([(7, payload)], columns=["doc_id", "payload"])
    rows = sorted(
        video_dhash_signatures(
            spark.createDataFrame(pdf), every_k=EVERY_K
        ).collect(),
        key=lambda r: (r.frame_idx is None, r.frame_idx),
    )
    assert [(r.frame_idx, r.decode_ok) for r in rows] == [
        (0, True),
        (2, False),
        (4, True),
    ]
    assert rows[1].phash is None
    good = _local_signature(build_video_container([encode_png_gray(g) for g in grays]))
    assert rows[0].phash == good[0] and rows[2].phash == good[4]
