"""Fetcher tests with injected fake transports (no network in this
container): pagination-following, distributed per-key fetch, and the
full ingest path fetch -> landing -> normalize."""

from __future__ import annotations

import json


def fake_search_transport(url: str) -> dict:
    """Two-page paginated search endpoint."""
    if "pageToken=P2" in url:
        return {"nextPageToken": None, "items": [{"id": {"videoId": "v3"},
                "snippet": {"publishedAt": "2021-01-03T00:00:00Z",
                            "title": "t3", "description": "d3"}}]}
    return {"nextPageToken": "P2", "items": [
        {"id": {"videoId": "v1"}, "snippet": {"publishedAt": "2021-01-01T00:00:00Z",
                                              "title": "t1", "description": "d1"}},
        {"id": {"videoId": "v2"}, "snippet": {"publishedAt": "2021-01-02T00:00:00Z",
                                              "title": "t2", "description": "d2"}},
    ]}


def test_fetch_pages_follows_pagination(tmp_path):
    from data_engineering_individual_assignment_spark.sources.fetcher import fetch_pages

    out = str(tmp_path / "search.jsonl")
    n = fetch_pages(fake_search_transport, "https://api/search?q=x", out)
    assert n == 2
    lines = [json.loads(line) for line in open(out)]
    assert lines[0]["nextPageToken"] == "P2"
    assert lines[1]["items"][0]["id"]["videoId"] == "v3"


def test_fetch_pages_feeds_normalizer(spark, tmp_path):
    from data_engineering_individual_assignment_spark.sources import youtube
    from data_engineering_individual_assignment_spark.sources.fetcher import fetch_pages

    out = str(tmp_path / "search.jsonl")
    fetch_pages(fake_search_transport, "https://api/search?q=x", out)
    pages = youtube.read_landing(spark, out, youtube.SEARCH_PAGE_SCHEMA)
    descs = youtube.video_descriptions(pages)
    rows = sorted(tuple(r) for r in descs.collect())
    assert [r[1] for r in rows] == ["v1", "v2", "v3"]
    assert rows[0][0] == "2021/01/01"


def test_distributed_per_key_fetch(spark):
    from data_engineering_individual_assignment_spark.sources.fetcher import (
        fetch_per_key_distributed,
    )

    keys = spark.createDataFrame([(f"vid{i}",) for i in range(20)], "video_id string")

    def transport(url: str) -> dict:
        # self-contained fake: echo the key back with a counter payload
        vid = url.rsplit("=", 1)[-1]
        return {"video_id": vid, "items": [{"statistics": {"viewCount": str(len(vid))}}]}

    out = fetch_per_key_distributed(
        keys, "video_id", lambda k: f"https://api/videos?id={k}",
        transport, requests_per_second=1000.0, num_partitions=4,
    )
    rows = out.collect()
    assert len(rows) == 20
    parsed = {r["video_id"]: json.loads(r["response_json"]) for r in rows}
    assert parsed["vid7"]["items"][0]["statistics"]["viewCount"] == "4"


def test_exact_random_split_counts(spark):
    from data_engineering_individual_assignment_spark.operators.regression import (
        exact_random_split,
    )
    from data_engineering_individual_assignment_spark.sources.readers import load_table

    from .conftest import SF_SMALL

    orders = load_table(spark, SF_SMALL, "orders")
    n = orders.count()
    train, test = exact_random_split(orders, 0.6, seed=1)
    import math
    assert train.count() == math.ceil(0.6 * n)
    assert train.count() + test.count() == n
    # deterministic under the same seed
    t2, _ = exact_random_split(orders, 0.6, seed=1)
    assert sorted(r["o_orderkey"] for r in train.collect()) == sorted(
        r["o_orderkey"] for r in t2.collect()
    )


def test_model_http_response(spark, tmp_path):
    from data_engineering_individual_assignment_spark import pipeline
    from data_engineering_individual_assignment_spark.sources import fixtures

    base = str(tmp_path / "landing")
    import os
    os.makedirs(base)
    wh = str(tmp_path / "wh")
    paths = fixtures.write_fixtures(base)
    pipeline.daily_run(spark, {k: paths[k] for k in
                               ("search", "comments", "stats", "snippets")},
                       wh, day="2026_08_13")
    resp = pipeline.model_http_response(spark, wh, "2026_08_13")
    assert resp["statusCode"] == 200
    body = json.loads(resp["body"])
    assert "b1" in body and "rmse" in body


def test_binary_file_source(spark, tmp_path):
    """binaryFile ingest -> mapInPandas frame sampler, end to end on real
    files on disk."""
    from data_engineering_individual_assignment_spark.operators.multimodal import (
        sample_frames_fake,
    )
    from data_engineering_individual_assignment_spark.sources.readers import (
        read_binary_files,
    )
    import hashlib

    payloads = {i: bytes([i]) * (100 + 150 * i) for i in range(3)}
    for i, data in payloads.items():
        (tmp_path / f"asset_{i}.bin").write_bytes(data)
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    with_ids = df.selectExpr(
        "CAST(regexp_extract(path, 'asset_(\\\\d+)', 1) AS BIGINT) AS doc_id",
        "content AS payload",
    )
    frames = sample_frames_fake(with_ids).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1          # 100 bytes -> 1 frame
    assert len(by_doc[2]) == 4          # 400 bytes -> ceil(400/128) = 4 frames
    expected = hashlib.md5(payloads[1][:128]).hexdigest()
    assert [r for r in by_doc[1] if r["frame_idx"] == 0][0]["frame_md5"] == expected
