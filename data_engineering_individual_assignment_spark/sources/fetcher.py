"""Paginated REST ingestion (SURVEY §2.1 S1-S4, §4.3).

The reference makes ~600 sequential HTTP calls per run: one paginated
search, then three per-video endpoints in Python for-loops (final DAG
135-159, 231-265, 343-358, 389-404).  Spark has no YouTube source, so
ingestion splits into:

- ``fetch_pages`` — driver-side paginated GET -> JSONL landing file.
  Correct for the reference's actual volume (hundreds of calls); the
  landing file is then read with a declared schema (sources/youtube.py).
- ``fetch_per_key_distributed`` — the scale path for the N+1 per-video
  pattern: partition the key DataFrame, fetch *inside* mapInPandas so
  hundreds of executors pull concurrently with per-partition rate
  limiting; output rows are (key, response_json) ready for from_json.

Both take the transport as an injected callable — the engine never
hard-codes an HTTP client (this container has no network; tests inject
fakes), and rate limiting/retry stay in one place.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# transport: (url) -> parsed-JSON dict
Transport = Callable[[str], dict]


def fetch_pages(
    transport: Transport,
    base_url: str,
    out_path: str,
    page_token_param: str = "pageToken",
    max_pages: int = 1000,
) -> int:
    """S1: follow nextPageToken until absent, append each page as one
    JSONL line (the landing format sources/youtube.py declares).
    Returns the number of pages fetched."""
    n = 0
    token: str | None = None
    with open(out_path, "w", encoding="utf-8") as fh:
        while n < max_pages:
            url = base_url if token is None else f"{base_url}&{page_token_param}={token}"
            page = transport(url)
            fh.write(json.dumps(page, ensure_ascii=False) + "\n")
            n += 1
            token = page.get("nextPageToken")
            if not token:
                break
    return n


def fetch_per_key_distributed(
    keys: DataFrame,
    key_col: str,
    url_for_key: Callable[[str], str],
    transport: Transport,
    requests_per_second: float = 10.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """S2-S4 at scale: the reference's one-GET-per-video loop as a
    distributed fetch.  Keys are repartitioned so each partition fetches
    its slice with a local rate limiter; result rows are
    (key, response_json string) — parse downstream with from_json.

    The transport callable is pickled to executors: keep it
    self-contained (no sockets captured in the closure).
    """
    import pandas as pd

    if num_partitions:
        keys = keys.repartition(num_partitions, key_col)
    min_interval = 1.0 / requests_per_second if requests_per_second > 0 else 0.0

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last = 0.0
        for pdf in batches:
            out_keys, out_json = [], []
            for key in pdf[key_col].astype(str):
                wait = min_interval - (time.monotonic() - last)
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
                resp = transport(url_for_key(key))
                out_keys.append(key)
                out_json.append(json.dumps(resp, ensure_ascii=False))
            yield pd.DataFrame({key_col: out_keys, "response_json": out_json})

    return keys.select(F.col(key_col).cast("string")).mapInPandas(
        fetch_batches, schema=f"{key_col} string, response_json string"
    )
