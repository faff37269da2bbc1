"""Table-maintenance operators: the jobs that keep a 100 TB parquet
warehouse healthy between queries.

- ``compact_parquet``: rewrite a directory of small files into
  target-size files.  Streaming ingest (AvailableNow micro-batches,
  per-partition dynamic overwrites) inevitably produces many small
  files; scan throughput then dies on per-file open overhead and the
  driver's file-listing.  Compaction reads once, repartitions to
  ceil(bytes / target), writes once — a pure shuffle-bounded pass that
  parallelizes over the cluster.
- ``scan_stats``: per-file row counts and per-column min/max — the
  manifest a planner (or an engineer auditing pruning) reads instead of
  the data.  Computed with one grouped aggregation over
  ``input_file_name()``; at scale this is the same partial+final
  aggregate shape as any groupBy, shuffling one row per (partition,
  file).

Neither touches the driver beyond listing-level metadata: row data
never collects.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src`` (a parquet directory) into ``dst`` with files
    sized ~``target_file_mb``.  Returns the number of output files
    requested.

    Sizing uses the on-disk compressed bytes of the source — the right
    proxy when re-writing with the same codec.  ``repartition(n)``
    round-robins rows, so output files are uniformly sized even when
    the input's file sizes are skewed (the usual case after per-key
    dynamic overwrites).  On a real deployment this runs per partition
    directory (ingest_date=...), keeping each rewrite's shuffle bounded
    by one partition's volume, not the table's.
    """
    n_files = max(1, math.ceil(_dir_bytes(src) / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    # the rewrite changed dst's layout (and possibly schema): drop any
    # cached metadata a prior load_table of dst left behind
    from ..sources.readers import invalidate_table

    invalidate_table(spark, dst)
    return n_files


def scan_stats(
    spark: SparkSession,
    path: str,
    columns: list[str],
) -> DataFrame:
    """Per-file manifest: row count plus min/max for each named column.

    Output schema: (file, n_rows, <col>_min, <col>_max, ...) with
    ``file`` the part-file path RELATIVE to the table root (for a flat
    table that is just the basename; for a partitioned layout it keeps
    the ``dt=.../`` prefix — partitioned writes reuse the same
    ``part-0000N-<uuid>`` basename in EVERY partition directory, so a
    basename key would merge distinct files).  One grouped aggregation;
    the shuffle carries a row per (input partition, file), never row
    data.
    """
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in columns:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    # input_file_name() is a URI (file:///abs/... or file:/abs/...) with
    # percent-encoded special characters; a plain-text prefix match on
    # abspath() silently fails for encoded spaces or symlinked roots and
    # substring_index would then leak the full URI into the manifest.
    # Normalize scheme -> decode percent escapes -> strip whichever of
    # the given (abspath) or resolved (realpath) root matches.  '+' is
    # pre-escaped because url_decode is form-decoding ('+' -> space)
    # while file URIs leave '+' literal.  Consumers (find_orphan_files /
    # targeted_delete) reject manifests where neither root matched.
    decoded = F.url_decode(
        F.regexp_replace(
            F.regexp_replace(F.input_file_name(), "^file:/+", "/"),
            r"\+",
            "%2B",
        )
    )
    root_given = os.path.abspath(path).rstrip("/") + "/"
    root_real = os.path.realpath(path).rstrip("/") + "/"
    rel = F.substring_index(
        F.substring_index(decoded, root_given, -1), root_real, -1
    )
    return df.groupBy(rel.alias("file")).agg(*aggs).orderBy("file")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 8,
    bits: int = 10,
) -> None:
    """Z-ORDER clustered rewrite: sort rows along a Morton (bit-
    interleaved) curve over two columns before writing, so EVERY file's
    min/max range is narrow in BOTH dimensions — parquet row-group /
    file skipping then prunes on either predicate, which a plain sort
    gives only for its leading column.  This is the multi-dimensional
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER BY) expressed
    with stock Spark.

    Each column is rank-bucketed into 2^bits quantile buckets via
    ntile over a global sort — exact and deterministic; at 100 TB swap
    in approxQuantile cut points + width_bucket to avoid the global
    windows (the curve needs only approximate ranks).  The z-value
    interleaves the two bucket ids bit-by-bit; repartitionByRange on it
    gives each output file a contiguous curve segment.
    """
    from pyspark.sql import Window

    cx, cy = cols
    nt = 1 << bits
    bucketed = df.withColumn(
        "__bx", F.ntile(nt).over(Window.orderBy(cx)) - 1
    ).withColumn("__by", F.ntile(nt).over(Window.orderBy(cy)) - 1)
    z = None
    for b in range(bits):
        contrib = (
            F.shiftleft(F.shiftright("__bx", b).bitwiseAND(F.lit(1)), 2 * b)
            .bitwiseOR(
                F.shiftleft(F.shiftright("__by", b).bitwiseAND(F.lit(1)), 2 * b + 1)
            )
        )
        z = contrib if z is None else z.bitwiseOR(contrib)
    (
        bucketed.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__bx", "__by", "__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    # the rewrite changed path's layout: drop any cached metadata a
    # prior load_table of it left behind
    from ..sources.readers import invalidate_table

    invalidate_table(df.sparkSession, path)


def _reject_non_relative(files) -> None:
    """scan_stats guarantees table-root-relative paths only when one of
    its root candidates prefix-matched the decoded file URI; if neither
    did, the absolute path (or full URI) leaks through.  Fail loudly
    before any consumer turns a garbage path into a wrong delete."""
    bad = sorted(f for f in files if "://" in f or f.startswith("/"))
    if bad:
        raise ValueError(
            "manifest contains non-relative file paths (table root did "
            f"not match the scan URIs): {bad[:3]}"
        )


def find_orphan_files(path: str, manifest: DataFrame) -> list[str]:
    """Orphan detection against a RECORDED manifest — the integrity
    half of table maintenance.  A plain parquet directory has no
    notion of orphans (the reader lists the directory, so every part
    file is 'the table'); orphans exist relative to a COMMITTED file
    list, which is exactly what the ``scan_stats`` manifest records
    (and what Delta/Iceberg metadata is).  Files on disk but absent
    from the manifest are debris from failed writes, aborted
    compactions or manual copies — silently READ by directory-listing
    scans (data corruption, not just wasted storage), and what a
    VACUUM removes after verifying age.

    ``manifest``: a DataFrame with a ``file`` basename column (the
    scan_stats output, possibly round-tripped through its saved
    form).  Returns sorted orphan paths RELATIVE to ``path`` — a
    recursive walk, so debris inside partition subdirectories
    (``dt=.../part-*.parquet``) is reported too, not just the flat
    top-level layout."""
    import os

    committed = {r["file"] for r in manifest.select("file").collect()}
    _reject_non_relative(committed)
    on_disk = set()
    for root, dirs, files in os.walk(path):
        # skip metadata dirs the way directory-listing readers do
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for name in files:
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                rel = os.path.relpath(os.path.join(root, name), path)
                on_disk.add(rel)
    # manifests record basenames for flat tables; compare on the path
    # for nested layouts and on the basename for flat ones
    return sorted(
        p for p in on_disk
        if p not in committed and os.path.basename(p) not in committed
    )


def targeted_delete(
    spark: SparkSession,
    path: str,
    key_col: str,
    key_values: list,
) -> dict:
    """Right-to-be-forgotten deletion that rewrites ONLY the part files
    whose ``key_col`` min/max range can contain a target key — the
    Delta/Iceberg DELETE file-pruning pattern expressed on plain
    parquet.  At 100 TB this is the difference between rewriting a
    table and rewriting a handful of files: the ``scan_stats`` manifest
    (metadata-sized) identifies candidate files; untouched files are
    never read, never rewritten, and keep their identity (mtime, stats,
    cache residency).

    Touched files are rewritten IN PLACE (same basename) with the
    matching rows filtered out, so the manifest's untouched rows stay
    valid.  A clustered layout (``zorder_write`` / range-partitioned
    writes) is what makes the pruning selective: on a random layout
    every file's range contains every key and this degrades —
    measurably, see the test — to a full rewrite.

    Returns {"files_total", "files_rewritten", "rows_deleted"}.
    """
    manifest = scan_stats(spark, path, [key_col]).collect()
    _reject_non_relative(r["file"] for r in manifest)
    lo, hi = f"{key_col}_min", f"{key_col}_max"
    targets = [v for v in key_values if v is not None]
    touched = [
        r["file"]
        for r in manifest
        # a file with NULL min/max stats holds only null keys — it cannot
        # contain any (non-null) target value, so it is safely untouched
        if r[lo] is not None
        and any(r[lo] <= v <= r[hi] for v in targets)
    ]
    rows_deleted = 0
    for fname in touched:
        # manifest paths are table-root-relative (scan_stats), so the
        # join lands on the right file in nested dt=... layouts too
        fpath = os.path.join(path, fname)
        df = spark.read.parquet(fpath)
        if key_col not in df.columns:
            # a partition column exists via directory discovery on the
            # table read but is NOT stored inside the part files — the
            # per-file rewrite below would lose it.  Refuse before any
            # file has been touched rather than fail mid-rewrite.
            raise ValueError(
                f"targeted_delete: {key_col!r} is not stored in part file "
                f"{fname!r} (partition column?) — rewrite the partition "
                "directory instead of per-file deletes"
            )
        # null-safe keep: ~isin() is NULL (not true) for null keys, and a
        # plain filter would silently delete them alongside the targets
        keep = df.filter(
            F.col(key_col).isNull() | ~F.col(key_col).isin(targets)
        )
        n_before = df.count()
        # write to a sibling temp dir, then swap the single part file in
        # place of the original so the table layout is unchanged
        tmp = fpath + ".__rewrite__"
        keep.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        n_after = spark.read.parquet(os.path.join(tmp, part)).count()
        rows_deleted += n_before - n_after
        os.replace(os.path.join(tmp, part), fpath)
        # the local Hadoop FS keeps a sibling checksum per part file;
        # stale ones would fail the next read of the replaced file
        crc = os.path.join(
            os.path.dirname(fpath), f".{os.path.basename(fname)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if touched:
        # in-place rewrites changed the table's file layout: drop any
        # cached metadata a prior load_table of this path left behind
        from ..sources.readers import invalidate_table

        invalidate_table(spark, path)
    return {
        "files_total": len(manifest),
        "files_rewritten": len(touched),
        "rows_deleted": rows_deleted,
    }
