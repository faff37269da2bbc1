"""YouTube-API-shaped nested-JSON normalization (SURVEY §2.1 S1-S4,
§2.8 C13-C15, §3.1 stage 2).

The reference's 341-line ``youtube_scraping_function`` (final DAG
121-462) fetches four paginated endpoints and flattens them with pandas
row loops into the 4 warehouse tables.  Here the *fetch* stays a thin
driver-side landing step (Spark has no YouTube source — SURVEY §4.3);
everything after the landing zone is one lazy DataFrame plan per table:

- search pages      -> ``video_descriptions`` (date, video_id, video_title,
                       video_description)                 [F:173-190]
- commentThreads    -> ``video_comments`` (date, video_id, comment, author,
                       likes, reply_flag)                 [F:195-331]
- videos?statistics -> ``video_statistics`` (video_id, views, likes,
                       dislikes, comments)                [F:343-377]
- videos?snippet    -> ``video_tags`` (video_id, tag_number, tag_value)
                       + full-description upgrade         [F:389-448]

Pandas-quirk parity preserved (SURVEY §7 'hard parts'):
- dates stay *strings* in 'yyyy/MM/dd' (the warehouse stores text);
- the two-pass control-char regex (C3) and ';'->',' (C1) cleaning;
- ``tag_number`` is the 1-based insertion-order ordinal (posexplode —
  no NaN padding, no dropna needed, unlike the pandas wide-table+melt);
- tags default to [""] when the API omits the key (P5);
- final tag sort: video_id DESC, tag_number ASC (O1, F:437).

At scale: page files land as JSONL partitioned by ingest date; every
explode/flatten below is a narrow map — no shuffle until a sink or an
aggregation asks for one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cleaning import clean_text, iso_to_slash_date

# ---------------------------------------------------------------------------
# Landing schemas (FIXTURES.md §A1; declared, never inferred)
# ---------------------------------------------------------------------------
SEARCH_PAGE_SCHEMA = T.StructType([
    T.StructField("nextPageToken", T.StringType()),
    T.StructField("items", T.ArrayType(T.StructType([
        T.StructField("id", T.StructType([
            T.StructField("videoId", T.StringType()),
        ])),
        T.StructField("snippet", T.StructType([
            T.StructField("publishedAt", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("description", T.StringType()),
        ])),
    ]))),
])

_COMMENT_SNIPPET = T.StructType([
    T.StructField("textOriginal", T.StringType()),
    T.StructField("publishedAt", T.StringType()),
    T.StructField("videoId", T.StringType()),
    T.StructField("authorDisplayName", T.StringType()),
    T.StructField("likeCount", T.LongType()),
])

COMMENT_PAGE_SCHEMA = T.StructType([
    T.StructField("nextPageToken", T.StringType()),
    T.StructField("items", T.ArrayType(T.StructType([
        T.StructField("snippet", T.StructType([
            T.StructField("topLevelComment", T.StructType([
                T.StructField("snippet", _COMMENT_SNIPPET),
            ])),
        ])),
        T.StructField("replies", T.StructType([
            T.StructField("comments", T.ArrayType(T.StructType([
                T.StructField("snippet", _COMMENT_SNIPPET),
            ]))),
        ])),
    ]))),
])

STATS_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),  # carried by the fetcher
    T.StructField("items", T.ArrayType(T.StructType([
        T.StructField("statistics", T.StructType([
            # the API returns counters as JSON *strings* (F:370-373)
            T.StructField("viewCount", T.StringType()),
            T.StructField("likeCount", T.StringType()),
            T.StructField("dislikeCount", T.StringType()),
            T.StructField("commentCount", T.StringType()),
        ])),
    ]))),
])

SNIPPET_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("items", T.ArrayType(T.StructType([
        T.StructField("snippet", T.StructType([
            T.StructField("description", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ])),
    ]))),
])


def read_landing(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read a JSONL landing directory/file with its declared schema."""
    return spark.read.schema(schema).json(path)


# ---------------------------------------------------------------------------
# Normalizers: landing -> warehouse tables
# ---------------------------------------------------------------------------
def video_descriptions(search_pages: DataFrame, full_snippets: DataFrame | None = None) -> DataFrame:
    """Search pages -> (date, video_id, video_title, video_description).

    The reference overwrites the search API's truncated description with
    the full one from videos?snippet (F:444); pass ``full_snippets``
    (the raw snippet landing) to reproduce that upgrade.
    """
    base = (
        search_pages.select(F.explode("items").alias("it"))
        .select(
            iso_to_slash_date(F.col("it.snippet.publishedAt")).alias("date"),
            F.col("it.id.videoId").alias("video_id"),
            clean_text(F.col("it.snippet.title")).alias("video_title"),
            F.col("it.snippet.description").alias("search_description"),
        )
    )
    if full_snippets is None:
        return base.withColumn(
            "video_description", clean_text("search_description")
        ).drop("search_description")
    full = full_snippets.select(
        F.col("video_id"),
        clean_text(F.element_at("items", 1)["snippet"]["description"]).alias(
            "full_description"
        ),
    )
    return (
        base.join(full, "video_id", "left")
        .select(
            "date",
            "video_id",
            "video_title",
            F.coalesce("full_description", clean_text("search_description")).alias(
                "video_description"
            ),
        )
    )


def video_comments(comment_pages: DataFrame) -> DataFrame:
    """commentThreads pages -> (date, video_id, comment, author, likes,
    reply_flag).  Top-level comments get reply_flag=0, replies 1 (C15);
    both branches share the flatten + clean chain and are unioned —
    exactly the reference's two accumulation loops (F:286-303)."""

    def branch(snippet_col: F.Column, flag: int) -> DataFrame:
        return exploded.select(
            iso_to_slash_date(snippet_col["publishedAt"]).alias("date"),
            snippet_col["videoId"].alias("video_id"),
            clean_text(snippet_col["textOriginal"]).alias("comment"),
            clean_text(snippet_col["authorDisplayName"]).alias("author"),
            snippet_col["likeCount"].cast("long").alias("likes"),
            F.lit(flag).alias("reply_flag"),
        ).filter(F.col("video_id").isNotNull())

    exploded = comment_pages.select(F.explode("items").alias("it"))
    top = branch(F.col("it.snippet.topLevelComment.snippet"), 0)
    replies = (
        exploded.select(F.explode("it.replies.comments").alias("rc"))
        .select(
            iso_to_slash_date(F.col("rc.snippet.publishedAt")).alias("date"),
            F.col("rc.snippet.videoId").alias("video_id"),
            clean_text(F.col("rc.snippet.textOriginal")).alias("comment"),
            clean_text(F.col("rc.snippet.authorDisplayName")).alias("author"),
            F.col("rc.snippet.likeCount").cast("long").alias("likes"),
            F.lit(1).alias("reply_flag"),
        )
        .filter(F.col("video_id").isNotNull())
    )
    return top.unionByName(replies)


def video_statistics(stats_pages: DataFrame) -> DataFrame:
    """videos?statistics -> (video_id, views, likes, dislikes, comments).
    Counters arrive as JSON strings and are cast to long (F:370-377);
    a missing statistics node yields nulls, matching the reference's
    KeyError->skip behavior."""
    st = F.element_at("items", 1)["statistics"]
    return stats_pages.select(
        "video_id",
        st["viewCount"].cast("long").alias("views"),
        st["likeCount"].cast("long").alias("likes"),
        st["dislikeCount"].cast("long").alias("dislikes"),
        st["commentCount"].cast("long").alias("comments"),
    )


def video_tags(snippet_pages: DataFrame) -> DataFrame:
    """videos?snippet -> (video_id, tag_number, tag_value), tag_number
    1-based in insertion order (C14).  posexplode replaces the pandas
    wide-table + melt + dropna + sort dance (F:425-437); a missing tags
    key defaults to [\"\"] (P5, F:415-421)."""
    tags = F.coalesce(
        F.element_at("items", 1)["snippet"]["tags"],
        F.array(F.lit("")),
    )
    return (
        snippet_pages.select("video_id", tags.alias("tags"))
        .select("video_id", F.posexplode("tags").alias("pos", "tag_value0"))
        .select(
            "video_id",
            (F.col("pos") + 1).cast("int").alias("tag_number"),
            clean_text("tag_value0").alias("tag_value"),
        )
        # O1 (F:437): video_id DESC, tag_number ASC
        .orderBy(F.col("video_id").desc(), F.col("tag_number").asc())
    )


def normalize_all(
    spark: SparkSession,
    search_path: str,
    comments_path: str,
    stats_path: str,
    snippets_path: str,
) -> dict[str, DataFrame]:
    """Landing zone -> the 4 warehouse DataFrames (one lazy plan each)."""
    search = read_landing(spark, search_path, SEARCH_PAGE_SCHEMA)
    comments = read_landing(spark, comments_path, COMMENT_PAGE_SCHEMA)
    stats = read_landing(spark, stats_path, STATS_SCHEMA)
    snippets = read_landing(spark, snippets_path, SNIPPET_SCHEMA)
    return {
        "video_descriptions": video_descriptions(search, snippets),
        "video_comments": video_comments(comments),
        "video_statistics": video_statistics(stats),
        "video_tags": video_tags(snippets),
    }
