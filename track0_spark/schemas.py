"""Engine table schemas (SURVEY.md §1.2). Fixed, columnar, no MapType."""

from __future__ import annotations

from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType()),
        T.StructField("url_h64", T.LongType()),  # bloom key (track0s h64)
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("domain_depth", T.IntegerType()),
        T.StructField("via_url", T.StringType()),
        T.StructField("via_host", T.StringType()),
        T.StructField("src_tag", T.StringType()),
        T.StructField("src_attr", T.StringType()),
        T.StructField("is_requisite", T.BooleanType()),
        T.StructField("discovered_round", T.IntegerType()),
        T.StructField("priority", T.IntegerType()),
        # transient-retry tier (round 5): fetch attempts so far; old
        # checkpoints lack the column (read as null -> coalesced to 0)
        T.StructField("attempts", T.IntegerType()),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType()),
        T.StructField("url_h64", T.LongType()),  # bloom key (track0s h64)
        T.StructField("first_round", T.IntegerType()),
    ]
)

CRAWL_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("fetch_seq", T.LongType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("domain_depth", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("saved", T.BooleanType()),
        T.StructField("is_requisite", T.BooleanType()),
        T.StructField("via_url", T.StringType()),
    ]
)

#: output of the fused extract+canon mapInPandas pass (SURVEY.md §2.5 E1, §2.2 U1/U2)
CANDIDATE = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("src_tag", T.StringType()),
        T.StructField("src_attr", T.StringType()),
        T.StructField("is_requisite", T.BooleanType()),
        T.StructField("parent_seq", T.LongType()),  # parent's global fetch_seq
        T.StructField("link_idx", T.IntegerType()),
        T.StructField("via_url", T.StringType()),
        T.StructField("via_host", T.StringType()),
        T.StructField("parent_depth", T.IntegerType()),
        T.StructField("parent_domain_depth", T.IntegerType()),
        T.StructField("is_redirect", T.BooleanType()),  # meta-refresh hop
        T.StructField("url_h64", T.LongType()),  # bloom key
        T.StructField("maybe_seen", T.BooleanType()),  # bloom gate verdict
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
        T.StructField("budget_per_round", T.IntegerType()),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("rows", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
    ]
)
