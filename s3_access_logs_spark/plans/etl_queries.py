"""ETL-parity query catalog.

The driver's tables contain no raw S3 log lines, so these queries
*construct* deterministic log lines from the ``events`` table — identically
in Spark and in the oracle SQL — then run the real parse pipeline
(tokenizer -> positional projection -> derived columns) on the Spark side,
while the oracle computes the expected outputs directly from the source
columns. That makes the oracle independent of the Spark implementation:
any tokenizer/derivation bug shows up as a mismatch.

Reference semantics under test: tokenizer (s3access/serializer.py:5-10),
positional mapping + '-' sentinel ints (s3access/normalize.py:23-48, :9-15),
timestamp parse/epoch/parts/ISO (s3access/normalize.py:53-64), IPv4->uint32
(s3access/normalize.py:70), requester flags (s3access/normalize.py:76-77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_access_logs_spark.operators.parse import parse_logs
from s3_access_logs_spark.plans.catalog import query
from s3_access_logs_spark.sources.tables import load_table

#: The oracle twin of _synthetic_log_lines' well-formed filter — every
#: oracle that recomputes expectations FROM events must apply it.
SQL_EVENTS_WELL_FORMED = (
    "event_id IS NOT NULL AND ts IS NOT NULL "
    "AND user_id IS NOT NULL AND event_type IS NOT NULL"
)

#: Domain of the multimodal SYNTHESIS harness (synthesize_assets-based
#: catalog entries), the _synthetic_log_lines precedent (dirty-docs
#: sweep, round 8): every synthesis parameter is a closed-form function
#: of doc_id that the oracles replay with SQL `%` — a NEGATIVE id's
#: sign-kept SQL remainder diverges from Python's floor-mod, and a NULL
#: text would synthesize the 4-byte literal 'None'. Valid Spark filter
#: AND valid SQL WHERE fragment (doc_id >= 0 is NULL-excluding in both).
SQL_ASSET_DOCS = "doc_id >= 0 AND text IS NOT NULL"


def sql_pmod(expr: str, m: int) -> str:
    """The ONE copy of the SQL pmod idiom (review r8 — it had been
    hand-expanded at every octet/coordinate site): ``F.pmod``'s
    non-negative remainder, expressed over both engines' sign-kept
    ``%``. Matches Spark's pmod for every BIGINT input."""
    return f"((({expr} % {m}) + {m}) % {m})"


def _synthetic_log_lines(
    spark: SparkSession, sf_dir: str, where: str | None = None
) -> DataFrame:
    """events -> one synthetic S3 access-log line per event (all 24 fields,
    quoted/bracketed groups, '-' sentinels on a deterministic subset).

    Synthesis is defined for WELL-FORMED events only (non-NULL id/ts/
    user/type — the dirty-events sweep, round 7): a NULL field would
    make ``concat_ws`` silently drop tokens, producing a short line
    whose parse shifts every downstream column while the oracles
    NULL-propagate from the source columns — two different undefined
    behaviors. The PARSER's malformed-line handling has its own
    contract and tests (``test_parse``); the synthesis harness does not
    double as its fixture. Every consumer oracle applies the identical
    ``WHERE`` (the shared ``SQL_EVENTS_WELL_FORMED`` fragment)."""
    ev = load_table(spark, sf_dir, "events").filter(SQL_EVENTS_WELL_FORMED)
    if where:
        ev = ev.filter(where)
    uid, eid = F.col("user_id"), F.col("event_id")
    dt = F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss")
    # pmod octets (dirty-id sweep, round 8): a negative id's sign-kept
    # remainder would synthesize an invalid IP ('10.-3...') whose parse
    # NULLs remoteip_int while the oracles' arithmetic stays numeric —
    # pmod keeps the synthesized address a valid dotted quad for ANY id
    ip = F.concat(
        F.lit("10."), F.pmod(uid, 256), F.lit("."), F.pmod(eid, 256),
        F.lit("."), F.pmod(eid * 7, 256),
    )
    requester = (
        F.when(eid % 3 == 0, F.concat(F.lit("arn:aws:iam::123456789012:user/u"), uid))
        .when(
            eid % 3 == 1,
            F.concat(F.lit("arn:aws:sts::123456789012:assumed-role/role/sess"), uid),
        )
        .otherwise(F.lit("-"))
    )
    bytessent = F.when(eid % 5 == 0, F.lit("-")).otherwise(
        (eid % 10000).cast("string")
    )
    line = F.concat_ws(
        " ",
        F.concat(F.lit("owner"), uid),
        F.concat(F.lit("bucket"), uid % 3),
        F.concat(F.lit("["), dt, F.lit(" +0000]")),
        ip,
        requester,
        F.concat(F.lit("REQ"), eid),
        F.concat(F.lit("REST."), F.upper("event_type"), F.lit(".OBJECT")),
        F.concat(F.lit("key/"), eid),
        F.concat(F.lit('"GET /bucket/key'), eid, F.lit(' HTTP/1.1"')),
        F.lit("200"),
        F.lit("-"),
        bytessent,
        F.lit("-"),
        (eid % 500).cast("string"),
        F.lit("-"),
        F.lit('"-"'),
        F.concat(F.lit('"agent/'), uid, F.lit(' (Linux)"')),
        F.lit("-"),
        F.concat(F.lit("host"), eid),
        F.lit("SigV4"),
        F.lit("-"),
        F.lit("AuthHeader"),
        F.concat(F.lit("bucket"), uid % 3, F.lit(".s3.amazonaws.com")),
        F.lit("TLSV1.2"),
    )
    return ev.select(line.alias("value"))


@query(
    "log_line_parse",
    oracle=f"""
    SELECT 'REQ' || event_id AS requestid,
           'bucket' || (user_id % 3) AS bucket_name,
           'REST.' || upper(event_type) || '.OBJECT' AS operation,
           '10.' || {sql_pmod('user_id', 256)} || '.'
               || {sql_pmod('event_id', 256)} || '.'
               || {sql_pmod('event_id * 7', 256)} AS remoteip,
           'GET /bucket/key' || event_id || ' HTTP/1.1' AS request_uri,
           'agent/' || user_id || ' (Linux)' AS useragent,
           CASE WHEN event_id % 5 = 0 THEN 0
                ELSE event_id % 10000 END::BIGINT AS bytessent,
           (event_id % 500)::BIGINT AS totaltime,
           floor(epoch(ts))::BIGINT AS ts,
           year(ts)::BIGINT AS year,
           month(ts) AS month,
           day(ts) AS day,
           hour(ts) AS hour,
           minute(ts) AS minute,
           second(ts)::INTEGER AS second,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+00:00' AS datetime,
           (10 * 16777216 + {sql_pmod('user_id', 256)} * 65536 + {sql_pmod('event_id', 256)} * 256
            + {sql_pmod('event_id * 7', 256)})::BIGINT AS remoteip_int,
           event_id % 3 = 1 AS is_assumed_role,
           event_id % 3 = 0 AS is_user
    FROM events
    WHERE {SQL_EVENTS_WELL_FORMED}
    """,
    tags=("etl", "parse"),
    bench=True,
)
def log_line_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end parse parity: synthesize lines from events, run the real
    tokenizer + projection + derivations; the oracle computes expectations
    straight from the source columns."""
    parsed = parse_logs(_synthetic_log_lines(spark, sf_dir))
    return parsed.select(
        "requestid",
        "bucket_name",
        "operation",
        "remoteip",
        "request_uri",
        "useragent",
        "bytessent",
        "totaltime",
        "ts",
        "year",
        "month",
        "day",
        "hour",
        "minute",
        "second",
        "datetime",
        "remoteip_int",
        "is_assumed_role",
        "is_user",
    )


@query(
    "logs_hourly_agg",
    oracle=f"""
    SELECT 'bucket' || (user_id % 3) AS bucket_name,
           'REST.' || upper(event_type) || '.OBJECT' AS operation,
           hour(ts) AS hour,
           COUNT(*) AS n_requests,
           SUM(CASE WHEN event_id % 5 = 0 THEN 0
                    ELSE event_id % 10000 END)::BIGINT AS total_bytes,
           ROUND(AVG(event_id % 500), 4) AS avg_totaltime
    FROM events
    WHERE {SQL_EVENTS_WELL_FORMED}
    GROUP BY 1, 2, 3
    """,
    tags=("etl", "agg"),
    bench=True,
)
def logs_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship downstream query shape (SURVEY §2.2):
    requests/bytes/latency by bucket x operation x hour over parsed logs —
    exactly what the hive partitioning (cmd/export.py:146) exists to prune."""
    parsed = parse_logs(_synthetic_log_lines(spark, sf_dir))
    return parsed.groupBy("bucket_name", "operation", "hour").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("bytessent").alias("total_bytes"),
        F.round(F.avg("totaltime"), 4).alias("avg_totaltime"),
    )


# (r2 consolidation: ipv4_roundtrip was folded into cidr_traffic, which
# now emits per-group min/max remoteip_int plus a long_to_ipv4 rendering of
# the min — so ipv4_to_long (inside the parser) and long_to_ipv4 are both
# still value-checked against the oracle's arithmetic reconstruction.
# Reference parity: s3access/normalize.py:70 (uint32 value space).)


@query(
    "multimodal_meta",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
             doc_id % 3 AS m,
             octet_length(encode(text)) AS tb,
             16 + doc_id % 240 AS img_w,
             8000 + 1000 * (doc_id % 41) AS sr,
             100 + doc_id % 9901 AS dur,
             1 + doc_id % 120 AS nf,
             32 + doc_id % 64 AS vid_w
      FROM documents
      WHERE {SQL_ASSET_DOCS}
    )
    SELECT CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS modality,
           COUNT(*) AS n_assets,
           SUM(CASE m WHEN 0 THEN 33 + tb WHEN 1 THEN 44 + tb
                ELSE 20 + nf * 16 END)::BIGINT AS total_bytes,
           ROUND(AVG(CASE m WHEN 0 THEN img_w WHEN 2 THEN vid_w END), 4)
             AS avg_width,
           ROUND(AVG(CASE WHEN m = 1 THEN sr END), 4) AS avg_sample_rate,
           ROUND(AVG(CASE WHEN m = 1 THEN dur END), 4) AS avg_duration_ms,
           SUM(CASE WHEN m = 2 THEN nf ELSE 0 END)::BIGINT AS total_frames,
           SUM(CASE WHEN m = 2 THEN (nf + 2) // 3 ELSE 0 END)::BIGINT
             AS frames_kept_stride3,
           SUM(CASE WHEN m = 2 THEN ((nf + 2) // 3) * 16 ELSE 0 END)::BIGINT
             AS sampled_frame_bytes
    FROM a GROUP BY 1
    """,
    tags=("multimodal", "binary", "video", "mapInPandas"),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal round-trip: synthesize real container bytes (PNG/WAV/MVID)
    from documents, then *decode the headers back from raw bytes* via
    Arrow-batched mapInPandas (operators/multimodal.py) and aggregate the
    typed metadata. The frame-sampling columns (r2 fold of
    video_frame_sample) run MM.sample_frames — the mapInPandas explode of
    MVID payloads into kept frames (stride 3) — and re-aggregate to the
    modality grain, so the frame plumbing's row counts and byte totals stay
    value-checked. The oracle recomputes every value from the synthesis
    formulas, so a decode bug on either path mismatches."""
    from s3_access_logs_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(SQL_ASSET_DOCS)
    assets = MM.synthesize_assets(docs)
    decoded_agg = MM.decode_metadata(assets).groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.round(F.avg(F.col("meta.width")), 4).alias("avg_width"),
        F.round(F.avg(F.col("meta.sample_rate")), 4).alias("avg_sample_rate"),
        F.round(F.avg(F.col("meta.duration_ms")), 4).alias("avg_duration_ms"),
        F.sum(F.coalesce(F.col("meta.n_frames"), F.lit(0)))
        .cast("bigint")
        .alias("total_frames"),
    )
    frames_agg = (
        MM.sample_frames(assets, stride=3)
        .select(F.lit("video").alias("modality"), "frame_payload")
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("frames_kept_stride3"),
            F.sum(F.length("frame_payload"))
            .cast("bigint")
            .alias("sampled_frame_bytes"),
        )
    )
    return decoded_agg.join(frames_agg, "modality", "left").select(
        decoded_agg["*"],
        F.coalesce("frames_kept_stride3", F.lit(0)).alias("frames_kept_stride3"),
        F.coalesce("sampled_frame_bytes", F.lit(0).cast("bigint")).alias(
            "sampled_frame_bytes"
        ),
    )


@query(
    "binary_columns",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           substr(text, 1, 16) AS head
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: text -> opaque binary payload column + typed
    metadata (the decode/feature path lives in operators/multimodal.py as
    an Arrow-batched mapInPandas over this same column shape)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5("text").alias("content_hash"),
        F.substring("text", 1, 16).alias("head"),
    )


@query(
    "streaming_export_roundtrip",
    oracle=f"""
    SELECT 'bucket' || (user_id % 3) AS bucket_name,
           'REST.' || upper(event_type) || '.OBJECT' AS operation,
           hour(ts) AS hour,
           COUNT(*) AS n_requests,
           SUM(CASE WHEN event_id % 5 = 0 THEN 0
                    ELSE event_id % 10000 END)::BIGINT AS total_bytes
    FROM events
    WHERE month(ts) = 1 AND day(ts) <= 2 AND {SQL_EVENTS_WELL_FORMED}
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "etl"),
)
def streaming_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE streaming pipeline under the oracle: synthesize raw log
    lines, ingest them with the Structured Streaming export job
    (readStream -> parse -> foreachBatch hive-partitioned sink, exactly-once
    checkpoint), read the partitioned output back and aggregate. The oracle
    computes the expected rollup straight from the source events — so file
    tracking, the streaming parser, the partitioned sink layout, and the
    pruned read are all on the hook for value parity."""
    import tempfile

    from s3_access_logs_spark.operators.etl import read_parsed
    from s3_access_logs_spark.streaming import run_export_stream

    root = tempfile.mkdtemp(prefix="sgl_stream_")
    src, dst, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    # bounded to two days of events: the hive tree fans out per
    # (bucket, op, year, month, day, hour) and the full month at sf0.01
    # is ~6.5k tiny partitions — a small-files problem by construction,
    # not a representative sink load (the real job writes ONE hour).
    lines = _synthetic_log_lines(
        spark, sf_dir, where="month(ts) = 1 AND day(ts) <= 2"
    )
    lines.coalesce(4).write.mode("overwrite").text(src)
    run_export_stream(spark, src, dst, ckpt).awaitTermination(300)
    parsed = read_parsed(spark, dst)
    return parsed.groupBy("bucket_name", "operation", "hour").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("bytessent").alias("total_bytes"),
    )


def _cidr_traffic_oracle() -> str:
    from s3_access_logs_spark.functions.ip import cidr_range

    lo, hi = cidr_range("10.5.0.0/16")
    return f"""
    WITH t AS (
      SELECT 'bucket' || (user_id % 3) AS bucket_name,
             'REST.' || upper(event_type) || '.OBJECT' AS operation,
             CASE WHEN event_id % 5 = 0 THEN 0
                  ELSE event_id % 10000 END AS bytes,
             (10 * 16777216 + {sql_pmod('user_id', 256)} * 65536 + {sql_pmod('event_id', 256)} * 256
              + {sql_pmod('event_id * 7', 256)}) AS ipint
      FROM events
      WHERE {SQL_EVENTS_WELL_FORMED}
    ),
    g AS (
      SELECT bucket_name, operation,
             COUNT(*) AS n_requests,
             SUM(bytes)::BIGINT AS total_bytes,
             MIN(ipint)::BIGINT AS ip_lo,
             MAX(ipint)::BIGINT AS ip_hi
      FROM t
      WHERE ipint BETWEEN {lo} AND {hi}
      GROUP BY 1, 2
    )
    SELECT bucket_name, operation, n_requests, total_bytes, ip_lo, ip_hi,
           (ip_lo // 16777216) || '.' || ((ip_lo // 65536) % 256) || '.'
             || ((ip_lo // 256) % 256) || '.' || (ip_lo % 256) AS ip_lo_str
    FROM g
    """


@query(
    "cidr_traffic",
    oracle=None,  # filled below (bounds generated from the same cidr_range)
    tags=("etl", "ip", "cidr", "filter"),
)
def cidr_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic from one CIDR block: the reference's flagship investigative
    query shape ('who in this subnet touched the bucket'), via ip_in_cidr —
    CIDR containment compiled to a remoteip_int BETWEEN range at plan time.
    Over the partitioned/sorted parquet this predicate reaches the scan as
    a row-group min/max prune (pinned by test_plan_shapes); here it runs on
    freshly parsed lines to keep the oracle independent. The per-group
    min/max remoteip_int and its long_to_ipv4 rendering keep the
    int<->dotted-quad roundtrip (r2 fold of ipv4_roundtrip) on the hook."""
    from s3_access_logs_spark.functions.expr import filter_unpushed
    from s3_access_logs_spark.functions.ip import ip_in_cidr, long_to_ipv4

    parsed = parse_logs(_synthetic_log_lines(spark, sf_dir))
    return (
        # filter_unpushed: the predicate's input is a parsed column; letting
        # it push below the projection inlines the tokenizer into the filter
        # (6 regexp evals/row measured — see functions/expr.py).
        filter_unpushed(parsed, ip_in_cidr("remoteip_int", "10.5.0.0/16"))
        .groupBy("bucket_name", "operation")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum("bytessent").alias("total_bytes"),
            F.min("remoteip_int").alias("ip_lo"),
            F.max("remoteip_int").alias("ip_hi"),
        )
        .withColumn("ip_lo_str", long_to_ipv4(F.col("ip_lo")))
    )


from s3_access_logs_spark.plans.catalog import QUERIES as _Q  # noqa: E402
import dataclasses as _dc  # noqa: E402

_Q["cidr_traffic"] = _dc.replace(_Q["cidr_traffic"], oracle=_cidr_traffic_oracle())


def _zorder_oracle() -> str:
    from s3_access_logs_spark.operators.layout import zvalue_sql

    # pmod coordinates (dirty-id sweep, round 8): the z-interleave is
    # defined over UNSIGNED coordinate space — a sign-kept negative
    # remainder sign-extends through the shift/mask terms differently
    # per engine
    z = zvalue_sql(
        sql_pmod("user_id", 65536), sql_pmod("event_id", 65536), bits=16
    )
    return f"""
    WITH z AS (SELECT event_id, ({z}) AS zv FROM events)
    SELECT zv >> 20 AS z_bucket,
           COUNT(*) AS n,
           MIN(zv) AS z_lo,
           MAX(zv) AS z_hi
    FROM z GROUP BY 1
    """


@query(
    "zorder_curve",
    oracle=None,  # filled below (generated from the same bit positions)
    tags=("layout", "zorder", "etl"),
)
def zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve interleave of (user_id, event_id) bucketed by the top bits:
    the clustering key behind operators/layout.py:zorder_write, checked
    value-for-value. The interleave is 32 shift/mask terms of plain long
    arithmetic — one whole-stage-codegen projection, no shuffle until the
    final small aggregate."""
    from s3_access_logs_spark.operators.layout import zvalue

    ev = load_table(spark, sf_dir, "events")
    # pmod, not % — see the oracle note: negative sign-kept remainders
    # sign-extend through the interleave engine-specifically
    z = zvalue(
        F.pmod(F.col("user_id"), 65536),
        F.pmod(F.col("event_id"), 65536),
        bits=16,
    )
    return (
        ev.select("event_id", z.alias("zv"))
        .groupBy(F.shiftright("zv", 20).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zv").alias("z_lo"),
            F.max("zv").alias("z_hi"),
        )
    )


_Q["zorder_curve"] = _dc.replace(_Q["zorder_curve"], oracle=_zorder_oracle())
