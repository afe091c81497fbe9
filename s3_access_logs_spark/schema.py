"""Schema for the parsed S3 access-log table.

Spark-typed port of the reference's fixed 35-field arrow schema
(reference: s3access/schema.py:6-45): 24 raw fields taken positionally from
the log line + 11 derived fields. Type mapping notes:

* ``remoteip_int`` is uint32 in the reference (s3access/normalize.py:70);
  Spark has no unsigned types, so it is LongType here (and the DuckDB oracle
  casts to BIGINT — same value space).
* ``ts`` is int64 epoch seconds (float truncated to int by the reference's
  arrow coercion, cmd/export.py:143); ``unix_timestamp`` matches exactly.
* timestamps are additionally carried as a proper TimestampType column
  ``ts_ts`` internally (dropped before compat-mode writes) because a native
  timestamp enables partition pruning / watermarks; the reference's
  string+epoch pair is preserved for output parity.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The 24 raw fields, in exact log-line order (reference: s3access/schema.py:8-31,
# positional mapping s3access/normalize.py:23-48).
RAW_STRING_FIELDS: tuple[str, ...] = (
    "bucketowner",       # 0
    "bucket_name",       # 1
    "requestdatetime",   # 2
    "remoteip",          # 3
    "requester",         # 4
    "requestid",         # 5
    "operation",         # 6
    "key",               # 7
    "request_uri",       # 8
    "httpstatus",        # 9  (kept as string, like the reference)
    "errorcode",         # 10
    "bytessent",         # 11 -> int64
    "objectsize",        # 12 -> int64
    "totaltime",         # 13 -> int64
    "turnaroundtime",    # 14 -> int64
    "referrer",          # 15
    "useragent",         # 16
    "versionid",         # 17
    "hostid",            # 18
    "sigv",              # 19
    "ciphersuite",       # 20
    "authtype",          # 21
    "endpoint",          # 22
    "tlsversion",        # 23
)

# Raw fields that are cast to int64 with the '-' -> 0 sentinel rule
# (reference: s3access/normalize.py:9-15, applied at :33,34,36,37).
INT_SENTINEL_FIELDS: tuple[str, ...] = (
    "bytessent",
    "objectsize",
    "totaltime",
    "turnaroundtime",
)

# Hive partition layout (reference: cmd/export.py:146).
PARTITION_COLS: tuple[str, ...] = (
    "bucket_name",
    "operation",
    "year",
    "month",
    "day",
    "hour",
)

# Row-group clustering columns (reference: cmd/export.py:148) — we express the
# same physical intent as a sortWithinPartitions before write, which yields
# parquet min/max locality for predicate pushdown.
ROW_GROUP_COLS: tuple[str, ...] = (
    "requester",
    "remoteip_int",
    "is_assumed_role",
    "is_user",
)

# Tokenizer regex, identical semantics to reference s3access/serializer.py:5:
# a field is a quoted group, a bracketed group, or a bare space-free token.
# We extract whole matches (idx 0) and strip the delimiters afterwards, which
# reproduces the reference's capture-group flattening including its corner
# cases: an empty quoted field '""' falls through to the bare-token arm (the
# two-char literal is kept), and runs of spaces collapse.
#
# Quantifiers are possessive (++): each char class excludes its own closing
# delimiter, so giving characters back can never turn a failed branch into a
# match — the backtracking state is pure overhead. Measured 1.9x faster in
# regexp_extract_all over the sf0.1 synthetic lines (1.19 s -> 0.62 s for
# the tokenize kernel); parity with the reference's backtracking regex is
# pinned by tests/test_parse_property.py against the real match_log.
TOKEN_REGEX = r'"[^"]++"|\[[^\]]++\]|[^ ]++'

# The reference strips the line before tokenizing (serializer.py:9,
# ``line.strip()``) — Python's strip removes every char where
# str.isspace() is true, a superset of both Spark's trim (space only) and
# Java's \s. This is the full BMP isspace set (verified exhaustively in
# tests), trimmed with ``btrim`` — a linear charset scan, measurably
# cheaper on the hot parse path than an anchored regexp_replace. Found by
# property-based testing: a line of '\x0c' tokenizes to [] in the
# reference but was one token without this.
PY_WHITESPACE_CHARS = (
    " \t\n\r\x0b\x0c"                  # ASCII whitespace
    "\x1c\x1d\x1e\x1f\x85\xa0"         # FS/GS/RS/US, NEL, NBSP
    "\u1680" + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"  # line/para sep, NNBSP, MMSP, ideographic
)

# Timestamp format of field 2, e.g. '06/Feb/2019:00:00:38 +0000'
# (reference: s3access/normalize.py:53).
REQUEST_DATETIME_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"

# Wall-clock prefix of field 2 (fixed-width, no offset) — used to derive
# year..second in the line's original offset, matching the reference's use
# of aware-datetime attributes (s3access/normalize.py:58-63).
WALL_CLOCK_FORMAT = "dd/MMM/yyyy:HH:mm:ss"

# ISO-8601 local-part format; the original offset is appended separately as
# '+HH:MM' to match datetime.isoformat() (reference: s3access/normalize.py:64),
# e.g. '2019-02-06T00:00:38+00:00'.
ISO_DATETIME_FORMAT = "yyyy-MM-dd'T'HH:mm:ss"


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


def access_log_schema() -> StructType:
    """The 35-column parsed-log schema (reference: s3access/schema.py:6-45)."""
    fields: list[StructField] = []
    for name in RAW_STRING_FIELDS:
        if name in INT_SENTINEL_FIELDS:
            fields.append(StructField(name, LongType(), True))
        else:
            fields.append(_s(name))
    fields += [
        StructField("ts", LongType(), True),          # epoch seconds
        StructField("year", LongType(), True),        # int64 in reference
        StructField("month", IntegerType(), True),
        StructField("day", IntegerType(), True),
        StructField("hour", IntegerType(), True),
        StructField("minute", IntegerType(), True),
        StructField("second", IntegerType(), True),
        StructField("datetime", StringType(), True),  # ISO-8601
        StructField("remoteip_int", LongType(), True),  # uint32 value space
        StructField("is_assumed_role", BooleanType(), True),
        StructField("is_user", BooleanType(), True),
    ]
    return StructType(fields)


ALL_COLUMNS: tuple[str, ...] = tuple(f.name for f in access_log_schema().fields)
