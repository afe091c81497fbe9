"""Parser unit tests: tokenizer corner cases, derived columns, and direct
parity against the reference's own tokenizer/transform run in-process
(reference: s3access/serializer.py, s3access/normalize.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from s3_access_logs_spark.operators.parse import parse_logs, tokenize

AWS_DOC_LINE = (
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be "
    "awsexamplebucket1 [06/Feb/2019:00:00:38 +0000] 192.0.2.3 "
    "arn:aws:iam::123456789012:user/alice 3E57427F3EXAMPLE "
    "REST.GET.VERSIONING - \"GET /awsexamplebucket1?versioning HTTP/1.1\" "
    "200 - 113 - 7 - \"-\" \"S3Console/0.4\" - AbCdEf SigV2 "
    "ECDHE-RSA-AES128-GCM-SHA256 AuthHeader "
    "awsexamplebucket1.s3.us-west-1.amazonaws.com TLSV1.1"
)

REFERENCE_PATH = Path("/root/reference")


def _tokens(spark, line: str) -> list[str]:
    df = spark.createDataFrame([(line,)], ["value"])
    return df.select(tokenize("value").alias("t")).collect()[0].t


def _parse_one(spark, line: str):
    df = spark.createDataFrame([(line,)], ["value"])
    return parse_logs(df).collect()[0]


class TestTokenizer:
    def test_aws_doc_line_has_24_fields(self, spark):
        assert len(_tokens(spark, AWS_DOC_LINE)) == 24

    def test_quoted_field_keeps_spaces(self, spark):
        toks = _tokens(spark, AWS_DOC_LINE)
        assert toks[8] == "GET /awsexamplebucket1?versioning HTTP/1.1"

    def test_bracketed_field_unwrapped(self, spark):
        toks = _tokens(spark, AWS_DOC_LINE)
        assert toks[2] == "06/Feb/2019:00:00:38 +0000"

    def test_empty_quoted_field_kept_literal(self, spark):
        # Reference quirk: [^"]+ is +, not *, so '""' falls through to the
        # bare-token arm and keeps its quotes (SURVEY §7 hard part 2).
        toks = _tokens(spark, 'a "" b')
        assert toks == ["a", '""', "b"]

    def test_consecutive_spaces_collapse(self, spark):
        toks = _tokens(spark, "a    b  c")
        assert toks == ["a", "b", "c"]

    def test_quoted_dash(self, spark):
        toks = _tokens(spark, 'x "-" y')
        assert toks == ["x", "-", "y"]


class TestDerivedColumns:
    def test_epoch_and_parts_utc(self, spark):
        row = _parse_one(spark, AWS_DOC_LINE)
        assert row.ts == 1549411238
        assert (row.year, row.month, row.day) == (2019, 2, 6)
        assert (row.hour, row.minute, row.second) == (0, 0, 38)
        assert row.datetime == "2019-02-06T00:00:38+00:00"

    def test_nonzero_offset_keeps_wall_clock_parts(self, spark):
        # Reference derives parts from the aware datetime (original offset),
        # while ts is absolute epoch (s3access/normalize.py:53-64).
        line = AWS_DOC_LINE.replace(
            "[06/Feb/2019:00:00:38 +0000]", "[07/Mar/2020:13:45:01 +0200]"
        )
        row = _parse_one(spark, line)
        assert row.hour == 13
        assert row.datetime == "2020-03-07T13:45:01+02:00"
        assert row.ts == 1583581501  # 11:45:01 UTC

    def test_int_sentinels(self, spark):
        row = _parse_one(spark, AWS_DOC_LINE)
        assert row.bytessent == 113
        assert row.objectsize == 0  # '-'
        assert row.totaltime == 7
        assert row.turnaroundtime == 0  # '-'

    def test_httpstatus_stays_string(self, spark):
        assert _parse_one(spark, AWS_DOC_LINE).httpstatus == "200"

    def test_remoteip_int(self, spark):
        assert _parse_one(spark, AWS_DOC_LINE).remoteip_int == 3221225987

    def test_ipv6_yields_null_not_crash(self, spark):
        line = AWS_DOC_LINE.replace("192.0.2.3", "2001:db8::2c:1")
        assert _parse_one(spark, line).remoteip_int is None

    def test_flags(self, spark):
        row = _parse_one(spark, AWS_DOC_LINE)
        assert row.is_user is True and row.is_assumed_role is False
        line = AWS_DOC_LINE.replace(
            "arn:aws:iam::123456789012:user/alice",
            "arn:aws:sts::1:assumed-role/r/user-sess",
        )
        row = _parse_one(spark, line)
        # compat quirk: 'user' substring sets is_user too
        assert row.is_user is True and row.is_assumed_role is True

    def test_malformed_line_yields_nulls(self, spark):
        row = _parse_one(spark, "too short")
        assert row.ts is None and row.requestdatetime is None


@pytest.mark.skipif(not REFERENCE_PATH.exists(), reason="reference not present")
class TestReferenceParity:
    """Run the reference's own tokenizer/transform in-process on the same
    lines and compare field-for-field (SURVEY §5 strategy 2)."""

    @pytest.fixture(autouse=True)
    def _ref(self):
        sys.path.insert(0, str(REFERENCE_PATH))
        from s3access.normalize import transform_item  # type: ignore
        from s3access.serializer import match_log  # type: ignore

        self.match_log = match_log
        self.transform_item = transform_item
        yield
        sys.path.remove(str(REFERENCE_PATH))

    LINES = [
        AWS_DOC_LINE,
        AWS_DOC_LINE.replace(
            "[06/Feb/2019:00:00:38 +0000]", "[31/Dec/2023:23:59:59 +0530]"
        ),
        AWS_DOC_LINE.replace('"GET /awsexamplebucket1?versioning HTTP/1.1"', '""'),
        'o b [01/Jan/2021:00:00:00 +0000] 1.2.3.4 - r REST.GET.OBJECT k "u" '
        "200 - - - - - - \"UA with  spaces\" v h SigV4 c a e t",
    ]

    def test_tokens_match_reference(self, spark):
        for line in self.LINES:
            assert _tokens(spark, line) == self.match_log(line), line

    def test_transform_matches_reference(self, spark):
        for line in self.LINES:
            ref = self.transform_item(self.match_log(line))
            row = _parse_one(spark, line).asDict()
            for key, expected in ref.items():
                got = row[key]
                if key == "ts":
                    expected = int(expected)
                assert got == expected, f"{key}: {got!r} != {expected!r} for {line}"


def test_whitespace_charset_is_exhaustive():
    """PY_WHITESPACE_CHARS must cover every BMP char Python's str.strip()
    removes — the tokenizer's btrim is only parity-correct if so."""
    from s3_access_logs_spark.schema import PY_WHITESPACE_CHARS

    ws = set(PY_WHITESPACE_CHARS)
    missing = [hex(c) for c in range(0x10000) if chr(c).isspace() and chr(c) not in ws]
    assert missing == []


def test_cidr_range_bounds():
    from s3_access_logs_spark.functions.ip import cidr_range

    assert cidr_range("10.5.0.0/16") == (168099840, 168165375)
    assert cidr_range("192.0.2.3") == (3221225987, 3221225987)  # /32 default
    # non-aligned base is masked down to the block start
    assert cidr_range("10.5.7.200/29") == (168101832, 168101839)
    assert cidr_range("0.0.0.0/0") == (0, 4294967295)
