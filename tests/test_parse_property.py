"""Property-based tokenizer/transform parity vs the reference implementation
run in-process (SURVEY §5 strategy 4). Hypothesis generates pathological
lines — unbalanced quotes, empty quoted fields, collapsed spaces, unicode —
and every one must tokenize identically to s3access/serializer.py:match_log.
"""

from __future__ import annotations

import string
import sys
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from s3_access_logs_spark.operators.parse import parse_logs, tokenize

REFERENCE_PATH = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE_PATH.exists(), reason="reference not present"
)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, str(REFERENCE_PATH))
    from s3access.normalize import transform_item  # type: ignore
    from s3access.serializer import match_log  # type: ignore

    yield match_log, transform_item
    sys.path.remove(str(REFERENCE_PATH))


def _tokenize_many(spark, lines: list[str]) -> list[list[str]]:
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    return [r.t for r in df.select(tokenize("value").alias("t")).collect()]


# Arbitrary printable text (no newlines — the line protocol is one record
# per line). Deliberately includes quotes, brackets and runs of spaces.
arbitrary_line = st.text(
    alphabet=string.printable.replace("\n", "").replace("\r", "")
    + "äöüß日本語",
    max_size=120,
)

# Well-formed token shapes (the three regex arms of serializer.py:5).
bare = st.text(
    alphabet=string.ascii_letters + string.digits + "-_.:/+=%~",
    min_size=1,
    max_size=12,
)
quoted = st.text(
    alphabet=string.ascii_letters + " /?.&=", min_size=1, max_size=20
).map(lambda s: f'"{s}"')
bracketed = st.text(
    alphabet=string.ascii_letters + string.digits + " /:+", min_size=1, max_size=20
).map(lambda s: f"[{s}]")
token = st.one_of(bare, quoted, bracketed)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(arbitrary_line, min_size=1, max_size=8))
def test_tokenizer_parity_on_arbitrary_text(spark, ref, lines):
    match_log, _ = ref
    got = _tokenize_many(spark, lines)
    for line, toks in zip(lines, got):
        assert toks == match_log(line), repr(line)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(token, min_size=1, max_size=30))
def test_tokenizer_parity_on_wellformed_tokens(spark, ref, tokens):
    match_log, _ = ref
    line = " ".join(tokens)
    assert _tokenize_many(spark, [line])[0] == match_log(line)


ipv4 = st.tuples(*[st.integers(0, 255)] * 4).map(
    lambda t: ".".join(map(str, t))
)
int_or_dash = st.one_of(st.just("-"), st.integers(0, 10**9).map(str))
word = st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=10)
requester = st.one_of(
    st.just("-"),
    word.map(lambda w: f"arn:aws:iam::123456789012:user/{w}"),
    word.map(lambda w: f"arn:aws:sts::123456789012:assumed-role/r/{w}"),
)
dt_field = st.datetimes(
    min_value=__import__("datetime").datetime(2001, 1, 1),
    max_value=__import__("datetime").datetime(2037, 12, 31),
).map(lambda d: d.strftime("[%d/%b/%Y:%H:%M:%S +0000]"))


@st.composite
def wellformed_line(draw):
    f = [
        draw(word),                         # bucketowner
        draw(word),                         # bucket_name
        draw(dt_field),                     # requestdatetime
        draw(ipv4),                         # remoteip
        draw(requester),                    # requester
        draw(word),                         # requestid
        "REST.GET.OBJECT",                  # operation
        draw(word),                         # key
        '"GET /k HTTP/1.1"',                # request_uri
        draw(st.sampled_from(["200", "403", "404", "500"])),  # httpstatus
        draw(word),                         # errorcode
        draw(int_or_dash),                  # bytessent
        draw(int_or_dash),                  # objectsize
        draw(int_or_dash),                  # totaltime
        draw(int_or_dash),                  # turnaroundtime
        draw(word),                         # referrer
        '"agent text"',                     # useragent
        draw(word),                         # versionid
        draw(word),                         # hostid
        "SigV4",                            # sigv
        draw(word),                         # ciphersuite
        "AuthHeader",                       # authtype
        draw(word),                         # endpoint
        "TLSV1.2",                          # tlsversion
    ]
    return " ".join(f)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(wellformed_line(), min_size=1, max_size=6))
def test_transform_parity_on_wellformed_lines(spark, ref, lines):
    match_log, transform_item = ref
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    rows = parse_logs(df).collect()
    for line, row in zip(lines, rows):
        expected = transform_item(match_log(line))
        got = row.asDict()
        for key, exp in expected.items():
            val = got[key]
            if key == "ts":
                exp = int(exp)  # float->int64 truncation (cmd/export.py:143)
            assert val == exp, f"{key}: {val!r} != {exp!r} for {line!r}"
