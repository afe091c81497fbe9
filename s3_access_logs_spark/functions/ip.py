"""IPv4 helpers as pure Column expressions.

The reference converts dotted-quad IPv4 to uint32 with python ``ipaddress``
(reference: s3access/normalize.py:70) and hard-crashes on IPv6 / '-'. Here
the conversion is a whole-stage-codegen'd lambda expression (no UDF), and
non-IPv4 input yields NULL by default (``strict=False``) — the documented
fix; ``strict=True`` keeps reference behaviour of refusing non-IPv4 (we
surface it as NULL rather than a crash either way, but strict skips the
guard so malformed digits raise a cast error).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OCTET = r"(25[0-5]|2[0-4]\d|[01]?\d?\d)"
IPV4_REGEX = rf"^({_OCTET}\.){{3}}{_OCTET}$"


def ipv4_to_long(col: Column | str, strict: bool = False) -> Column:
    """Dotted-quad string -> uint32 value in a LongType column.

    192.0.2.3 -> 3221225987.  Equivalent SQL (usable in the DuckDB oracle):
    ``a*16777216 + b*65536 + c*256 + d`` over split octets.
    """
    c = F.col(col) if isinstance(col, str) else col
    octets = F.transform(F.split(c, r"\."), lambda x: x.cast("long"))
    value = F.aggregate(
        octets, F.lit(0).cast("long"), lambda acc, x: acc * 256 + x
    )
    if strict:
        return value
    return F.when(c.rlike(IPV4_REGEX), value)


def long_to_ipv4(col: Column | str) -> Column:
    """Inverse of :func:`ipv4_to_long` (engine extension; not in reference)."""
    c = F.col(col) if isinstance(col, str) else col
    quad = F.concat_ws(
        ".",
        (c / 16777216).cast("long") % 256,
        (c / 65536).cast("long") % 256,
        (c / 256).cast("long") % 256,
        c % 256,
    )
    return F.when(c.isNotNull(), quad)


def cidr_range(cidr: str) -> tuple[int, int]:
    """CIDR block -> inclusive (lo, hi) uint32 bounds. '10.5.0.0/16' ->
    (168099840, 168165375). Plain Python so query builders and oracle SQL
    can embed identical literals."""
    base, _, bits = cidr.partition("/")
    prefix = int(bits) if bits else 32
    parts = [int(p) for p in base.split(".")]
    lo = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
    lo &= ~((1 << (32 - prefix)) - 1) & 0xFFFFFFFF
    hi = lo + (1 << (32 - prefix)) - 1
    return lo, hi


def ip_in_cidr(ip_int: Column | str, cidr: str) -> Column:
    """CIDR containment as an int-range predicate so parquet row-group
    min/max stats on ``remoteip_int`` can prune (the entire reason the
    reference materializes the int form, s3access/normalize.py:70). The
    bounds are plan-time literals — Catalyst pushes the BETWEEN straight
    into the parquet scan, no custom optimizer rule needed (SURVEY §4
    optional item b)."""
    lo, hi = cidr_range(cidr)
    c = F.col(ip_int) if isinstance(ip_int, str) else ip_int
    return c.between(F.lit(lo), F.lit(hi))
