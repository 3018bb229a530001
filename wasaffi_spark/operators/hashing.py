"""Shared deterministic-hash building blocks.

Every deterministic sampling/sharding/sketch operator in this package
buckets rows by an md5-hex prefix; the prefix→integer step lives here so
the idiom (and its DuckDB twin ``('0x' || substr(md5(...), 1, N))::bigint``)
has one Python home. The CONCATENATION that feeds md5 deliberately stays
at each call site: it is interpolated verbatim into that operator's SQL
oracle, so changing it is an oracle-breaking event local to the operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_int(h: Column, hex_chars: int) -> Column:
    """First ``hex_chars`` hex digits of an md5-hex column as a bigint
    (4 bits per char; keep ≤ 15 chars to stay inside bigint).
    DuckDB twin: ``('0x' || substr(h, 1, hex_chars))::bigint``."""
    return F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("bigint")
