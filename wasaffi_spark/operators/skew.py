"""Skew-resistant joins via deterministic salting.

At 100 TB a handful of hot keys (a viral document's dedup bucket, a bot
user's events) can put one shuffle partition hours behind the rest. AQE's
skew-join splitting handles sort-merge joins automatically; explicit
salting remains the tool when the skewed side feeds an *aggregation* or
when the small side is replicable.

``salted_join`` is semantically identical to a plain equi-join: the big
side gets a **row-level** salt (hash of the key columns *plus* a per-row
id, pmod n_salts) and the small side is replicated n_salts times (explode
of a literal range), so every (key, salt) pair finds its match. The salt
must NOT be a function of the key alone — a hot key hashed by itself
lands every one of its rows on one salt value, defeating the spread; the
per-row component is what scatters a single hot key across n_salts
shuffle partitions. The small side grows ×n_salts — choose n_salts ≈
(hot-key rows / target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Result is row-identical to ``big.join(small, on, how)`` for inner and
    left joins (the replicated side never produces extra matches: each
    big row carries exactly one salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    # ROW-level salt, not a function of the key: a hot key hashed alone
    # would land every one of its rows on a single salt value, defeating
    # the whole point. Any per-row value works; the id keeps it cheap.
    salted_big = big.withColumn(
        SALT_COL,
        F.pmod(
            F.hash(*[F.col(c) for c in on], F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated_small, on=[*on, SALT_COL], how=how).drop(
        SALT_COL
    )


def salted_count_by_key(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial count on
    (key, salt) — spreading a hot key over n_salts reducers — then final
    sum on key. Identical result to ``groupBy(key).count()``."""
    salt = F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts))
    return (
        df.withColumn(SALT_COL, salt)
        .groupBy(key, SALT_COL)
        .agg(F.count("*").alias("partial"))
        .groupBy(key)
        .agg(F.sum("partial").alias("cnt"))
    )
