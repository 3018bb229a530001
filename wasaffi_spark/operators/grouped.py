"""Grouped custom aggregation (UDAF-equivalent) and Python UDTF.

The reference's factory only ever returns scalar functions
(``RegisterFunction::Scalar``, /root/reference/wasmedge_factory/src/lib.rs:63);
SURVEY §2C marks UDAF/UDTF as the natural Spark extensions via
``applyInPandas`` and Python UDTF. This module provides both:

- :func:`grouped_median` — an exact per-group median through Arrow-batched
  ``applyInPandas`` (the UDAF escape hatch: arbitrary per-group Python
  over whole groups, shuffled once on the group key).
- :func:`register_split_udtf` — a Python UDTF (Spark 3.5+) exploding text
  into tokens with positions, registered for SQL use.

Scale: ``applyInPandas`` shuffles on the grouping key and hands each
group to one worker — group sizes must fit a worker's memory (fine for
per-key stats; NOT for a whole-corpus group). The UDTF is per-row,
embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_median(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "median"
) -> DataFrame:
    """Exact per-group median via ``applyInPandas``.

    numpy's linear-interpolation percentile matches ANSI
    ``percentile_cont(0.5)`` (the DuckDB oracle) exactly.
    The function is closure-inlined → shipped by value (executors don't
    need this package).
    """
    schema = f"{group_col} long, {out_col} double"

    def median_of_group(pdf):
        import numpy as np
        import pandas as pd

        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                out_col: [float(np.percentile(pdf[value_col].to_numpy(), 50))],
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        median_of_group, schema=schema
    )


def register_split_udtf(spark, name: str = "split_tokens"):
    """Register a Python UDTF: text → (pos, token) rows.

    ≙ the table-function surface DataFusion exposes as UDTFs; per-row
    lateral expansion, usable from SQL:
    ``SELECT t.* FROM docs, LATERAL split_tokens(text) t``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.split()):
                    yield i, tok

    spark.udtf.register(name, SplitTokens)
    return SplitTokens
