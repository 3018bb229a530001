"""Aggregated query/oracle catalog for the extension operators
(dedup, similarity search, text analysis, multimodal).

Populated by the operator modules as they are implemented; kept separate
from :mod:`wasaffi_spark.plans.relational` so the driver contract in
``__spark_entry__`` just merges the two dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
