"""Declarative data-quality expectations — the validation gate a
production pipeline runs before promoting a snapshot (the
Deequ/Great-Expectations shape, re-expressed as pure Spark SQL plans).

Beyond-reference extension (SURVEY §7.6; the reference engine has no
data-quality surface). A rule set is a list of dicts:

    {"name": "orderkey_not_null", "kind": "not_null",  "column": "o_orderkey"}
    {"kind": "range",           "column": ..., "min": ..., "max": ...}
    {"kind": "accepted_values", "column": ..., "values": [...]}
    {"kind": "regex_match",     "column": ..., "pattern": r"..."}
    {"kind": "unique",          "column": ...}
    {"kind": "referential",     "column": ..., "ref": <DataFrame>, "ref_column": ...}

and the report is one row per rule: ``(rule, kind, column,
n_violations, n_checked, passed)``.

Spark-first shape, built for 100 TB:

- every IN-ROW rule (not_null / range / accepted_values / regex_match)
  compiles into ONE conditional-sum aggregate over a single scan of the
  table — adding rules adds expressions, not passes. The wide 1-row
  aggregate is exploded to the long report via an array-of-structs
  ``inline`` (no shuffle beyond the aggregate's own partial-merge).
- ``unique`` rules each need a groupBy on their key (inherent — a
  uniqueness check IS a shuffle on that key); violations = Σ(cnt − 1),
  i.e. the number of surplus copies.
- ``referential`` rules are LEFT ANTI equi-joins against the dimension
  frame — Catalyst/AQE broadcasts small dims; NULL foreign keys are
  not orphans (SQL semantics: NULL FK is exempt, count it with a
  not_null rule if required).

Everything stays in the plan — no driver-side collect; the report
DataFrame is O(rules) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation(rule: dict) -> Column:
    col = F.col(rule["column"])
    kind = rule["kind"]
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        bad = F.lit(False)
        if "min" in rule:
            bad = bad | (col < F.lit(rule["min"]))
        if "max" in rule:
            bad = bad | (col > F.lit(rule["max"]))
        # NULLs are exempt (pair with not_null to forbid them)
        return F.coalesce(bad, F.lit(False))
    if kind == "accepted_values":
        return F.coalesce(~col.isin(*rule["values"]), F.lit(False))
    if kind == "regex_match":
        return F.coalesce(
            ~col.cast("string").rlike(rule["pattern"]), F.lit(False)
        )
    raise ValueError(f"expectations: unknown in-row rule kind {kind!r}")


def _rule_name(rule: dict) -> str:
    return rule.get("name", f"{rule['column']}_{rule['kind']}")


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → ``(rule, kind, col_name,
    n_violations, n_checked, passed)``, one row per rule, in the
    caller's rule order (each piece carries the rule's original index
    and the union is sorted on it — review finding r6: the evaluation
    itself groups by rule KIND, so without the index the output order
    would be all in-row rules, then unique, then referential). See
    module docstring for the rule grammar and plan shape."""
    if not rules:
        raise ValueError(
            "expectations_report: empty rule set (a config-driven caller "
            "with no rules for this table should skip the audit, not run "
            "an empty one)"
        )
    inrow = [
        r
        for r in rules
        if r["kind"] in ("not_null", "range", "accepted_values", "regex_match")
    ]
    uniques = [r for r in rules if r["kind"] == "unique"]
    refs = [r for r in rules if r["kind"] == "referential"]
    known = {id(r) for r in inrow + uniques + refs}
    unknown = [r for r in rules if id(r) not in known]
    if unknown:
        raise ValueError(
            f"expectations: unknown rule kind {unknown[0]['kind']!r}"
        )

    rule_ix = {id(r): i for i, r in enumerate(rules)}
    pieces: list[DataFrame] = []
    if inrow:
        aggs = [
            F.sum(F.when(_violation(r), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_v{i}")
            for i, r in enumerate(inrow)
        ]
        wide = df.agg(F.count("*").cast("bigint").alias("_n"), *aggs)
        entries = F.array(
            *[
                F.struct(
                    F.lit(rule_ix[id(r)]).alias("_ix"),
                    F.lit(_rule_name(r)).alias("rule"),
                    F.lit(r["kind"]).alias("kind"),
                    F.lit(r["column"]).alias("col_name"),
                    F.col(f"_v{i}").alias("n_violations"),
                    F.col("_n").alias("n_checked"),
                )
                for i, r in enumerate(inrow)
            ]
        )
        pieces.append(wide.select(F.inline(entries)))
    for r in uniques:
        col = r["column"]
        per_key = (
            df.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count("*").alias("_c"))
        )
        pieces.append(
            per_key.agg(
                F.lit(rule_ix[id(r)]).alias("_ix"),
                F.lit(_rule_name(r)).alias("rule"),
                F.lit("unique").alias("kind"),
                F.lit(col).alias("col_name"),
                F.coalesce(
                    F.sum(F.when(F.col("_c") > 1, F.col("_c") - 1)), F.lit(0)
                )
                .cast("bigint")
                .alias("n_violations"),
                F.coalesce(F.sum("_c"), F.lit(0))
                .cast("bigint")
                .alias("n_checked"),
            )
        )
    for r in refs:
        col, ref, ref_col = r["column"], r["ref"], r["ref_column"]
        fk = df.select(F.col(col)).where(F.col(col).isNotNull())
        # one pass over the fact side: LEFT join the distinct key set and
        # count total + misses in the same aggregate (a separate
        # anti-join leg would scan the fact table twice)
        dim = (
            ref.select(F.col(ref_col).alias(col))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        pieces.append(
            fk.join(dim, col, "left").agg(
                F.lit(rule_ix[id(r)]).alias("_ix"),
                F.lit(_rule_name(r)).alias("rule"),
                F.lit("referential").alias("kind"),
                F.lit(col).alias("col_name"),
                F.coalesce(F.sum(F.when(F.col("_hit").isNull(), 1)), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
                F.count("*").cast("bigint").alias("n_checked"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return (
        out.orderBy("_ix")
        .drop("_ix")
        .withColumn("passed", F.col("n_violations") == 0)
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l_diverse: int = 2,
) -> DataFrame:
    """Privacy-release audit — k-anonymity (Sweeney 2002) and optional
    l-diversity (Machanavalli et al. 2007) over a table about to leave
    the trust boundary: every row must share its quasi-identifier
    combination with ≥ k−1 others, and (if ``sensitive_col`` is given)
    each equivalence class must carry ≥ ``l_diverse`` distinct
    sensitive values — the companion gate to PII redaction
    (``text.redact_pii``): redaction removes direct identifiers, this
    audits the INDIRECT ones.

    One groupBy on the quasi-identifier tuple (the inherent shuffle —
    the audit IS that aggregation), then a 1-row summary:
    ``(n_rows, n_classes, min_class_size, n_violating_classes,
    n_violating_rows, k_anonymous[, min_l, l_diverse_ok])``. Rows with
    any NULL quasi-identifier form their own class per SQL groupBy
    semantics (NULLs group together) — deliberate: suppressed values
    are still a disclosure class.
    """
    aggs = [F.count("*").alias("_c")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("_l"))
    per_class = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out_aggs = [
        F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("_c").cast("bigint").alias("min_class_size"),
        F.coalesce(F.sum(F.when(F.col("_c") < k, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_violating_classes"),
        F.coalesce(F.sum(F.when(F.col("_c") < k, F.col("_c"))), F.lit(0))
        .cast("bigint")
        .alias("n_violating_rows"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("_l").cast("bigint").alias("min_l"))
    rep = per_class.agg(*out_aggs).withColumn(
        "k_anonymous", F.col("n_violating_classes") == 0
    )
    if sensitive_col is not None:
        rep = rep.withColumn(
            "l_diverse_ok", F.col("min_l") >= F.lit(l_diverse)
        )
    return rep


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-level dataset profile — the summary a data catalog keeps
    per snapshot: for every column, row/null counts, exact distinct
    count, and lexicographic min/max rendered as strings (one uniform
    schema across types). The profiling companion of
    :func:`expectations_report`: expectations judge, this describes.

    ONE aggregate over ONE scan regardless of column count — every
    measure is a conditional/distinct aggregate expression, exploded
    to the long report via the same array-of-structs ``inline`` trick.
    ``count_distinct`` is exact (the oracle-able form); at 100 TB swap
    those expressions for ``approx_count_distinct`` — same report
    schema, documented tolerance. Min/max stringification uses plain
    CAST, so the values are engine-portable (no float formatting: 
    profile numeric columns through their natural string forms).
    """
    cols = columns or df.columns
    n = F.count("*").cast("bigint")
    aggs: list[Column] = [n.alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_null{i}")
        )
        aggs.append(F.count_distinct(col).cast("bigint").alias(f"_nd{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_min{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max{i}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null{i}").alias("n_null"),
                F.col(f"_nd{i}").alias("n_distinct"),
                F.col(f"_min{i}").alias("min_str"),
                F.col(f"_max{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.inline(entries))
