"""Physical-plan inspection helpers.

The scale contract (SURVEY §7.5.5) is checkable from the formatted plan:
filters and column pruning must reach the parquet scan, small dims must
broadcast, and expressions should stay inside whole-stage codegen. These
helpers make those properties assertable in tests and observable in a
perf pass — the Spark analog of reading a DataFusion ``EXPLAIN``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanFacts:
    pushed_filters: list[str]
    read_schemas: list[str]
    broadcast_joins: int  # BroadcastHashJoin + BroadcastNestedLoopJoin
    sortmerge_joins: int
    codegen_stages: int  # distinct "codegen id" annotations
    python_eval_nodes: int
    text: str


def plan_facts(df: DataFrame) -> PlanFacts:
    text = formatted_plan(df)
    pushed = [
        ln.split(":", 1)[1].strip()
        for ln in text.splitlines()
        if ln.strip().startswith("PushedFilters:")
    ]
    schemas = [
        ln.split(":", 1)[1].strip()
        for ln in text.splitlines()
        if ln.strip().startswith("ReadSchema:")
    ]
    codegen_ids = {
        ln.split(":", 1)[1].strip()
        for ln in text.splitlines()
        if "codegen id :" in ln
    }
    return PlanFacts(
        pushed_filters=pushed,
        read_schemas=schemas,
        broadcast_joins=text.count("BroadcastHashJoin")
        + text.count("BroadcastNestedLoopJoin"),
        sortmerge_joins=text.count("SortMergeJoin"),
        codegen_stages=len(codegen_ids),
        python_eval_nodes=text.count("ArrowEvalPython") + text.count("BatchEvalPython"),
        text=text,
    )
