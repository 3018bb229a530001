#!/usr/bin/env python
"""Sweep every declared+extra query's physical plan for the guide's
anti-pattern signatures (§7.2): BatchEvalPython (row-at-a-time UDF),
CartesianProduct / BroadcastNestedLoopJoin, SortMergeJoin where a side
is tiny, Exchange count, and parquet scans without pushed filters.

Heavy controller queries (eager collect chains) can be skipped with
--skip to keep the sweep fast; they are profiled separately.

Usage: python tools/plan_audit.py [--sf DIR] [--skip name,name,...]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_SKIP = (
    "snapshot_upgrade,index_maintenance_policy,policy_applied,"
    "drift_policy_applied,graph_drift_applied,graph_policy_applied,"
    "ivf_retrain_delta,graph_refresh,graph_recall_monitor,"
    "graph_maintained_search,ivf_recall_monitor,graph_search_topk,"
    "graph_insert,knn_descent,ann_ivf_lloyd,ivf_append,"
    "ivf_maintained_topk,graph_delete,label_propagation,prototype_prune"
)


def _seq(jseq):
    """Iterate a Scala Seq via py4j."""
    return [jseq.apply(i) for i in range(jseq.size())]


def audit_exchanges(df) -> list[str]:
    """Census of Exchange nodes (VERDICT r13 #8 — the anti-pattern
    class the regex sweep cannot see): for every ShuffleExchangeExec in
    the pre-AQE physical plan, report

    - DROPPED-ABOVE: exchange output attributes that the DIRECT parent
      provably discards — only checked when the parent is a Project or
      a hash/sort Aggregate, the two operator classes whose output is
      exactly their expression list (everything else passes child
      columns through implicitly, so a one-level reference test would
      lie). A hit means columns crossed the network only to be thrown
      away — the guide §2.3 "project before the exchange" miss.
    - PAYLOAD: array/string/binary/struct columns riding the exchange —
      byte-weight evidence for a manual review, not a verdict (a score
      join legitimately shuffles its vectors).

    Returns human-readable flag lines (empty = clean)."""
    plan = df._jdf.queryExecution().sparkPlan()
    flags: list[str] = []

    def attr_ids(attrset):
        return {a.exprId().id() for a in _seq(attrset.toSeq())}

    def walk(node, parent):
        cls = node.getClass().getSimpleName()
        if "ShuffleExchangeExec" in cls:
            out_attrs = _seq(node.output())
            wide = [
                f"{a.name()}:{a.dataType().simpleString()}"
                for a in out_attrs
                if any(
                    t in a.dataType().simpleString()
                    for t in ("array", "string", "binary", "struct")
                )
            ]
            if wide:
                flags.append(
                    f"PAYLOAD exchange carries {len(out_attrs)} cols "
                    f"incl {wide[:6]}"
                )
            if parent is not None:
                pcls = parent.getClass().getSimpleName()
                if pcls in (
                    "ProjectExec",
                    "HashAggregateExec",
                    "ObjectHashAggregateExec",
                    "SortAggregateExec",
                ):
                    used = attr_ids(parent.references())
                    dropped = [
                        a.name()
                        for a in out_attrs
                        if a.exprId().id() not in used
                    ]
                    if dropped:
                        flags.append(
                            f"DROPPED-ABOVE {pcls} discards "
                            f"{dropped[:8]} right above an exchange"
                        )
        for ch in _seq(node.children()):
            walk(ch, node)

    walk(plan, None)
    return flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--skip", default=DEFAULT_SKIP)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument(
        "--exchanges", action="store_true",
        help="per-Exchange dropped-column/payload census (py4j walk)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    from wasaffi_spark.conf import recommended_builder

    spark = (
        recommended_builder(
            master=f"local[{args.cpus}]", cpus=args.cpus, app_name="plan-audit"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs.update(entrymod.extra_queries())
    names = args.queries or [n for n in qs if n not in skip]

    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, args.sf)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            continue
        dt = time.perf_counter() - t0
        flags = []
        n_ex = len(re.findall(r"\bExchange\b", plan))
        for pat, label in [
            (r"BatchEvalPython", "BatchEvalPython"),
            (r"ArrowEvalPython", "ArrowEvalPython"),
            (r"CartesianProduct", "CartesianProduct"),
            (r"BroadcastNestedLoopJoin", "BNLJoin"),
            (r"SortMergeJoin", "SortMergeJoin"),
            (r"ShuffledHashJoin", "ShuffledHashJoin"),
            (r"InMemoryTableScan", "InMemoryScan"),
        ]:
            k = len(re.findall(pat, plan))
            if k:
                flags.append(f"{label}x{k}")
        # parquet scans without pushed filters but WITH a filter above
        scans = len(re.findall(r"Scan parquet", plan))
        nofilter = len(re.findall(r"PushedFilters: \[\]", plan))
        print(
            f"{name}: construct={dt:.2f}s Exchange x{n_ex} scans={scans} "
            f"nopush={nofilter} {' '.join(flags)}",
            flush=True,
        )
        if args.exchanges:
            try:
                for line in audit_exchanges(df):
                    print(f"  {name}: {line}", flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"  {name}: exchange-audit ERROR {exc}", flush=True)


if __name__ == "__main__":
    main()
