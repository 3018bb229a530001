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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--skip", default=DEFAULT_SKIP)
    ap.add_argument("--cpus", type=int, default=8)
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


if __name__ == "__main__":
    main()
