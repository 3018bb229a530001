#!/usr/bin/env python
"""Experiment: does flipping every localCheckpoint(eager=True) to
eager=False (lazy lineage cut — same plans, same values, but the
materialization happens inside the consuming job instead of a blocking
driver-sequenced job) speed up the graph-family chains at bench scale?

Monkeypatches DataFrame.localCheckpoint; prints wall times for the
named queries with eager honored vs forced-lazy. Diagnosis only.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from wasaffi_spark.conf import recommended_builder  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
names = sys.argv[2:] or ["knn_descent", "graph_search_topk", "graph_recall_monitor"]

spark = (
    recommended_builder(master="local[32]", cpus=32, app_name="diag-lazy")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402

qs = entrymod.queries()
qs.update(entrymod.extra_queries())
spark.range(100).count()

orig = DataFrame.localCheckpoint


def lazy_ckpt(self, eager=True):
    return orig(self, eager=False)


def no_ckpt(self, eager=True):
    return self


MODES = {"eager": orig, "lazy": lazy_ckpt, "none": no_ckpt}

for name in names:
    for mode in ("eager", "none", "eager", "none"):
        DataFrame.localCheckpoint = MODES[mode]
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(
            f"{name} [{mode}]: construct={t1-t0:.2f}s exec={t2-t1:.2f}s "
            f"total={t2-t0:.2f}s",
            flush=True,
        )
DataFrame.localCheckpoint = orig
spark.stop()
