#!/usr/bin/env python
"""Diagnose the driver-side gap between jobs for an IVF-family query:
run ann_ivf_lloyd's construction with (a) defaults, (b) whole-stage
codegen off (DIAGNOSIS ONLY — never shipped), and report construct
wall. If (b) is much faster, the gap is janino compilation of the
64-dim expression trees; if unchanged, it is Catalyst analysis.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
codegen = sys.argv[2] if len(sys.argv) > 2 else "true"

from wasaffi_spark.conf import recommended_builder  # noqa: E402

spark = (
    recommended_builder(master="local[32]", cpus=32, app_name="diag")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.codegen.wholeStage", codegen)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402

qs = entrymod.queries()
qs.update(entrymod.extra_queries())

# warm
spark.range(100).count()

for name in ["ann_ivf_lloyd", "ivf_recall_monitor"]:
    for i in range(2):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(
            f"codegen={codegen} {name} run{i}: construct={t1-t0:.2f}s "
            f"exec={t2-t1:.2f}s",
            flush=True,
        )
spark.stop()
