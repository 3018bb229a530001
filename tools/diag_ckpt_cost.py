#!/usr/bin/env python
"""Diagnose the per-round driver cost of the graph-family iterative
chains (DIAGNOSIS ONLY — never shipped).

Builds a synthetic round-shaped chain (join + groupBy + window over a
~2k-row frame, localCheckpoint each round, R rounds) and times it
under combinations of:
  - AQE on/off
  - shuffle.partitions for the tiny frames
to attribute the ~0.6 s/round cost seen in knn_descent/graph_search.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F, Window  # noqa: E402
from wasaffi_spark.conf import recommended_builder  # noqa: E402

aqe = sys.argv[1] if len(sys.argv) > 1 else "true"
parts = sys.argv[2] if len(sys.argv) > 2 else None

b = recommended_builder(master="local[32]", cpus=32, app_name="diag-ckpt")
b = b.config("spark.ui.enabled", "false").config(
    "spark.ui.showConsoleProgress", "false"
).config("spark.sql.adaptive.enabled", aqe)
if parts:
    b = b.config("spark.sql.shuffle.partitions", parts)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sc = spark.sparkContext
tracker = sc.statusTracker()

df = spark.range(0, 2000, 1, 8).select(
    F.col("id").alias("src"),
    F.pmod(F.col("id") * 7919 + 13, F.lit(2000)).alias("dst"),
    (F.col("id") % 97).cast("double").alias("w"),
)

ROUNDS = 10
spark.range(100).count()  # warm

j0 = max(tracker.getJobIdsForGroup(None) or [0])
t0 = time.perf_counter()
cur = df.localCheckpoint(eager=True)
for r in range(ROUNDS):
    t_r = time.perf_counter()
    nxt = (
        cur.join(
            cur.select(F.col("src").alias("dst"), F.col("dst").alias("d2")),
            "dst",
        )
        .groupBy("src", "d2")
        .agg(F.min("w").alias("w"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("w").asc(), F.col("d2").asc())
            ),
        )
        .where(F.col("rk") <= 4)
        .select("src", F.col("d2").alias("dst"), "w")
    )
    cur = nxt.localCheckpoint(eager=True)
    print(f"round {r}: {time.perf_counter() - t_r:.3f}s", flush=True)
t1 = time.perf_counter()
j1 = max(tracker.getJobIdsForGroup(None) or [0])
print(
    f"aqe={aqe} parts={parts}: total {t1 - t0:.2f}s for {ROUNDS} rounds "
    f"({(t1 - t0) / ROUNDS:.3f}s/round), jobs={j1 - j0}",
    flush=True,
)
