"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Each query is forced to full materialization with a noop write (no driver
collect bottleneck, no display cost). A warmup query absorbs JVM/codegen
startup so per-query numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from vectordb_cloud_spark.session import get_spark
    from vectordb_cloud_spark import queries as qmod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer reads + codegen
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    results: dict[str, float] = {}
    for name, fn in qmod.registry().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)

    total = round(sum(results.values()), 3)
    print(json.dumps({
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
