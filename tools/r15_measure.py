"""Round-14 optimization measurement harness.

For every registry + library query: time (a) driver-side DataFrame
construction (plan build, any bounded collects inside the query fn) and
(b) the noop-sink execution, count Spark jobs triggered during each, and
dump `.explain("formatted")` to plans/r15/<name>_<tag>.txt.

Usage: python tools/r15_measure.py <tag> [sf_dir] [name ...]
  tag: "before" / "after" (file suffix in plans/r15/)
  sf_dir: default /root/testdata/sf0.1
  name...: restrict to these queries (default: all)
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT_DIR = Path(__file__).resolve().parents[1] / "plans" / "r15"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    from vectordb_cloud_spark import queries as qmod
    from vectordb_cloud_spark.session import get_spark

    spark = get_spark("r15-measure")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    # warmup (JVM, codegen, parquet footers)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def jobs_in(group: str, thunk):
        sc.setJobGroup(group, group)
        t0 = time.time()
        out = thunk()
        dt = time.time() - t0
        n = len(tracker.getJobIdsForGroup(group) or [])
        sc.setJobGroup("idle", "idle")
        return out, dt, n

    fns = dict(qmod.registry())
    fns.update(qmod.library())
    rows = []
    for name, fn in fns.items():
        if only and name not in only:
            continue
        # warmup call: absorbs lazy fixture builds/caches so the measured
        # numbers are steady-state (same convention as bench.py)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _, t_build, j_build = jobs_in(
            f"{name}-fn-{tag}", lambda: fn(spark, sf_dir))
        df = fn(spark, sf_dir)
        _, t_exec, j_exec = jobs_in(
            f"{name}-exec-{tag}",
            lambda: df.write.format("noop").mode("overwrite").save())
        plan = _explain(df)
        (OUT_DIR / f"{name}_{tag}.txt").write_text(plan)
        n_ex = plan.count("Exchange")
        rows.append({
            "name": name,
            "build_s": round(t_build, 3),
            "exec_s": round(t_exec, 3),
            "total_s": round(t_build + t_exec, 3),
            "jobs_build": j_build,
            "jobs_exec": j_exec,
            "exchanges": n_ex,
        })
        print(f"{name:34s} build={t_build:6.2f}s exec={t_exec:6.2f}s "
              f"jobs(fn/exec)={j_build}/{j_exec} exch={n_ex}", flush=True)

    rows.sort(key=lambda r: -r["total_s"])
    (OUT_DIR / f"measure_{tag}.json").write_text(json.dumps(rows, indent=1))
    print("\ntop by total:")
    for r in rows[:20]:
        print(f"  {r['total_s']:6.2f}s  {r['name']}  (build {r['build_s']}, "
              f"exec {r['exec_s']}, jobs {r['jobs_build']}/{r['jobs_exec']}, "
              f"exch {r['exchanges']})")


if __name__ == "__main__":
    main()
