"""Root-cause probe for the minhash_lsh_dedup bench-pass variance (round-3/4
open item: pass walls [4.16, 7.12, 4.37] — median fine, spread ±3 s).

Runs N timed passes exactly like bench.py (warmup pass, release_cached
between passes) while instrumenting, per pass:

- wall time (the bench number);
- JVM GC time + collection-count delta from the GC MXBeans — in local mode
  the driver JVM hosts every executor thread, so this IS the query's GC;
- per-stage executorRunTime / jvmGcTime / shuffle bytes from the
  AppStatusStore REST-style stage list, windowed by pass submission time —
  distinguishes "one stage got slower" (plan/AQE) from "everything got
  slower" (GC / machine);
- Python worker process census (os walk of child pids) — a worker respawn
  shows as a census change.

Usage: PYTHONPATH=/root/repo python tools/minhash_probe.py [sf_dir] [passes]
Writes tools/minhash_probe_out.json and prints a per-pass table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gc_totals(spark) -> tuple[int, int]:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    ms = 0
    n = 0
    it = beans.iterator()
    while it.hasNext():
        b = it.next()
        ms += max(0, b.getCollectionTime())
        n += max(0, b.getCollectionCount())
    return ms, n


def python_workers() -> int:
    me = os.getpid()
    count = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) == me and "python" in parts[1]:
                count += 1
        except OSError:
            continue
    return count


def stage_window(spark, t0_ms: int, t1_ms: int) -> list[dict]:
    """Stages submitted inside [t0, t1] from the live AppStatusStore."""
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark._jvm
    empty = jvm.java.util.ArrayList()
    quantiles = spark.sparkContext._gateway.new_array(jvm.double, 0)
    out = []
    # Spark 4.x: stageList(statuses, details, withSummaries, quantiles, taskStatus)
    it = store.stageList(empty, False, False, quantiles, empty).iterator()
    while it.hasNext():
        s = it.next()
        sub = s.submissionTime()
        if not sub.isDefined():
            continue
        ts = sub.get().getTime()
        if not (t0_ms <= ts <= t1_ms):
            continue
        comp = s.completionTime()
        launch = s.firstTaskLaunchedTime()
        out.append(
            {
                "stage": s.stageId(),
                "name": s.name()[:60],
                "tasks": s.numCompleteTasks(),
                "run_ms": s.executorRunTime(),
                "cpu_ms": s.executorCpuTime() // 1_000_000,
                "gc_ms": s.jvmGcTime(),
                "sub_rel_ms": ts - t0_ms,
                "launch_delay_ms": (launch.get().getTime() - ts) if launch.isDefined() else None,
                "dur_ms": (comp.get().getTime() - ts) if comp.isDefined() else None,
                "shuffle_read_mb": round(s.shuffleReadBytes() / 1e6, 1),
                "shuffle_write_mb": round(s.shuffleWriteBytes() / 1e6, 1),
                "input_mb": round(s.inputBytes() / 1e6, 1),
                "out_rows": s.outputRecords(),
            }
        )
    return sorted(out, key=lambda d: d["stage"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from milan_spark.catalog import queries
    from milan_spark.session import get_spark, release_cached

    spark = get_spark("minhash_probe")
    build = queries()["minhash_lsh_dedup"]

    # same warmup discipline as bench.py
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_cached(spark)

    results = []
    for i in range(passes):
        gc0_ms, gc0_n = gc_totals(spark)
        w0 = python_workers()
        t0 = int(time.time() * 1000)
        start = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - start
        t1 = int(time.time() * 1000)
        gc1_ms, gc1_n = gc_totals(spark)
        w1 = python_workers()
        stages = stage_window(spark, t0, t1)
        release_cached(spark)
        results.append(
            {
                "pass": i,
                "wall_s": round(wall, 3),
                "gc_delta_ms": gc1_ms - gc0_ms,
                "gc_delta_collections": gc1_n - gc0_n,
                "py_workers_before": w0,
                "py_workers_after": w1,
                "stage_run_ms_total": sum(s["run_ms"] for s in stages),
                "stage_gc_ms_total": sum(s["gc_ms"] for s in stages),
                "n_stages": len(stages),
                "stages": stages,
            }
        )
        print(
            f"pass {i}: wall={wall:6.2f}s gc={gc1_ms - gc0_ms:5d}ms "
            f"({gc1_n - gc0_n} collections) stages={len(stages)} "
            f"stage_run={sum(s['run_ms'] for s in stages)/1000:.1f}s "
            f"workers {w0}->{w1}"
        )

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "minhash_probe_out.json"), "w") as f:
        json.dump(results, f, indent=1)
    walls = [r["wall_s"] for r in results]
    print(f"\nspread: {max(walls) - min(walls):.2f}s over {passes} passes")
    if max(walls) - min(walls) > 1.0:
        hi = max(results, key=lambda r: r["wall_s"])
        lo = min(results, key=lambda r: r["wall_s"])
        print(f"outlier pass {hi['pass']} vs fastest {lo['pass']}:")
        print(
            f"  gc {hi['gc_delta_ms']}ms vs {lo['gc_delta_ms']}ms | "
            f"stage_run {hi['stage_run_ms_total']}ms vs {lo['stage_run_ms_total']}ms | "
            f"stages {hi['n_stages']} vs {lo['n_stages']}"
        )


if __name__ == "__main__":
    main()
