"""Per-query profiling harness (guide §1) — NOT the driver bench.

Decomposes each query's wall time into:
  build   — time for ``queries()[name](spark, sf_dir)`` (driver-side Python,
            collects, eager localCheckpoints)
  plan    — time to force analysis+optimization (``df.explain`` to devnull)
  exec    — noop-sink write of the already-built, already-planned DataFrame
  jobs    — Spark jobs launched across build+exec (statusTracker delta)

Usage: python bench_extra.py [query ...]    (default: all BENCH_QUERIES)
Writes bench_extra_result.json with the per-query map.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or BENCH_QUERIES

    import __spark_entry__ as E
    from alibi_detect_spark.session import get_spark

    spark = get_spark(
        "adspark-bench-extra", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(0, 1_000_000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    qs = E.queries()
    tracker = spark.sparkContext.statusTracker
    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        j0 = len(tracker().getJobIdsForGroup(None) or [])
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        t1 = time.monotonic()
        with contextlib.redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t2 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.monotonic()
        j1 = len(tracker().getJobIdsForGroup(None) or [])
        out[name] = {
            "build": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec": round(t3 - t2, 3),
            "total": round(t3 - t0, 3),
            "jobs": j1 - j0,
        }
        print(
            f"{name:32s} total={out[name]['total']:7.3f} build={out[name]['build']:7.3f}"
            f" plan={out[name]['plan']:6.3f} exec={out[name]['exec']:7.3f} jobs={out[name]['jobs']}",
            file=sys.stderr,
        )
    spark.sparkContext.setJobDescription(None)
    out_name = os.environ.get("SPARK_GRAFT_PROFILE_OUT", "bench_extra_result.json")
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name), "w"
    ) as fh:
        json.dump(out, fh, indent=1)
    tot = sum(v["total"] for v in out.values())
    print(json.dumps({"queries": len(out), "sum_sec": round(tot, 3)}))


if __name__ == "__main__":
    main()
