"""Round-14 optimization profiler: per-query wall time (2 runs: warm-up +
steady) and SPARK JOB COUNT, the two numbers that tell overhead-bound
queries (many tiny jobs) from compute-bound ones (few jobs, long stages).

Usage: python scripts/profile_r14.py name1 name2 ...
       python scripts/profile_r14.py --explain plans/r14 name1 ...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from buskafkasparkstreaming_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    if args and args[0] == "--explain":
        explain_dir = args[1]
        args = args[2:]
        os.makedirs(explain_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bss-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    print(f"{'query':40s} {'t1':>7s} {'t2':>7s} {'t3':>7s} {'jobs2':>6s}")
    for name in args:
        fn = qs[name]
        times = []
        njobs = 0
        for i in range(3):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
            if i == 1:
                tracker = sc.statusTracker()
                njobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        if explain_dir is not None:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        print(
            f"{name:40s} {times[0]:7.3f} {times[1]:7.3f} {times[2]:7.3f}"
            f" {njobs:6d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
