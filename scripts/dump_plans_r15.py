"""Dump `.explain("formatted")` for named queries() entries into a
directory — the round-15 plan-evidence generator (no timed reps, plan
only). Usage:
  python scripts/dump_plans_r15.py <outdir> <suffix> name1 name2 ...
Writes <outdir>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from buskafkasparkstreaming_spark import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bss-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
