"""Round-14 optimization equivalence harness: snapshot the EXACT output
of named queries() entries (normalized like tests/compare.py, then
sha256-hashed) so a restructured plan can be proven bit-identical to the
pre-change module before it ships (the q_spearman_corr r14 retrofit
protocol, generalized).

Usage:
  python scripts/snapshot_outputs_r14.py out.json name1 name2 ... \
      [--sf /root/testdata/sf0.1]

Writes {name: {"rows": n, "cols": [...], "sha256": hex}} to out.json.
Run once at the baseline commit and once after the change; diff the files.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from buskafkasparkstreaming_spark import get_spark  # noqa: E402
from tests.compare import _normalize  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    out_path, names = args[0], args[1:]
    spark = get_spark(app_name="bss-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    result: dict[str, dict] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        pdf = _normalize(df.toPandas())
        # stable byte form: CSV with full float precision
        payload = pdf.to_csv(index=False, float_format="%.17g").encode()
        result[name] = {
            "rows": len(pdf),
            "cols": list(pdf.columns),
            "sha256": hashlib.sha256(payload).hexdigest(),
        }
        print(name, result[name]["rows"], result[name]["sha256"][:16], flush=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
