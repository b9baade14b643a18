#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): isolate declared queries with
the noop sink, capture .explain('formatted') to plans/r06/, and time them.

Usage:
  python tools/profile_r06.py explain <before|after> [query ...]
  python tools/profile_r06.py time [-n N] <query ...>

Never used by the driver; bench.py stays the frozen measurement contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from read_comp_data_pipeline_spark.plans import queries as Q
from read_comp_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    return get_spark("profile_r06", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))


def main() -> None:
    mode = sys.argv[1]
    spark = _spark()
    all_q = Q.all_queries()
    if mode == "explain":
        tag = sys.argv[2]
        names = sys.argv[3:]
        outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = all_q[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")
    elif mode == "time":
        args = sys.argv[2:]
        n = 1
        if args and args[0] == "-n":
            n = int(args[1]); args = args[2:]
        for name in args:
            ts = []
            for _ in range(n):
                spark.sparkContext.setJobDescription(f"r06 profile: {name}")
                t0 = time.monotonic()
                df = all_q[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                ts.append(round(time.monotonic() - t0, 3))
            print(f"{name:32s} {ts}")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
