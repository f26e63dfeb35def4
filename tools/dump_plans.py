"""Dump `.explain("formatted")` for named queries to files:

    python tools/dump_plans.py OUTDIR SUFFIX QUERY [QUERY ...]

writes OUTDIR/<query>_<SUFFIX>.txt for each query (planned at sf0.001,
same as tools/plan_audit.py). Used to commit the before/after plan
evidence for optimization rounds.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as em
    from spark_ext_spark.session import get_spark

    spark = get_spark("plan-dump", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()
    for name in names:
        df = queries[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
