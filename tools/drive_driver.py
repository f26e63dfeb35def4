"""Driver simulation: entry() smoke at sf0.001 + oracle hash-compare at sf0.01.

Set SPARK_GRAFT_ORACLE_SF_DIR to sweep the oracle compare at another
scale factor (e.g. /root/testdata/sf0.1) — queries green at sf0.01
but hash-failing at sf0.1 would reveal scale-dependent determinism
(sampling, quantiles, iteration counts) before a testdata refresh does.
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as em
from spark_ext_spark.session import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    # structs (pyspark Row is a tuple subclass) BEFORE lists
    if hasattr(v, "asDict"):
        return tuple(sorted((k, norm(x)) for k, x in v.asDict().items()))
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, float):
        return round(v, 6)
    return v


def canon(rows, cols):
    cols = sorted(cols)
    out = sorted((tuple(norm(r[c]) for c in cols) for r in rows), key=repr)
    return hashlib.sha256(repr(out).encode()).hexdigest()


def main():
    spark = get_spark("verify-driver",
                      master=os.environ.get("SPARK_GRAFT_MASTER",
                                            "local[8]"))
    spark.sparkContext.setLogLevel("ERROR")
    res = em.entry(spark)
    n = len(res.collect())
    print(f"ENTRY rows={n} schema={[f.name for f in res.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')")

    queries = em.queries()
    oracles = em.oracle_sql()
    only = sys.argv[1:]
    unknown = [n for n in only if n not in queries]
    if unknown:
        # a typo'd name must not silently produce a green empty run
        print(f"RESULT unknown query names: {unknown}")
        sys.exit(2)
    fails, errs = [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # caches accumulate across the sweep otherwise (shingle tables,
        # ANN assignment caches, ...) — clear like bench.py does
        spark.catalog.clearCache()
        if name not in oracles:
            try:
                sdf = fn(spark, SF01)
                srows = sdf.collect()
                # The REAL driver canonicalizes rows-only outputs too
                # (pandas sort_values over every column) — replay that
                # here so a nested result column crashes THIS preflight
                # instead of the driver window. Round 9 lost all
                # approx_user_stats evidence exactly this way: the old
                # .count()-only check stayed green while the driver's
                # canonicalizer died on an array<double> column.
                import pandas as pd
                pdf = pd.DataFrame([r.asDict() for r in srows],
                                   columns=sdf.columns)
                pdf.sort_values(list(pdf.columns), inplace=True)
                print(f"{name}: no_oracle rows={len(srows)} canon=ok")
            except Exception as e:
                errs.append(name)
                print(f"{name}: ERR {type(e).__name__}: {str(e)[:200]}")
            continue
        try:
            sdf = fn(spark, SF01)
            scols = sdf.columns
            srows = sdf.collect()
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = [dict(zip(ocols, r)) for r in ores.fetchall()]
            ok_rows = len(srows) == len(orows)
            ok_schema = sorted(scols) == sorted(ocols)
            ok_hash = ok_schema and canon(srows, scols) == canon(orows, ocols)
            status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
            if status == "FAIL":
                fails.append(name)
            print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
                  f"schema={ok_schema} hash={ok_hash}")
        except Exception as e:
            errs.append(name)
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:200]}")
    print(f"RESULT fails={fails} errs={errs}")
    # Committed evidence artifact, same convention as bench.py's
    # BENCH_local.json: full runs (no name filter) record the sweep so
    # per-round results beyond the driver's 50-query window are
    # inspectable from the repo, not just from session logs.
    if not only:
        # canonicalize the conf JSON so formatting variants of the same
        # config update one entry instead of accreting stale duplicates
        conf = json.dumps(
            json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF") or "{}"),
            sort_keys=True, separators=(",", ":"))
        key = f"{spark.sparkContext.master} conf={conf} sf={SF01}"
        path = os.path.join(os.path.dirname(__file__), "..",
                            "CORRECTNESS_local.json")
        try:
            with open(path) as f:
                doc = json.load(f)
        except FileNotFoundError:
            doc = {}
        except ValueError as e:
            # never silently wipe prior evidence — a truncated file
            # needs a human decision, not an empty dict
            raise SystemExit(
                f"{path} exists but is not valid JSON ({e}); fix or "
                f"delete it before recording new sweep evidence")
        # stamp the code state the sweep actually ran against — without
        # it an all-green re-run is byte-identical to the previous one
        # and the committed artifact cannot show it was refreshed
        # (round-9 verdict item 3: "sweep evidence doesn't cover the
        # final code" was undecidable from the artifact alone)
        try:
            import subprocess
            # the REPO root, not tools/: pathspecs below resolve
            # relative to -C, so anchoring at tools/ made them match
            # nothing and the -dirty marker could never fire (r11 find
            # — cell 1 of the r11 sweep ran on a dirty tree and
            # stamped clean)
            repo = os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))
            head = subprocess.run(
                ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or None
            # a sweep on uncommitted changes must not masquerade as
            # evidence for the stamped commit (self-review, round 10).
            # Scoped to behavior-affecting paths: the first cell of a
            # multi-config sweep WRITES this very artifact, which would
            # otherwise mark every later cell dirty
            if head and subprocess.run(
                    ["git", "-C", repo, "status", "--porcelain", "--",
                     "spark_ext_spark", "__spark_entry__.py", "bench.py",
                     "tools", "tests"],
                    capture_output=True, text=True, timeout=10,
            ).stdout.strip():
                head += "-dirty"
        except Exception:  # noqa: BLE001 — evidence must still record
            head = None
        doc[key] = {
            "n_queries": len(queries),
            "n_oracle": sum(1 for n in queries if n in oracles),
            "fails": fails,
            "errs": errs,
            "git_head": head,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, path)  # atomic: a killed run can't truncate
    spark.stop()
    sys.exit(1 if (fails or errs) else 0)


if __name__ == "__main__":
    main()
