"""Non-finite hostile sweep: NaN/+Inf/-Inf injected into EVERY double
column of every table (and embedding components), then every declared
oracle pair is run on both engines and classified:

- MATCH        — hash-identical results (non-finite propagates the
                 same way on both engines, or the contract normalizes
                 it identically);
- BOTH_RAISE   — both engines loud (the lattice/witness guard family:
                 exact integer lattices cannot represent non-finite);
- SPARK_RAISES — Spark loud by name, oracle silent (the embeddings
                 family: the _finite_vec corpus check, same loud-wins
                 contract as the duplicate-id scan);
- DUCK_RAISES / DIVERGE — NOT allowed: a silent cross-engine split a
                 data refresh could trigger (the round-10 findings —
                 each got a pinned contract and a committed test).

Run per round like the fresh-seed fuzz pass:

    python tools/nan_sweep.py          # exit 0 = classification holds

The expected classes are pinned below; a query moving class fails the
sweep so new queries must declare their non-finite behavior
deliberately.
"""
from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SRC = "/root/testdata/sf0.001"

# every query expected NOT to hash-match on non-finite input, by class
EXPECTED = {
    # exact-lattice / witness guards — loud on BOTH engines
    "BOTH_RAISE": {
        "above_class_avg", "acctbal_deciles", "cube_order_stats",
        "hourly_gapfill", "hourly_interpolate", "lr_newton_steps",
        "moving_avg_7d", "pricing_summary", "tpch_q2_min_cost_supplier",
        "tpch_q22_idle_rich", "value_statistics",
        # embeddings + lattice both present
        "ann_ivf_topk", "embedding_quantize",
    },
    # _finite_vec corpus check — Spark loud by name, oracle silent
    "SPARK_RAISES": {
        "ann_lsh_topk", "cosine_topk", "embedding_near_dups",
        "semantic_clusters",
    },
}


def build_fixture(dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    doubles = {"customer": ["c_acctbal"], "supplier": ["s_acctbal"],
               "part": ["p_retailprice"], "orders": ["o_totalprice"],
               "lineitem": ["l_quantity", "l_extendedprice",
                            "l_discount", "l_tax"],
               "events": ["value"]}
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    import numpy as np
    for t in tables:
        tb = pq.read_table(f"{SRC}/{t}.parquet")
        for c in doubles.get(t, ()):
            v = tb[c].to_numpy(zero_copy_only=False).copy()
            idx = np.arange(len(v))
            v[idx % 13 == 0] = np.nan
            v[idx % 29 == 0] = np.inf
            v[idx % 31 == 0] = -np.inf
            tb = tb.set_column(tb.schema.get_field_index(c), c,
                               pa.array(v, pa.float64()))
        if t == "embeddings":
            emb = tb["embedding"].to_pylist()
            for i in range(0, len(emb), 13):
                if emb[i]:
                    emb[i][0] = float("nan")
            for i in range(0, len(emb), 29):
                if emb[i] and len(emb[i]) > 1:
                    emb[i][1] = float("inf")
            # keep the SOURCE element type: a hardcoded list<float32>
            # would silently narrow a float64 corpus, so the sweep
            # would no longer exercise production-precision values
            tb = tb.set_column(tb.schema.get_field_index("embedding"),
                               "embedding",
                               pa.array(emb,
                                        tb.schema.field("embedding").type))
        pq.write_table(tb, f"{dst}/{t}.parquet")


def main() -> None:
    import __spark_entry__ as em
    from spark_ext_spark.session import get_spark
    from tests.oracle_utils import compare_to_oracle, duck_connection

    d = tempfile.mkdtemp(prefix="nansweep_")
    build_fixture(d)
    spark = get_spark("nan-sweep", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(d)
    qs, oracles = em.queries(), em.oracle_sql()
    bad = []
    tally: dict[str, int] = {}
    for name in sorted(oracles):
        spark.catalog.clearCache()
        s_err = d_err = None
        # optimistic single execution: most queries MATCH, so try the
        # full compare first and only on failure probe each engine
        # separately to classify (self-review: the old probe-then-
        # compare shape ran every green Spark plan twice)
        try:
            compare_to_oracle(qs[name](spark, d), con, oracles[name])
            cls = "MATCH"
        except Exception:  # noqa: BLE001 — classify below
            try:
                qs[name](spark, d).collect()
            except Exception as e:  # noqa: BLE001
                s_err = f"{type(e).__name__}: {str(e)[:80]}"
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as e:  # noqa: BLE001
                d_err = f"{type(e).__name__}: {str(e)[:80]}"
            if s_err and d_err:
                cls = "BOTH_RAISE"
            elif s_err:
                cls = "SPARK_RAISES"
            elif d_err:
                cls = "DUCK_RAISES"
            else:
                cls = "DIVERGE"
        tally[cls] = tally.get(cls, 0) + 1
        expected = next((k for k, v in EXPECTED.items() if name in v),
                        "MATCH")
        if cls != expected:
            bad.append((name, expected, cls, s_err, d_err))
            print(f"{name}: expected {expected}, got {cls} "
                  f"(spark={s_err} duck={d_err})")
    print(f"RESULT {dict(sorted(tally.items()))} violations={len(bad)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
