"""zorder_key / source_cap_sample / quantize_embeddings unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ext_spark.functions import zorder_key
from spark_ext_spark.llm.similarity import quantize_embeddings
from spark_ext_spark.llm.splits import source_cap_sample


def test_zorder_interleave_golden(spark):
    # a=0b11, b=0b01 → even bits from a, odd from b → 0b0111 = 7
    # a=0b10, b=0b11 → a bits at 0,2 = 0,1; b bits at 1,3 = 1,1 → 0b1110
    df = spark.createDataFrame([(3, 1), (2, 3), (0, 0), (65535, 65535)],
                               "a long, b long")
    got = [r["z"] for r in
           df.select(zorder_key("a", "b", bits=16).alias("z")).collect()]
    assert got[0] == 0b0111
    assert got[1] == 0b1110
    assert got[2] == 0
    assert got[3] == (1 << 32) - 1  # all 32 bits set


def test_zorder_locality(spark):
    """Nearby (a, b) points get nearby z-values more often than random:
    the defining property that makes min/max pruning work."""
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = {(r["a"], r["b"]): r["z"] for r in
         df.select("a", "b", zorder_key("a", "b", bits=4).alias("z"))
         .collect()}
    # z is a bijection on the 8-bit space
    assert sorted(z.values()) == list(range(256))
    # quadrant property: all points with a,b < 8 sort before any point
    # with a,b >= 8 (top bit of both dims dominates)
    lo = max(v for (a, b), v in z.items() if a < 8 and b < 8)
    hi = min(v for (a, b), v in z.items() if a >= 8 and b >= 8)
    assert lo < hi


def test_source_cap_sample_cap_and_determinism(spark):
    rows = [(i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string")
    kept = source_cap_sample(df, "src", "id", cap=5, salt="t")
    counts = {r["src"]: r["n"] for r in
              kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 5 for n in counts.values())
    again = source_cap_sample(df.repartition(7), "src", "id", cap=5, salt="t")
    assert sorted(r["id"] for r in kept.collect()) == \
        sorted(r["id"] for r in again.collect())
    # a group smaller than the cap is kept whole
    small = spark.createDataFrame([(1, "x"), (2, "x")], "id long, src string")
    assert source_cap_sample(small, "src", "id", cap=5).count() == 2


def test_quantize_zero_vector_safe(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [1.0, -127.0])],
                               "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in
           quantize_embeddings(df).collect()}
    assert got[1]["scale"] == 0.0
    assert got[1]["max_abs_err"] == 0.0 and got[1]["mean_abs_err"] == 0.0
    assert got[2]["scale"] == 1.0  # max|x|/127 = 127/127
    assert got[2]["max_abs_err"] == 0.0  # values exactly representable


def test_quantize_arrow_and_expr_paths_agree(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # include the degenerate shapes in the equivalence check: null
    # vector → all-null row, empty vector → (0, 0, null)
    extra = spark.createDataFrame(
        [(900001, None), (900002, [])],
        "vec_id long, embedding array<float>")
    emb = emb.select("vec_id", "embedding").unionByName(extra)
    arrow = {r["vec_id"]: r for r in
             quantize_embeddings(emb, method="arrow").collect()}
    expr = {r["vec_id"]: r for r in
            quantize_embeddings(emb, method="expr").collect()}
    assert (arrow[900001]["scale"], arrow[900001]["mean_abs_err"]) == \
        (None, None)
    assert (arrow[900002]["scale"], arrow[900002]["max_abs_err"],
            arrow[900002]["mean_abs_err"]) == (0.0, 0.0, None)
    assert set(arrow) == set(expr)
    for vid, a in arrow.items():
        e = expr[vid]
        assert (a["scale"], a["max_abs_err"], a["mean_abs_err"]) == (
            e["scale"], e["max_abs_err"], e["mean_abs_err"]), vid
    import pytest as _pytest
    with _pytest.raises(ValueError):
        quantize_embeddings(emb, method="nope")


def test_quantize_paths_agree_on_halfway_doubles(spark):
    """Adversarial .5-boundary doubles where binary +0.5 rounding and
    F.round's shortest-decimal-repr HALF_UP disagree — the arrow path
    must replicate the JVM rule bit-for-bit (its Decimal fixup), so
    both methods still agree. 127.0 pins scale=1 → x/safe == x."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.one_of(
        # exact halves, nextafter-adversarial neighbors, random doubles
        st.sampled_from([0.5, -0.5, 1.5, -1.5, 2.5,
                         float(np.nextafter(0.5, 0)),       # 0.49999...994
                         float(np.nextafter(0.5, 1)),
                         float(np.nextafter(-0.5, 0)),
                         float(np.nextafter(2.5, 2)),
                         float(np.nextafter(126.5, 126))]),
        st.floats(min_value=-127, max_value=127,
                  allow_nan=False, allow_infinity=False)),
        min_size=1, max_size=8))
    def check(vals):
        vec = [127.0] + vals
        df = spark.createDataFrame([(1, vec)],
                                   "vec_id long, embedding array<double>")
        a = quantize_embeddings(df, method="arrow").collect()[0]
        e = quantize_embeddings(df, method="expr").collect()[0]
        assert (a["scale"], a["max_abs_err"], a["mean_abs_err"]) == (
            e["scale"], e["max_abs_err"], e["mean_abs_err"]), vec

    check()


def test_hilbert_key_bijective_and_adjacent(spark):
    """Defining Hilbert properties on the full 16x16 grid (bits=4):
    the mapping is a bijection onto 0..255, and consecutive curve
    positions are ADJACENT cells (|dx|+|dy| == 1) — the locality
    guarantee Z-order lacks (Morton jumps teleport across the plane)."""
    from spark_ext_spark.functions import hilbert_key, zorder_key
    from pyspark.sql import functions as F

    n = 16
    grid = (spark.range(n * n)
            .select((F.col("id") % n).alias("x"),
                    (F.col("id") / n).cast("long").alias("y")))
    rows = (grid.select("x", "y",
                        hilbert_key("x", "y", bits=4).alias("d"))
            .collect())
    d_by_pos = {(r["x"], r["y"]): r["d"] for r in rows}
    ds = sorted(d_by_pos.values())
    assert ds == list(range(n * n))  # bijection
    pos_by_d = {d: p for p, d in d_by_pos.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos_by_d[d], pos_by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, pos_by_d[d])

    # Z-order on the same grid violates adjacency (the jumps Hilbert
    # removes) — pin the contrast so the two keys stay distinct ops
    zrows = (grid.select("x", "y", zorder_key("x", "y", bits=4).alias("d"))
             .collect())
    zpos = {r["d"]: (r["x"], r["y"]) for r in zrows}
    jumps = sum(1 for d in range(n * n - 1)
                if abs(zpos[d][0] - zpos[d + 1][0])
                + abs(zpos[d][1] - zpos[d + 1][1]) > 1)
    assert jumps > 0
