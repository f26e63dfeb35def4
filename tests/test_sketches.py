"""Deterministic distinct sketches (operators/sketches.py).

Contracts under test:
- accuracy: KMV within its ~1/sqrt(k-2) band, theta within ~1/sqrt(pD)
  (generous 5-sigma-ish bounds so the tests are noise-free — the
  hashes are fixed, so these never flake);
- exactness below k (KMV) — estimate == true distinct, integer;
- determinism: estimates are invariant to repartitioning and to the
  KMV shard count (the two-stage top-k is lossless);
- theta mergeability: the sketch of a union == union of sketches;
- null keys are excluded (count-distinct semantics);
- loud errors on nonsense k / p.
"""

import pytest
from pyspark.sql import functions as F

from spark_ext_spark.operators.sketches import kmv_distinct, theta_distinct


@pytest.fixture(scope="module")
def users(spark):
    # 3 groups with distinct counts 40 / 400 / 4000; values overlap
    # across groups on purpose (sketches must be per-group).
    rows = [(g, f"u{i % n}") for g, n in (("a", 40), ("b", 400),
                                          ("c", 4000))
            for i in range(2 * n)]  # every key appears twice
    return spark.createDataFrame(rows, "grp string, uid string")


TRUE = {"a": 40, "b": 400, "c": 4000}


def _est(df):
    return {r["grp"]: r["distinct_est"] for r in df.collect()}


def test_kmv_exact_below_k(users):
    est = _est(kmv_distinct(users, "uid", ["grp"], k=64))
    assert est["a"] == 40.0  # 40 < 64 → exact


def test_kmv_error_band(users):
    est = _est(kmv_distinct(users, "uid", ["grp"], k=64))
    for g in ("b", "c"):
        assert abs(est[g] - TRUE[g]) / TRUE[g] < 0.6  # ~4.7σ at k=64


def test_kmv_k_sharpens(users):
    lo = _est(kmv_distinct(users, "uid", ["grp"], k=16))
    hi = _est(kmv_distinct(users, "uid", ["grp"], k=512))
    assert abs(hi["c"] - 4000) <= abs(lo["c"] - 4000) + 200


def test_kmv_partitioning_and_shard_invariance(users):
    base = kmv_distinct(users, "uid", ["grp"], k=64).collect()
    repart = kmv_distinct(users.repartition(13, "uid"), "uid",
                          ["grp"], k=64).collect()
    shards = kmv_distinct(users, "uid", ["grp"], k=64,
                          n_shards=3).collect()
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(base) == key(repart) == key(shards)


def test_kmv_nulls_excluded_and_global_group(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("y",), ("x",)], "uid string")
    row = kmv_distinct(df, "uid", k=8).collect()
    assert len(row) == 1 and row[0]["distinct_est"] == 2.0


def test_kmv_bad_k(users):
    with pytest.raises(ValueError):
        kmv_distinct(users, "uid", ["grp"], k=1)


def test_theta_error_band(users):
    est = _est(theta_distinct(users, "uid", ["grp"], p=0.25))
    for g in ("b", "c"):
        assert abs(est[g] - TRUE[g]) / TRUE[g] < 0.5


def test_theta_merge_equals_union(users):
    """Union-of-sketches == sketch-of-union: the kept-hash sets per
    group, unioned and de-duplicated, give exactly the global
    sketch's estimate — the property that makes per-day rollups
    re-aggregable without rescanning raw rows."""
    per_group = theta_distinct(users, "uid", ["grp"], p=0.25)
    whole = theta_distinct(users.select("uid"), "uid", p=0.25)
    # rebuild the union from per-group kept sets: kept hashes are a
    # pure function of uid, so distinct uids below theta reproduce it
    from spark_ext_spark.llm.splits import hash60
    theta = int(0.25 * (1 << 60))
    union_kept = (users.where(hash60("uid") < theta)
                  .select(hash60("uid").alias("h")).distinct().count())
    assert whole.collect()[0]["n_kept"] == union_kept
    assert per_group.agg(F.sum("n_kept")).collect()[0][0] >= union_kept


def test_theta_empty_group_emits_zero_row(spark):
    """A group whose every key hashes above theta must still emit a
    row (n_kept=0, est=0.0) — sampled-to-nothing is not the same as
    absent. u1/u3/u4 hash >= 0.25*2^60 under the default salt."""
    df = spark.createDataFrame(
        [("dry", "u1"), ("dry", "u3"), ("dry", "u4"),
         ("wet", "u0"), ("wet", "u2")], "grp string, uid string")
    got = {r["grp"]: (r["n_kept"], r["distinct_est"])
           for r in theta_distinct(df, "uid", ["grp"], p=0.25).collect()}
    assert got["dry"] == (0, 0.0)
    assert got["wet"] == (2, 8.0)


def test_theta_partitioning_invariance(users):
    a = theta_distinct(users, "uid", ["grp"], p=0.25).collect()
    b = theta_distinct(users.repartition(7), "uid", ["grp"],
                       p=0.25).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_theta_bad_p(users):
    for p in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            theta_distinct(users, "uid", ["grp"], p=p)


# --- hypothesis differential: Spark KMV vs an independent pure-Python
# replay (exact equality, not just error bounds) ---------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_kmv(keys, k, salt=""):
    """Reference KMV in plain Python over the same md5-60 hash space."""
    import hashlib
    hs = sorted({int(hashlib.md5(f"{x}{salt}".encode()).hexdigest()[:15],
                     16) for x in keys if x is not None})
    kept = hs[:k]
    if not kept:
        return None
    k_eff, kth = len(kept), kept[-1]
    est = (float(k_eff) if k_eff < k
           else round((k - 1) * float(1 << 60) / float(kth), 4))
    return (k_eff, kth, round(est, 4))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.one_of(st.none(),
                        st.integers(min_value=-50, max_value=50).map(str))),
    min_size=1, max_size=120),
    k=st.sampled_from([2, 5, 16]),
    n_shards=st.sampled_from([1, 4]))
def test_kmv_matches_python_replay(spark, data, k, n_shards):
    df = spark.createDataFrame(data, "grp string, uid string")
    got = {r["grp"]: (r["k_eff"], r["kth_hash"], r["distinct_est"])
           for r in kmv_distinct(df, "uid", ["grp"], k=k,
                                 n_shards=n_shards).collect()}
    want = {}
    for g in ("a", "b", "c"):
        ref = _py_kmv([u for gg, u in data if gg == g], k)
        if ref is not None:
            want[g] = ref
    assert got == want
