"""hash_split + pack_sequences unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ext_spark.llm.splits import hash_split, pack_sequences


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    a = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    b = {r["k"]: r["split"]
         for r in hash_split(df.repartition(7), "k").collect()}
    assert a == b  # assignment is a pure function of the key
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.75 < frac < 0.85  # ~80% within sampling noise


def test_hash_split_salt_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    a = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s1").collect()}
    b = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s2").collect()}
    assert a != b


def test_hash_split_no_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "k long")
    plan = hash_split(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_contract(spark):
    rows = [(i, " ".join(["w"] * n))
            for i, n in enumerate([100, 900, 600, 500, 2000, 10, 10])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["seq_id"])
           for r in pack_sequences(df, "doc_id", "text",
                                   budget=1000, num_partitions=3).collect()}
    # exclusive cumsum: 0,100,1000,1600,2100,4100,4110 → DIV 1000
    assert out == {0: (100, 0), 1: (900, 0), 2: (600, 1), 3: (500, 1),
                   4: (2000, 2), 5: (10, 4), 6: (10, 4)}
    # every sequence starts where the previous ended: seq ids are a
    # non-decreasing function of doc order
    seqs = [out[i][1] for i in sorted(out)]
    assert seqs == sorted(seqs)


def test_temperature_mix_upweights_small_sources(spark):
    from spark_ext_spark.llm.splits import temperature_mix_sample
    rows = ([(i, "big") for i in range(900)]
            + [(1000 + i, "small") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix_sample(df, "source", "doc_id",
                                 alpha=0.5, budget=200)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_big, n_small = got.get("big", 0), got.get("small", 0)
    # expected takes: 200·sqrt(n_g)/Σsqrt — big 150, small 50 — so the
    # small source's SAMPLING RATE (50%) far exceeds the big one's
    # (17%); hash noise is ~±3σ ≈ ±35 rows on big, ±20 on small
    assert 100 <= n_big <= 200
    assert 30 <= n_small <= 70
    assert n_small / 100 > n_big / 900  # per-row upweighting holds
    # deterministic: same inputs, same sample
    again = temperature_mix_sample(df, "source", "doc_id",
                                   alpha=0.5, budget=200)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_temperature_mix_alpha_one_is_proportional(spark):
    from spark_ext_spark.llm.splits import temperature_mix_sample
    rows = ([(i, "a") for i in range(600)]
            + [(2000 + i, "b") for i in range(300)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix_sample(df, "source", "doc_id",
                                 alpha=1.0, budget=300)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # alpha=1 -> uniform rate budget/N = 1/3 for every source
    assert 160 <= got.get("a", 0) <= 240
    assert 70 <= got.get("b", 0) <= 130


def test_length_bucketed_batches_golden(spark):
    from spark_ext_spark.llm.splits import length_bucketed_batches
    # token counts: 2, 2, 3, 5, 5 -> buckets (size 3): 0,0,1,1,1
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "e f g"),
         (4, "h i j k l"), (5, "m n o p q")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            length_bucketed_batches(df, "doc_id", "text",
                                    bucket_tokens=3, batch_size=2).collect()}
    assert (rows[1]["bucket"], rows[2]["bucket"]) == (0, 0)
    assert (rows[3]["bucket"], rows[4]["bucket"], rows[5]["bucket"]) == \
        (1, 1, 1)
    # within bucket 1 (docs 3,4,5 in id order, batch_size 2):
    # docs 3,4 -> batch 0; doc 5 -> batch 1
    assert (rows[3]["batch_idx"], rows[4]["batch_idx"],
            rows[5]["batch_idx"]) == (0, 0, 1)
    assert (rows[1]["batch_idx"], rows[2]["batch_idx"]) == (0, 0)
    # same-batch documents differ by < bucket_tokens in length
    assert abs(rows[3]["n_tokens"] - rows[4]["n_tokens"]) < 3


def test_score_top_fraction_budget_and_determinism(spark):
    from pyspark.sql import functions as F

    from spark_ext_spark.llm.splits import score_top_fraction
    rows = [(i, f"s{i % 3}", float(i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, src string, score double")
    kept = score_top_fraction(df, "src", "id", "score", 0.3)
    counts = {r["src"]: r["n"] for r in
              kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 9 for n in counts.values())  # ceil(0.3*30)
    # deterministic under repartitioning
    again = score_top_fraction(df.repartition(13), "src", "id",
                               "score", 0.3)
    assert sorted((r["src"], r["id"]) for r in kept.collect()) == \
        sorted((r["src"], r["id"]) for r in again.collect())
    # every non-empty group keeps at least one row even at tiny fraction
    tiny = score_top_fraction(df, "src", "id", "score", 0.001)
    assert tiny.groupBy("src").count().count() == 3


def test_hash_split_null_keys_get_null_label(spark):
    """NULL keys have no hash position: they must get a NULL split,
    not silently land in the last (eval) bucket."""
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), (None,)], "k string")
    got = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    assert got[None] is None
    assert got["a"] in ("train", "val", "test")
    assert got["b"] in ("train", "val", "test")


def test_temperature_mix_keeps_null_group(spark):
    """A NULL source is a group like any other: the counts agg sees it,
    so the rates join must be null-safe — the old equi-join silently
    dropped every null-group row regardless of budget."""
    from spark_ext_spark.llm.splits import temperature_mix_sample
    rows = [(i, None if i % 3 == 0 else f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = temperature_mix_sample(df, "src", "id", alpha=0.7, budget=300)
    # budget >= corpus: every row survives, including the null group
    assert out.count() == 300
    assert out.filter(F.col("src").isNull()).count() == 100
    # smaller budget: the null group is sampled, not zeroed
    some = temperature_mix_sample(df, "src", "id", alpha=0.7, budget=150)
    n_null = some.filter(F.col("src").isNull()).count()
    assert 0 < n_null < 100
