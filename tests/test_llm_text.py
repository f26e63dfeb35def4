"""Text-analysis operator tests: stats, quality, language ID,
fingerprints."""

from __future__ import annotations

import pytest

from spark_ext_spark.llm.text import (fingerprint, language_id,
                                      quality_score, text_stats)

DOCS = [
    (1, "The cat sat on the mat, and it was happy for a while."),
    (2, "el perro corre por la calle y la gente mira con los ojos"),
    (3, "le chat est sur le toit et les oiseaux du jardin"),
    (4, "1234 5678 9999 0000 !!!! ???? ###"),
    (5, "word " * 40),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_text_stats(docs, spark):
    stats = {r["doc_id"]: r for r in
             text_stats(docs, "doc_id", "text").collect()}
    assert stats[1]["n_tokens"] == 13
    assert stats[1]["n_chars"] == len(DOCS[0][1])
    assert stats[4]["digit_ratio"] > 0.4
    assert stats[4]["punct_ratio"] > 0.2
    assert stats[5]["distinct_ratio"] == pytest.approx(1 / 40, abs=1e-4)


def test_quality_score_ranks_noise_low(docs):
    q = {r["doc_id"]: r["quality_score"] for r in
         quality_score(docs, "doc_id", "text").collect()}
    assert q[1] > q[4]           # clean English beats digit noise
    assert q[1] > q[5]           # diverse beats repeated single word
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0


def test_language_id(docs):
    langs = {r["doc_id"]: r["lang_pred"] for r in
             language_id(docs, "doc_id", "text").collect()}
    assert langs[1] == "en"
    assert langs[2] == "es"
    assert langs[3] == "fr"
    assert langs[4] == "und"     # no stopword hits


def test_language_id_carry_cols(docs, spark):
    """carry_cols passes per-row columns through the operator's own
    final join — values must equal the join-based composition, for
    hit docs and 'und' docs alike, without adding a column to the
    exploded token rows."""
    from pyspark.sql import functions as F
    tagged = docs.withColumn("src", F.col("doc_id") % 2)
    carried = language_id(tagged, "doc_id", "text",
                          carry_cols=("src",))
    assert carried.columns == ["doc_id", "src", "lang_pred", "hits"]
    joined = (tagged.select("doc_id", "src")
              .join(language_id(tagged, "doc_id", "text"), "doc_id")
              .select("doc_id", "src", "lang_pred", "hits"))
    assert sorted(map(tuple, carried.collect())) == \
        sorted(map(tuple, joined.collect()))


def test_fingerprint_normalization_and_bag(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "world hello")],
        "doc_id long, text string")
    fps = {r["doc_id"]: (r["fingerprint"], r["bag_fingerprint"])
           for r in fingerprint(df, "doc_id", "text").collect()}
    assert fps[1][0] == fps[2][0]          # normalization-invariant
    assert fps[2][0] != fps[3][0]          # order-sensitive
    assert fps[1][1] == fps[2][1] == fps[3][1]  # bag ignores order


def test_chunk_documents_windows_and_overlap(spark):
    from spark_ext_spark.llm.text import chunk_documents
    text = " ".join(f"w{i}" for i in range(95))
    df = spark.createDataFrame([(1, text), (2, "short one"), (3, "")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=50, overlap=10)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: starts at tokens 0, 40, 80 -> sizes 50, 50, 15
    assert [rows[(1, i)]["n_chunk_tokens"] for i in range(3)] == [50, 50, 15]
    first = rows[(1, 0)]["chunk_text"].split()
    second = rows[(1, 1)]["chunk_text"].split()
    assert first[40:] == second[:10]  # 10-token overlap
    assert rows[(2, 0)]["n_chunk_tokens"] == 2
    assert not any(d == 3 for d, _ in rows)  # empty doc -> no chunks
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap=10)


def test_gopher_rules_each_rule_fails_somewhere(spark):
    """Crafted docs exercise BOTH outcomes of every Gopher rule."""
    from spark_ext_spark.llm.text import gopher_rules
    good = ("the cat sat of the mat and it is that good for a story "
            "about cats and dogs in the big old house near the lake")
    rows = [
        (1, good),                                   # passes everything
        (2, "too few words"),                        # fails ok_words
        (3, " ".join(["extraordinarily"] * 30)),     # fails ok_mean_len (high)
        (4, " ".join(["a", "is", "of", "to"] * 10)), # fails ok_mean_len (low)
        (5, good + " " + "# " * 20),                 # fails ok_symbols
        (6, " ".join(["1234"] * 15) + " the of is"), # fails ok_alpha
        (7, " ".join(["apple", "banana", "cherry"] * 10)),  # fails ok_stop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           gopher_rules(df, "doc_id", "text", min_words=10).collect()}
    assert got[1]["keep"] is True
    assert got[2]["ok_words"] is False and got[2]["keep"] is False
    assert got[3]["ok_mean_len"] is False
    assert got[4]["ok_mean_len"] is False
    assert got[5]["ok_symbols"] is False
    assert got[6]["ok_alpha"] is False
    assert got[7]["ok_stop"] is False
    # ellipsis characters count as symbols too
    dots = spark.createDataFrame(
        [(8, good + " " + "... " * 20 + "… " * 5)], "doc_id long, text string")
    r8 = gopher_rules(dots, "doc_id", "text", min_words=10).collect()[0]
    assert r8["ok_symbols"] is False


def test_redact_pii(spark):
    from spark_ext_spark.llm.text import redact_pii
    df = spark.createDataFrame(
        [(1, "mail a.b+c@test-x.org or call +1 555-123-4567 now"),
         (2, "clean text, just 42 and 3.14 in it")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           redact_pii(df, "doc_id", "text").collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_numbers"] == 1
    assert "<EMAIL>" in got[1]["redacted"]
    assert "<NUMBER>" in got[1]["redacted"]
    assert "@" not in got[1]["redacted"]
    assert got[2]["n_emails"] == 0 and got[2]["n_numbers"] == 0
    assert got[2]["redacted"].endswith("3.14 in it")


def test_repeated_ngram_spans(spark):
    from spark_ext_spark.llm.text import repeated_ngram_spans
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "a quick brown fox runs"),
         (3, "that quick brown fox sleeps"),
         (4, "quick brown fox"),       # appears twice in this doc? no — once
         (5, "too short"),
         (6, "quick brown fox quick brown fox here")],  # 2 occurrences
        "doc_id long, text string")
    rows = repeated_ngram_spans(df, "doc_id", "text",
                                n=3, min_df=3, k=10).collect()
    got = {r["gram"]: (r["df"], r["occurrences"]) for r in rows}
    # 'quick brown fox' occurs in docs 1,2,3,4,6 — doc 6 twice
    assert got["quick brown fox"] == (5, 6)
    # no other trigram is shared by >= 3 docs
    assert list(got) == ["quick brown fox"]


def test_repeated_ngram_spans_short_docs_empty(spark):
    from spark_ext_spark.llm.text import repeated_ngram_spans
    df = spark.createDataFrame([(1, "a b"), (2, "a b"), (3, "a b")],
                               "doc_id long, text string")
    assert repeated_ngram_spans(df, "doc_id", "text",
                                n=3, min_df=2).count() == 0


def test_winnowing_guarantee_and_density(spark):
    """Schleimer et al. guarantee: any shared substring of at least
    k+window-1 words yields >=1 shared fingerprint; disjoint texts
    share none; selection keeps far fewer than all k-gram hashes."""
    from spark_ext_spark.llm.text import (winnow_fingerprints,
                                          winnow_match_pairs)
    common = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (1, "one two three " + common + " four five six"),
        (2, "seven eight nine ten " + common + " eleven twelve"),
        (3, "completely different words with nothing in common here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["shared_fps"]
             for r in winnow_match_pairs(df, "doc_id", "text", k=4,
                                         window=5,
                                         min_shared=1).collect()}
    assert (1, 2) in pairs          # 8 >= k+window-1 = 8 → guaranteed
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # density: fingerprints per doc well below the k-gram count
    fps = winnow_fingerprints(df, "doc_id", "text", k=4, window=5)
    per_doc = {r["doc"]: r["n"] for r in
               fps.groupBy("doc").count().withColumnRenamed(
                   "count", "n").collect()}
    n_words = len(rows[0][1].split())
    assert per_doc[1] < (n_words - 3)  # fewer than all k-grams
    # short-doc edge: fewer hashes than the window still fingerprints
    tiny = spark.createDataFrame([(9, "just five little words here")],
                                 "doc_id long, text string")
    assert winnow_fingerprints(tiny, "doc_id", "text",
                               k=4, window=5).count() == 1
