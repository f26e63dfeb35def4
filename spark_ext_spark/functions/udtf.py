"""Python UDTFs (Spark 4 user-defined table functions) — the lateral
row-generating API surface. These exist to complete the UDF/UDAF/UDTF
triad; anything expressible as JVM array expressions (see
llm/text.py's chunking, plans' doc_sentences) should stay there —
UDTFs run row-at-a-time Python and are the slow path at 100 TB. Use
one when per-row logic genuinely needs Python (stateful parsing,
external libraries) AND the row fan-out shape fits a table function.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="ngram string, pos int")
class ExplodeNgrams:
    """Lateral n-gram generator: one output row per word n-gram.

    >>> spark.udtf.register("explode_ngrams", ExplodeNgrams)
    >>> spark.sql("SELECT d.doc_id, g.* FROM docs d, "
    ...           "LATERAL explode_ngrams(d.text, 2) g")
    """

    def eval(self, text: str, n: int):
        if not text or n is None or n < 1:
            return
        words = text.lower().split()
        for i in range(len(words) - n + 1):
            yield " ".join(words[i:i + n]), i


def register_udtfs(spark) -> None:
    spark.udtf.register("explode_ngrams", ExplodeNgrams)
