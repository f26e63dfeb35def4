"""LLM-data-pipeline operators (beyond the reference surface; the
BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal columns — each designed scale-out-first.

Design rules applied throughout (SURVEY.md §7):
- no driver-side state: signatures, buckets and pair generation are
  DataFrame ops end-to-end;
- blocking before pairing: candidate pairs come from equi-join keys
  (shingle, LSH band, SimHash band), never a full cross join;
- frequency caps on blocking keys so a stop-shingle can't produce a
  quadratic bucket at 100 TB;
- Python only in Arrow-batched pandas_udf/mapInPandas, and only where
  built-ins genuinely can't express the op (MinHash permutations,
  binary decode).
"""
