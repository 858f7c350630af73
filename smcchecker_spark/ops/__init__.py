"""Large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) — the operations a 100 TB
image+caption corpus needs around the validation engine. All Spark-first:
built-in expressions where possible, Arrow-batched pandas UDFs where not.
"""
