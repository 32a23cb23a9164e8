"""PySpark-native transactional-datalake + analytics engine.

A from-scratch rebuild of the capabilities of
``aws-samples/transactional-datalake-using-apache-iceberg-on-aws-glue``
(reference surveyed in SURVEY.md), expressed Spark-first:

- ``cdc``       — CDC envelope parsing, latest-per-key dedup, upsert/delete
                  split, and MERGE apply (the reference's single pipeline,
                  ``src/main/python/spark_sql_merge_into_iceberg.py``).
- ``lake``      — the ACID-ish table layer: Iceberg when the runtime jar is
                  on the classpath, otherwise a partitioned-parquet table
                  with a manual merge (anti-join + union + dynamic partition
                  overwrite) that mirrors Iceberg copy-on-write semantics.
- ``streaming`` — Structured Streaming wrapper (foreachBatch + trigger +
                  checkpoint), replacing Glue's ``forEachBatch``.
- ``queries``   — the analytic read-side (the role Athena plays in the
                  reference) as oracle-tested DataFrame builders.
- ``operators`` — LLM-pipeline operators beyond the reference surface:
                  dedup (exact/MinHash-LSH/SimHash/Jaccard/embedding),
                  similarity search, text analysis, as-of join, top-k.
- ``multimodal``— binary-column plumbing for image/audio payloads with
                  stubbed decoders (libs not present in this environment).

Everything is DataFrame/SQL-declarative so Catalyst handles pushdown,
pruning, join selection, and AQE; no RDD code anywhere in the hot path.
"""

__version__ = "0.1.0"
