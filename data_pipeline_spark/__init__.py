"""data_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the semantics of joefrost01/data-pipeline
(reference at /root/reference, see SURVEY.md): deterministic identity,
last-writer-wins dedup, incremental MERGE upserts, SCD2 validity ranges,
additive schema evolution, exactly-once ingestion with commit manifests,
per-partition lineage/metrics — as a log-replay pipeline over bucketed
lakehouse tables of pre-tokenized training sequences
(doc_id string, tokens array<int32>, n_tok int32, source string).

No code is copied from the reference; it is a dbt/BigQuery orchestration
platform with no query engine of its own. Everything here is built on the
public PySpark DataFrame / Structured Streaming APIs.
"""

__version__ = "0.1.0"
