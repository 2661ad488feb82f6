"""free_etl_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of ImpowerKev/FREE-ETL
(reference snapshot at /root/reference, surveyed in SURVEY.md):

- ``intake/``   — the reference's validate→normalize→sink pipeline
  (streamlit_app.py:135-209, 280-349) re-expressed Spark-first.
- ``queries/``  — the oracle-checked operator layer (SURVEY.md §2B):
  scans, joins, aggregations, windows, set ops, scalar functions,
  plus the LLM-data-pipeline extensions: dedup (exact/canonical/
  minhash/simhash/jaccard/embedding/clustering), similarity search
  (cosine/LSH/IVF), text analysis, sampling, data quality.
- ``operators/``— reusable operators Spark lacks as builtins: as-of
  joins (backward/forward), multimodal binary columns, bucketing and
  salting, connected components, CDC upsert + SCD2, table profiling.
- ``streaming/``— Structured Streaming intake + event-window ops.

Design rules (see SURVEY.md §7): declare plans with the DataFrame/SQL
API and let Catalyst/AQE pick physical strategies; broadcast small
dimensions; keep expressions JVM-side (no row-at-a-time Python UDFs in
hot paths); Pandas UDFs / applyInPandas only where builtins cannot
express the semantics.
"""

__version__ = "0.1.0"
