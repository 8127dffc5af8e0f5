"""spotify_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``rajeluqman/spotify-etl-pipeline`` (serverless Spotify ETL: Lambda extract →
S3 raw JSON → normalize → Snowflake star schema → SQL analytics), built
Spark-first:

- DataFrame / Spark SQL declarative plans (Catalyst optimizes; no hand
  scheduling),
- Parquet-backed bronze/silver/gold zones instead of S3-CSV-Snowpipe,
- Structured Streaming for the event-driven incremental layer,
- plus the LLM-data-pipeline extension operators (dedup, similarity search,
  multimodal columns, text analysis) designed for 100 TB scale.

Layout:

- :mod:`.session`    SparkSession builder (AQE on, UTC, Arrow on)
- :mod:`.schemas`    explicit StructTypes for raw docs, star schema, fixtures
- :mod:`.sources`    ingestion: REST-paginated Python DataSource, zone IO
- :mod:`.etl`        bronze → silver → gold pipeline (normalize, validate,
  incremental upsert, run/error logs)
- :mod:`.operators`  dedup / similarity / text / multimodal / window operators
- :mod:`.functions`  scalar helpers (partial dates, URL parse, timestampdiff)
- :mod:`.streaming`  Structured Streaming surface (file source, watermarks,
  tumbling/sliding/session windows)
- :mod:`.queries`    the oracle-checked query catalog exposed through
  ``/root/repo/__spark_entry__.py``
"""

__version__ = "0.1.0"
