"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo
``Sowmya273814/DataFoundation-Multi-source-Retail-Data-Integration-Hub``.

The reference is a pandas/MySQL/BigQuery retail ETL hub (CSV + REST
ingestion -> staging -> SCD2 star schema -> dashboard analytics). This
package re-expresses every capability Spark-first: declarative DataFrame /
SQL plans optimized by Catalyst, columnar parquet storage, broadcast-hash
star joins, set-based SCD2 merges, and a Structured Streaming surface —
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) the reference does not have.

Layout
------
- ``session``    : SparkSession factory tuned for local testing and documented
                   for cluster scale.
- ``sources``    : readers (CSV/parquet/JSON/REST/JDBC) and writers
                   (warehouse tables, append/overwrite), catalog bootstrap.
- ``functions``  : column-level building blocks (name normalization,
                   calendar/date attrs, text analysis, vector math).
- ``plans``      : declarative star-schema spec (dimensions, fact, SCD2 flags)
                   mirroring the reference's config-driven warehouse build.
- ``operators``  : set-based SCD2 merge, dedup family (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard), similarity search, sessionization,
                   multimodal column plumbing.
- ``queries``    : the analytics query library (dashboard KPIs, trends,
                   shares, top-k, YoY) and the flagship star-join query.
- ``streaming``  : Structured Streaming pipelines over the events table
                   (windows, watermarks, stateful dedup).
"""

__version__ = "0.1.0"
