"""buskafkasparkstreaming_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference CDC streaming pipeline (quinlayen/BusKafkaSparkStreaming): Debezium
envelope parsing, keyed upsert with precombine semantics, partitioned lake
tables, ad-hoc SQL — expressed as idiomatic Spark DataFrame / SQL /
Structured Streaming plans, plus the large-scale training-data-pipeline
operator surface (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Reference parity map (see SURVEY.md §2): the reference's only real query is
"maintain latest state per record_id, partitioned by routeId, precombine on
event_time" (reference 01-setup-ec-vm.md:262-284); everything else is
composition of off-the-shelf sources/sinks, which `sources/` and
`streaming/` re-express natively.
"""

__version__ = "0.1.0"

from buskafkasparkstreaming_spark.session import get_spark  # noqa: F401
