from buskafkasparkstreaming_spark.sources.files import (  # noqa: F401
    TPCH_TABLES,
    load_tables,
    read_envelope_jsonl,
    stream_envelope_jsonl,
)
