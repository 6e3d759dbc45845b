"""Debezium envelope parsing and op routing.

Re-expresses the reference's single transform chain (reference
01-setup-ec-vm.md:180, repeated 4×):

    df.select(col("value").cast("string")).alias("value")
      .withColumn("jsonData", from_json(col("value"), schema))
      .select("jsonData.payload.after.*")

with three deliberate upgrades over the reference (SURVEY §2.2, §7):

1. explicit StructType instead of sample-file schema inference;
2. `op` / `before` are NOT dropped — deletes ('d') are routed, not lost;
3. a corrupt-record policy: malformed JSON lands in a quarantine column
   instead of silently nulling every field (the NiFi layer was similarly
   lenient — nifi-project.xml:612-621 ignores unmatched fields).

Everything is built-in functions → single narrow WholeStageCodegen stage,
no shuffle; at 100 TB this pipelines at Kafka-read speed.
"""

from __future__ import annotations

import json
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from buskafkasparkstreaming_spark import schemas

#: ops that carry a usable post-image (insert / update / snapshot read)
UPSERT_OPS = ("c", "u", "r")
#: op that tombstones a key
DELETE_OP = "d"


def parse_envelopes(
    raw: DataFrame,
    value_col: str = "value",
    row_schema: T.StructType | None = None,
    keep_kafka_meta: bool = False,
) -> DataFrame:
    """binary/string Kafka `value` → flattened change rows.

    Output columns: every field of the row image (post-image for c/u/r,
    pre-image for d) + `_op`, `_ts_ms`, `_is_delete`, `_corrupt`.

    Parity: reference transform T1–T5 (01-setup-ec-vm.md:180) minus the
    data-loss quirks; cast binary→string is T2 (:175).
    """
    schema = (
        schemas.envelope_schema_for(row_schema)
        if row_schema is not None
        else schemas.DEBEZIUM_ENVELOPE_SCHEMA
    )
    json_str = F.col(value_col).cast("string")
    parsed = raw.withColumn(
        "jsonData",
        F.from_json(
            json_str,
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    payload = F.col("jsonData.payload")
    # post-image for upserts, pre-image for deletes (so the key survives)
    image = F.when(payload["op"] == DELETE_OP, payload["before"]).otherwise(
        payload["after"]
    )
    cols: list[Column] = [image.alias("_row")]
    if keep_kafka_meta:
        for c in ("topic", "partition", "offset", "timestamp"):
            if c in raw.columns:
                cols.append(F.col(c).alias(f"_kafka_{c}"))
    out = parsed.select(
        *cols,
        payload["op"].alias("_op"),
        payload["ts_ms"].alias("_ts_ms"),
        (payload["op"] == DELETE_OP).alias("_is_delete"),
        F.col("jsonData._corrupt_record").alias("_corrupt"),
    )
    return out.select("_row.*", *[c for c in out.columns if c != "_row"])


def route_ops(parsed: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split parsed change rows into (upserts, deletes, corrupt).

    The reference dropped `op` entirely (only `after.*` was selected,
    01-setup-ec-vm.md:178), which silently turns deletes into all-null rows.
    """
    corrupt = parsed.filter(F.col("_corrupt").isNotNull())
    ok = parsed.filter(F.col("_corrupt").isNull())
    upserts = ok.filter(F.col("_op").isin(*UPSERT_OPS))
    deletes = ok.filter(F.col("_op") == DELETE_OP)
    return upserts, deletes, corrupt


def synthesize_envelopes(
    df: DataFrame,
    op: str = "c",
    ts_ms_col: str | None = None,
    source_name: str = "bss",
) -> DataFrame:
    """Wrap arbitrary rows as Debezium-style envelope JSON strings.

    The engine's replacement for the reference's MySQL→Debezium leg
    (SURVEY §3 entry point C): any DataFrame becomes a CDC stream whose
    `value` column is envelope JSON, so the whole parse→upsert pipeline can
    be exercised without MySQL/Kafka. Distributed (to_json per row, no
    collect).
    """
    ts = F.col(ts_ms_col) if ts_ms_col else F.lit(0).cast("long")
    payload = F.struct(
        _null_struct(df),
        F.struct(*[F.col(c) for c in df.columns]).alias("after"),
        F.lit(None).cast(schemas.SOURCE_SCHEMA).alias("source"),
        F.lit(op).alias("op"),
        ts.alias("ts_ms"),
        F.lit(None).cast(schemas.TRANSACTION_SCHEMA).alias("transaction"),
    )
    return df.select(F.to_json(F.struct(payload.alias("payload"))).alias("value"))


def _null_struct(df: DataFrame) -> Column:
    struct_type = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in df.schema.fields]
    )
    return F.lit(None).cast(struct_type).alias("before")


def envelopes_to_jsonl(rows: Iterable[dict], path: str) -> None:
    """Write fixture envelopes (python dicts) as newline-delimited JSON —
    the file-replay source format (FIXTURES.md F2/F3)."""
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
