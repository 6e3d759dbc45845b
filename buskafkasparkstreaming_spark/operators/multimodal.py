"""Multimodal column handling (BASELINE.json north_star).

Design: media payloads are opaque `binary` columns with typed metadata
alongside (mime, width/height, duration, ...). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages — the only
sane shape for Python-side media work at 100 TB:

* the binary column travels in Arrow record batches (no per-row pickling);
* each task decodes its partition independently — embarrassingly parallel;
* output schemas are declared up front so downstream stays Catalyst-planned.

The actual image/audio codecs are NOT in this container, so the real decode
path raises NotImplementedError behind an import-try; a deterministic fake
decoder (seeded by sha2 of the payload) exercises the identical Spark
plumbing — schema, batching, partitioning — in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, mime string, width int, height int, "
    "n_frames int, feat array<float>"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + metadata columns.

    In production this column comes from the lake (parquet/avro binary); for
    tests we materialize one deterministically from existing data so the
    pipeline shape is real end-to-end.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return (
        df.withColumn("payload", payload)
        .withColumn("n_bytes", F.length(payload).cast("int"))
        .withColumn("mime", F.lit("application/octet-stream"))
        .withColumn("sha256", F.sha2(payload, 256))
    )


def _real_decode(payload: bytes) -> dict:
    """Actual media decode — requires PIL/ffmpeg, absent in this container."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "media decode requires Pillow/ffmpeg; install on the cluster image"
        ) from exc
    raise NotImplementedError("wire Image.open(BytesIO(payload)) here")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in: pseudo-dimensions + an 8-dim feature vector
    derived from the payload bytes. Stable across runs/executors."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 4
    feat = [round(b / 255.0, 6) for b in h[3:11]]
    return {"width": width, "height": height, "n_frames": n_frames, "feat": feat}


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """mapInPandas feature-extraction stage: binary payload → (dims, frames,
    feature vector). One Arrow batch in, one out; schema fixed by
    FEATURE_SCHEMA so Catalyst can plan downstream joins/aggregations.

    The worker function is deliberately self-contained (stdlib/pandas only,
    no references to this module): executor Python workers unpickle it
    without needing the package importable on their own path — the host
    application controls neither our deployment nor PYTHONPATH.
    """
    use_fake = use_fake_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def decode(payload: bytes) -> dict:
            if not use_fake:
                raise NotImplementedError(
                    "media decode requires Pillow/ffmpeg; install on the cluster image"
                )
            h = hashlib.sha256(payload).digest()
            return {
                "width": 64 + h[0] % 192,
                "height": 64 + h[1] % 192,
                "n_frames": 1 + h[2] % 4,
                "feat": [round(b / 255.0, 6) for b in h[3:11]],
            }

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col])
                d = decode(payload)
                rows.append(
                    {
                        "doc_id": r[id_col],
                        "n_bytes": len(payload),
                        "mime": r.get("mime", "application/octet-stream"),
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "feat": d["feat"],
                    }
                )
            yield _pd.DataFrame(rows)

    # spread before the Python stage: a single-split input would otherwise
    # serialize all decode work into one task (explicit count — AQE
    # coalesces un-numbered repartitions of small inputs back to 1)
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col, payload_col, "mime")
        .repartition(n, F.col(id_col))
        .mapInPandas(run, FEATURE_SCHEMA)
    )


def frame_sample(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling stage shape: explode n_frames into frame indices and
    keep every nth — demonstrates the fan-out pattern (explode, not Python
    loops) used for video at scale."""
    return (
        df.withColumn(
            "frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1))
        )
        .filter(F.col("frame_idx") % every_nth == 0)
    )
