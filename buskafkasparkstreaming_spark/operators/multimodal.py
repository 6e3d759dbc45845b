"""Multimodal column handling (BASELINE.json north_star).

Design: media payloads are opaque `binary` columns with typed metadata
alongside (mime, width/height, duration, ...). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages — the only
sane shape for Python-side media work at 100 TB:

* the binary column travels in Arrow record batches (no per-row pickling);
* each task decodes its partition independently — embarrassingly parallel;
* output schemas are declared up front so downstream stays Catalyst-planned.

Decode has two tiers. HEADER decode — container-format dimension/mime
sniffing for PNG/BMP/GIF/JPEG — is implemented in pure Python from the
published file-format specs (magic bytes + fixed header offsets; no
codec library needed) and runs for any payload whose magic matches.
PIXEL decode (resampling, frame extraction) genuinely requires
PIL/ffmpeg, absent in this container, so it raises NotImplementedError
behind an import-try; a deterministic fake decoder (seeded by sha2 of
the payload) stands in for non-image payloads and exercises the
identical Spark plumbing — schema, batching, partitioning — in tests.
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


def _make_header_parser():
    """Build the pure-Python image-header parser as a NESTED function so a
    Spark worker closure capturing it is pickled by value (a module-level
    function would pickle as a module reference, breaking executors that
    don't have this package on their path)."""

    def parse_image_header(payload: bytes):
        """(mime, width, height) from container magic bytes, else None.

        Offsets are from the published format specs: PNG IHDR (RFC 2083
        §3), BMP BITMAPINFOHEADER, GIF87a/89a logical screen descriptor,
        JPEG SOFn marker walk (ITU T.81 §B.2.2)."""
        import struct

        if (
            len(payload) >= 24
            and payload[:8] == b"\x89PNG\r\n\x1a\n"
            and payload[12:16] == b"IHDR"
        ):
            w, h = struct.unpack(">II", payload[16:24])
            return ("image/png", w, h)
        if len(payload) >= 26 and payload[:2] == b"BM":
            # validate the DIB header before trusting the 2-byte magic —
            # arbitrary (e.g. text) payloads starting with 'BM' must not
            # parse as images with garbage dimensions. Header size at
            # offset 14 must be a known DIB variant and dims plausible.
            (dib,) = struct.unpack("<I", payload[14:18])
            if dib == 12:  # BITMAPCOREHEADER: 16-bit unsigned dims
                w, h = struct.unpack("<HH", payload[18:22])
                if w > 0 and h > 0:
                    return ("image/bmp", w, h)
            elif dib in (40, 52, 56, 64, 108, 124):
                w, h = struct.unpack("<ii", payload[18:26])
                # negative height = top-down DIB
                if 0 < w <= 1_000_000 and h != 0 and abs(h) <= 1_000_000:
                    return ("image/bmp", w, abs(h))
        if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            return ("image/gif", w, h)
        if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
            i = 2
            while i + 9 <= len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("image/jpeg", w, h)
                i += 2 + seglen
        return None

    return parse_image_header


parse_image_header = _make_header_parser()


def _real_decode(payload: bytes) -> dict:
    """Header-tier media decode: dimensions + mime from the container header
    (pure Python, no codec). The feature vector is the deterministic
    payload-hash embedding — replacing it with a real CNN/CLIP embedding is
    a pixel-tier concern. Raises only for formats whose header we can't
    read, where full pixel decode (PIL/ffmpeg) would be required."""
    hdr = parse_image_header(payload)
    if hdr is None:
        try:
            from PIL import Image  # noqa: PLC0415, F401
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "unrecognized container: pixel decode requires Pillow/ffmpeg; "
                "install on the cluster image"
            ) from exc
        raise NotImplementedError("wire Image.open(BytesIO(payload)) here")
    import hashlib

    mime, width, height = hdr
    digest = hashlib.sha256(payload).digest()
    return {
        "mime": mime,
        "width": width,
        "height": height,
        "n_frames": 1,
        "feat": [round(b / 255.0, 6) for b in digest[3:11]],
    }


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

    Payloads whose container header parses (PNG/BMP/GIF/JPEG) get REAL
    dimensions + detected mime; other payloads use the deterministic fake
    decoder, or raise when `use_fake_decoder=False` (strict mode: every
    payload must be a recognized image).

    The worker function is deliberately self-contained (stdlib/pandas only,
    no module-level references): executor Python workers unpickle it
    without needing the package importable on their own path — the host
    application controls neither our deployment nor PYTHONPATH. The header
    parser is captured as a nested function, so it pickles by value too.
    """
    use_fake = use_fake_decoder
    parse_header = _make_header_parser()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def decode(payload: bytes, in_mime: str) -> tuple:
            h = hashlib.sha256(payload).digest()
            feat = [round(b / 255.0, 6) for b in h[3:11]]
            hdr = parse_header(payload)
            if hdr is not None:
                mime, width, height = hdr
                return (mime, width, height, 1, feat)
            if not use_fake:
                raise NotImplementedError(
                    "unrecognized container: pixel decode requires "
                    "Pillow/ffmpeg; install on the cluster image"
                )
            return (in_mime, 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4, feat)

        for pdf in batches:
            # column-wise assembly: the only per-row Python is the decode
            # call itself (inherently per-payload); no iterrows
            payloads = [bytes(p) for p in pdf[payload_col]]
            mimes_in = (
                list(pdf["mime"])
                if "mime" in pdf.columns
                else ["application/octet-stream"] * len(payloads)
            )
            dec = [decode(p, m) for p, m in zip(payloads, mimes_in)]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": [len(p) for p in payloads],
                    "mime": [d[0] for d in dec],
                    "width": [d[1] for d in dec],
                    "height": [d[2] for d in dec],
                    "n_frames": [d[3] for d in dec],
                    "feat": [d[4] for d in dec],
                }
            )

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
