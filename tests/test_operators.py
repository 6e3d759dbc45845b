"""Operator unit tests on tiny in-memory frames: as-of join vs a naive
oracle, range join, sessionize, haversine, text ops, multimodal plumbing,
and the HTTP poller with an injected fake fetcher."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.functions import cosine_similarity, haversine_km
from buskafkasparkstreaming_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)
from buskafkasparkstreaming_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    with_binary_payload,
)
from buskafkasparkstreaming_spark.operators.text import winnowing_fingerprint
from buskafkasparkstreaming_spark.operators.windows_fn import sessionize


def test_asof_join_matches_naive(spark):
    probe = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 1, 5), (4, 2, 15), (5, 3, 9)],
        "pid int, k int, t int",
    )
    build = spark.createDataFrame(
        [(100, 1, 10), (101, 1, 15), (102, 2, 1), (103, 2, 15), (104, 9, 1)],
        "bid int, k int, t int",
    )
    out = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], tiebreak="bid", how="inner",
    )
    got = {r["pid"]: r["bid"] for r in out.collect()}
    # pid1 t=10: build (100,t=10) at equal time wins (inclusive <=)
    # pid2 t=20: latest build t=15 -> 101 ; pid3 t=5: none -> dropped (inner)
    # pid4 k=2 t=15: equal-time build 103 ; pid5 k=3: no build -> dropped
    assert got == {1: 100, 2: 101, 4: 103}


def test_asof_join_left_keeps_unmatched(spark):
    probe = spark.createDataFrame([(1, 1, 10), (2, 7, 10)], "pid int, k int, t int")
    build = spark.createDataFrame([(100, 1, 1)], "bid int, k int, t int")
    out = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], how="left",
    )
    got = {r["pid"]: r["bid"] for r in out.collect()}
    assert got == {1: 100, 2: None}


def test_asof_join_forward_and_tolerance(spark):
    probe = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 1, 100)], "pid int, k int, t int"
    )
    build = spark.createDataFrame(
        [(100, 1, 10), (101, 1, 15), (102, 1, 30)], "bid int, k int, t int"
    )
    fwd = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], tiebreak="bid", how="left", direction="forward",
    )
    got = {r["pid"]: r["bid"] for r in fwd.collect()}
    # pid1 t=10: equal-time build wins (inclusive >=); pid2 t=20: next is
    # t=30; pid3 t=100: nothing ahead -> NULL under how='left'
    assert got == {1: 100, 2: 102, 3: None}

    tol = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], tiebreak="bid", how="left",
        direction="backward", tolerance=4,
    )
    got = {r["pid"]: r["bid"] for r in tol.collect()}
    # pid2 t=20: latest build t=15 is 5 away > tolerance 4 -> unmatched;
    # pid3 t=100: latest build t=30 is 70 away -> unmatched
    assert got == {1: 100, 2: None, 3: None}


def test_asof_join_nearest_prefers_backward_on_tie(spark):
    probe = spark.createDataFrame(
        [(1, 1, 20), (2, 1, 26), (3, 1, 2)], "pid int, k int, t int"
    )
    build = spark.createDataFrame(
        [(100, 1, 10), (101, 1, 30)], "bid int, k int, t int"
    )
    out = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], tiebreak="bid", how="inner", direction="nearest",
    )
    got = {r["pid"]: r["bid"] for r in out.collect()}
    # pid1 t=20: both sides 10 away -> backward (100) wins the tie
    # pid2 t=26: forward t=30 (4 away) beats backward t=10 (16 away)
    # pid3 t=2: only forward side exists -> 100
    assert got == {1: 100, 2: 101, 3: 100}


def test_asof_join_directions_match_pandas(spark):
    """Randomized parity with pandas merge_asof on unique (key, time)
    builds for every direction x tolerance combination."""
    import random

    import pandas as pd

    rng = random.Random(7)
    keys = [1, 2, 3]
    build_rows = []
    bid = 0
    seen = set()
    for k in keys:
        for _ in range(20):
            t = rng.randrange(0, 200)
            if (k, t) in seen:
                continue
            seen.add((k, t))
            build_rows.append((bid, k, t))
            bid += 1
    probe_rows = [
        (i, rng.choice(keys + [9]), rng.randrange(0, 220)) for i in range(60)
    ]
    probe = spark.createDataFrame(probe_rows, "pid int, k int, t int")
    build = spark.createDataFrame(build_rows, "bid int, k int, t int")
    pprobe = pd.DataFrame(probe_rows, columns=["pid", "k", "t"]).sort_values("t")
    pbuild = pd.DataFrame(build_rows, columns=["bid", "k", "t"]).sort_values("t")
    for direction in ("backward", "forward", "nearest"):
        for tolerance in (None, 7):
            out = asof_join(
                probe, build, key="k", probe_time="t", build_time="t",
                build_cols=["bid"], tiebreak="bid", how="left",
                direction=direction, tolerance=tolerance,
            )
            got = {r["pid"]: r["bid"] for r in out.collect()}
            exp_df = pd.merge_asof(
                pprobe, pbuild, on="t", by="k", direction=direction,
                tolerance=tolerance,
            )
            exp = {
                int(r.pid): (None if pd.isna(r.bid) else int(r.bid))
                for r in exp_df.itertuples()
            }
            assert got == exp, (direction, tolerance)


def test_range_join_bucketed(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 25.0), (3, 55.0)], "lid int, v double")
    right = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 20.0, 60.0)], "rid int, lo double, hi double"
    )
    out = range_join_bucketed(left, right, "v", "lo", "hi", bucket_width=10.0)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, 10), (2, 20), (3, 20)]


def test_sessionize_gap(spark):
    rows = [(1, 0), (1, 100), (1, 5000), (2, 0)]
    df = spark.createDataFrame(rows, "user int, sec int").withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    out = sessionize(df, "user", "ts", gap_seconds=60)
    got = sorted((r["user"], r["sec"], r["session_id"]) for r in out.collect())
    assert got == [(1, 0, 1), (1, 100, 2), (1, 5000, 3), (2, 0, 1)]


def test_haversine(spark):
    # Toronto Union Station -> CN Tower is ~0.55 km
    df = spark.createDataFrame([(43.6453, -79.3806, 43.6426, -79.3871)], "a double, b double, c double, d double")
    km = df.select(haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")).first()["km"]
    assert 0.4 < km < 0.8


def test_cosine_similarity_identity(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])], "a array<double>, b array<double>")
    v = df.select(cosine_similarity("a", "b").alias("c")).first()["c"]
    assert abs(v - 1.0) < 1e-12


def test_winnowing_sketch_stable(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"), (3, "x y z w v u t s r q")],
        "doc_id int, text string",
    )
    out = winnowing_fingerprint(df).collect()
    sk = {r["doc_id"]: tuple(r["winnow_sketch"]) for r in out}
    assert sk[1] == sk[2]  # identical docs -> identical sketch
    assert sk[1] != sk[3]


def test_multimodal_pipeline(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "foo")], "doc_id bigint, text string")
    feats = extract_features(with_binary_payload(df))
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert 64 <= rows[1]["width"] < 256
    assert len(rows[1]["feat"]) == 8
    # determinism: same payload -> same features
    again = {r["doc_id"]: r for r in extract_features(with_binary_payload(df)).collect()}
    assert rows[1]["feat"] == again[1]["feat"]
    sampled = frame_sample(feats, every_nth=2)
    assert sampled.filter(F.col("frame_idx") % 2 != 0).count() == 0


def _png(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )


def test_image_header_parse():
    import struct

    from buskafkasparkstreaming_spark.operators.multimodal import (
        _real_decode,
        parse_image_header,
    )

    assert parse_image_header(_png(640, 480)) == ("image/png", 640, 480)
    bmp = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", 800, -600)
    assert parse_image_header(bmp + b"\x00" * 4) == ("image/bmp", 800, 600)
    gif = b"GIF89a" + struct.pack("<HH", 320, 240) + b"\x00" * 3
    assert parse_image_header(gif) == ("image/gif", 320, 240)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    )
    assert parse_image_header(jpeg) == ("image/jpeg", 640, 480)
    assert parse_image_header(b"plain text payload") is None
    # 2-byte 'BM' magic alone must not be trusted: a text payload starting
    # with BM has no valid DIB header size at offset 14
    assert parse_image_header(b"BMW dealerships reported record sales") is None
    core = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 100, 50)
    assert parse_image_header(core + b"\x00" * 8) == ("image/bmp", 100, 50)
    # WebP container (RFC 9649): all three chunk variants
    vp8 = b"\x00\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    webp = lambda cc, p: (  # noqa: E731
        b"RIFF" + struct.pack("<I", 12 + len(p)) + b"WEBP"
        + cc + struct.pack("<I", len(p)) + p
    )
    assert parse_image_header(webp(b"VP8 ", vp8)) == ("image/webp", 320, 240)
    vp8l = bytes([0x2F]) + struct.pack("<I", 99 | (49 << 14))
    assert parse_image_header(webp(b"VP8L", vp8l)) == ("image/webp", 100, 50)
    vp8x = b"\x00" * 4 + (799).to_bytes(3, "little") + (599).to_bytes(3, "little")
    assert parse_image_header(webp(b"VP8X", vp8x)) == ("image/webp", 800, 600)
    # RIFF but not WEBP (e.g. WAV) must not parse
    assert parse_image_header(b"RIFF\x10\x00\x00\x00WAVEdata" + b"\x00" * 16) is None
    # _real_decode: header-tier decode works without any codec library
    d = _real_decode(_png(1920, 1080))
    assert (d["mime"], d["width"], d["height"]) == ("image/png", 1920, 1080)
    assert len(d["feat"]) == 8


def test_multimodal_real_decode_strict(spark):
    """Strict mode (use_fake_decoder=False) must decode real image headers
    through the full mapInPandas path — and raise for unknown payloads."""
    rows = [(1, bytearray(_png(640, 480)), "image/png"),
            (2, bytearray(_png(32, 32)), "image/png")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary, mime string")
    out = {
        r["doc_id"]: r
        for r in extract_features(df, use_fake_decoder=False).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (640, 480)
    assert (out[2]["width"], out[2]["height"]) == (32, 32)
    assert out[1]["mime"] == "image/png"
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(3, bytearray(b"not an image"), "application/octet-stream")],
        "doc_id bigint, payload binary, mime string",
    )
    with _pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(bad, use_fake_decoder=False).collect()


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF top-k is approximate but must overlap substantially with exact
    brute force on the probed fraction."""
    from buskafkasparkstreaming_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        train_ivf_centroids,
    )
    from buskafkasparkstreaming_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # trained centroids must do at least as well as the old arbitrary-row
    # quantizer did at the same nprobe (its floor was 0.2)
    centroids = train_ivf_centroids(emb, "embedding", nlist=50)
    assert centroids.count() <= 50
    exact = cosine_topk(queries, emb, "vec_id", "vec_id", k=5).collect()
    approx = ivf_cosine_topk(
        queries, emb, centroids, "vec_id", "vec_id", k=5, nprobe=3
    ).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    # determinism: retraining yields the identical centroid set
    again = train_ivf_centroids(emb, "embedding", nlist=50)
    assert centroids.collect() == again.collect()
    # every approx result must be a genuinely computed cosine (sanity)
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in approx)


def test_pq_encode_and_adc_recall(spark, sf_dir):
    """PQ invariants: (a) encoding emits exactly one code row per corpus
    vector, each an m-length array with codes in [0, ksub); (b) the ADC
    shortlist + exact-rerank pipeline overlaps the exact top-k at least as
    well as the entry's 0.2 floor; (c) retraining is deterministic; (d)
    rerank output is a true per-query rank 1..k with valid cosines."""
    from buskafkasparkstreaming_spark.operators.similarity import (
        cosine_topk,
        pq_adc_rerank_topk,
        pq_encode,
        train_pq_codebooks,
    )
    from buskafkasparkstreaming_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    books = train_pq_codebooks(emb, "embedding", dim=64, m=4, ksub=16)
    books = books.localCheckpoint(eager=False)
    assert books.count() == 4 * 16
    codes = pq_encode(emb, books, "vec_id", "embedding", dim=64, m=4)
    rows = codes.collect()
    assert len(rows) == n_corpus
    assert all(
        len(r["codes"]) == 4 and all(0 <= c < 16 for c in r["codes"])
        for r in rows
    )
    queries = emb.filter(F.col("vec_id") < 10)
    approx = pq_adc_rerank_topk(
        queries, codes, emb, books, "vec_id", "vec_id", k=5, shortlist=50
    ).collect()
    exact = cosine_topk(queries, emb, "vec_id", "vec_id", k=5).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"PQ-ADC recall collapsed: {recall}"
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert -1.0 <= r["cos_sim"] <= 1.0
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    again = train_pq_codebooks(emb, "embedding", dim=64, m=4, ksub=16)
    assert books.collect() == again.collect()


def test_pq_train_rejects_sample_smaller_than_ksub(spark):
    """The ADC LUT is indexed at stride ksub, so a training sample with
    fewer rows than ksub must FAIL loudly — a short codebook would
    silently misalign every lookup (ADVICE r8)."""
    import pytest as _pytest

    from buskafkasparkstreaming_spark.operators.similarity import (
        train_pq_codebooks,
    )

    tiny = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(5)],
        "vec_id int, embedding array<float>",
    )
    books = train_pq_codebooks(tiny, "embedding", dim=8, m=2, ksub=16)
    with _pytest.raises(Exception, match="ksub"):
        books.collect()


def test_ivfadc_recall_and_pruning(spark, sf_dir):
    """IVFADC invariants: (a) every corpus vector gets exactly one
    (bucket, codes) row with valid code bounds; (b) the composed
    prune+residual-ADC+rerank pipeline clears the entry's 0.2 recall
    floor; (c) the scored candidate set is genuinely PRUNED — each query
    scores only codes in its nprobe probed buckets."""
    from buskafkasparkstreaming_spark.operators.similarity import (
        assign_buckets,
        cosine_topk,
        ivfadc_build,
        ivfadc_topk,
        train_ivf_centroids,
    )
    from buskafkasparkstreaming_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    cents = train_ivf_centroids(emb, "embedding", nlist=50).localCheckpoint()
    codes, books = ivfadc_build(emb, cents, "vec_id", "embedding")
    codes = codes.localCheckpoint()
    books = books.localCheckpoint()
    rows = codes.collect()
    assert len(rows) == n_corpus
    assert all(
        len(r["codes"]) == 4 and all(0 <= c < 16 for c in r["codes"])
        for r in rows
    )
    queries = emb.filter(F.col("vec_id") < 10)
    approx = ivfadc_topk(
        queries, codes, cents, books, emb, "vec_id", "vec_id",
        k=5, nprobe=4, shortlist=50,
    ).collect()
    exact = cosine_topk(queries, emb, "vec_id", "vec_id", k=5).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"IVFADC recall collapsed: {recall}"
    # pruning: every returned neighbor lives in one of its query's
    # probed buckets
    qn = queries.select(
        "vec_id",
        F.col("embedding").alias("__qn"),
    )
    probed = {
        (r["vec_id"], r["bucket"])
        for r in assign_buckets(
            qn, cents, id_col="vec_id", corpus_vec="__qn", nprobe=4
        ).collect()
    }
    bucket_of = {r["neighbor_id"]: r["bucket"] for r in rows}
    assert all(
        (q, bucket_of[nid]) in probed for (q, nid) in approx_pairs
    ), "IVFADC returned a neighbor outside the probed buckets"


def _real_png(w, h, rgb, filter_type=0):
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    if filter_type == 0:
        raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    else:  # Sub filter: first pixel literal, rest delta-0 (solid color)
        raw = b"".join(
            b"\x01" + bytes(rgb) + b"\x00" * (3 * (w - 1)) for _ in range(h)
        )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _real_bmp(w, h, rgb):
    import struct

    stride = (w * 3 + 3) & ~3
    pixel_data = (bytes([rgb[2], rgb[1], rgb[0]]) * w + b"\x00" * (stride - 3 * w)) * h
    header = (
        b"BM"
        + struct.pack("<I", 54 + len(pixel_data))
        + b"\x00" * 4
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", w, h)
        + struct.pack("<HH", 1, 24)
        + struct.pack("<I", 0)
        + b"\x00" * 20
    )
    return header + pixel_data


def test_pixel_decode_png_bmp():
    """REAL pixel decode, pure stdlib: solid-color PNG (both filter 0 and
    Sub-filtered scanlines) and 24-bit BMP decode to exact mean colors."""
    from buskafkasparkstreaming_spark.operators.multimodal import (
        _real_decode,
        decode_pixels,
    )

    w, h, feat = decode_pixels(_real_png(6, 4, (255, 0, 0)))
    assert (w, h) == (6, 4)
    assert feat[:3] == [1.0, 0.0, 0.0]
    assert abs(feat[3] - 0.299) < 1e-6  # luma of pure red

    w, h, feat_sub = decode_pixels(_real_png(6, 4, (255, 0, 0), filter_type=1))
    assert feat_sub == feat  # Sub-filtered encoding of the same image

    w, h, feat_bmp = decode_pixels(_real_bmp(5, 3, (0, 128, 255)))
    assert (w, h) == (5, 3)
    assert feat_bmp[0] == 0.0
    assert abs(feat_bmp[1] - 128 / 255) < 1e-6
    assert feat_bmp[2] == 1.0

    # _real_decode promotes pixel features over the hash fallback
    d = _real_decode(_real_png(6, 4, (255, 0, 0)))
    assert (d["mime"], d["width"], d["height"]) == ("image/png", 6, 4)
    assert d["feat"][:3] == [1.0, 0.0, 0.0]

    # header-only PNG (no IDAT) still decodes at the header tier
    d2 = _real_decode(_png(640, 480))
    assert (d2["width"], d2["height"]) == (640, 480)
    assert len(d2["feat"]) == 8


def test_pixel_decode_through_strict_pipeline(spark):
    """The mapInPandas strict path must carry pixel features end-to-end."""
    rows = [(1, bytearray(_real_png(8, 8, (0, 255, 0))), "image/png"),
            (2, bytearray(_real_bmp(4, 4, (255, 255, 255))), "image/bmp")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary, mime string")
    out = {r["doc_id"]: r for r in extract_features(df, use_fake_decoder=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (8, 8)
    assert list(out[1]["feat"])[:3] == [0.0, 1.0, 0.0]
    assert list(out[2]["feat"])[:3] == [1.0, 1.0, 1.0]


def test_connected_components_chain_and_warning(spark):
    import warnings

    from buskafkasparkstreaming_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a int, id_b int"
    )
    out = connected_components(pairs)
    got = {r["node"]: r["comp"] for r in out.collect()}
    out.unpersist()
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # exhausting max_iter before the fixpoint must warn, not return
    # silently — max_iter governs the DISTRIBUTED tier, so force it
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out2 = connected_components(pairs, max_iter=0, driver_max_edges=0)
        out2.unpersist()
    assert any("max_iter" in str(w.message) for w in caught)


def test_http_poller_spool(spark, tmp_path):
    from buskafkasparkstreaming_spark.sources.http_poller import poll_to_spool

    body = {
        "items": [
            {"id": 8326, "routeId": 510, "directionId": "510_0", "kph": 20,
             "secsSinceReport": 5, "heading": 90, "lat": 43.66, "lon": -79.41},
            {"id": 8327, "routeId": 510, "directionId": "510_1", "kph": 30,
             "secsSinceReport": 2, "heading": 270, "lat": 43.65, "lon": -79.40},
        ]
    }
    clock = iter([1000, 2000])
    paths = list(
        poll_to_spool(
            str(tmp_path / "spool"),
            fetch=lambda url: body,
            interval_s=0.0,
            max_polls=2,
            clock_ms=lambda: next(clock),
        )
    )
    assert len(paths) == 2
    lines = []
    for p in paths:
        with open(p) as fh:
            lines += [json.loads(line) for line in fh]
    assert len(lines) == 4
    rids = [e["payload"]["after"]["record_id"] for e in lines]
    assert rids == [1, 2, 3, 4]  # auto-increment across polls
    assert all(e["payload"]["op"] == "c" for e in lines)


def test_duplicated_spans_merge_semantics(spark):
    """Hand-crafted corpus: a shared 10-word passage inside two docs must
    surface as ONE maximal merged span per doc (overlapping 8-word windows
    collapse); a doc with no cross-doc duplication yields nothing."""
    from buskafkasparkstreaming_spark.operators.dedup import duplicated_spans

    passage = " ".join(f"w{i}" for i in range(10))  # 10 shared words
    rows = [
        (1, "alpha beta " + passage + " gamma"),        # passage at words 3..12
        (2, passage + " delta epsilon"),                # passage at words 1..10
        (3, "totally unique words " + " ".join(f"u{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.id: (r.span_start, r.span_end, r.n_windows)
        for r in duplicated_spans(df, "doc_id", window=8, min_docs=2).collect()
    }
    # 10-word passage -> 3 overlapping 8-word windows (positions p, p+1, p+2)
    assert out[1] == (3, 12, 3)
    assert out[2] == (1, 10, 3)
    assert 3 not in out


def test_token_budget_mix_edge_semantics(spark):
    """Inclusive budget edge: the row whose running total EQUALS the budget
    stays; the next row is dropped; a domain whose first row alone exceeds
    the budget contributes nothing."""
    from buskafkasparkstreaming_spark.operators.sampling import token_budget_mix

    rows = [
        # domain a: three 10-token docs, budget 20 -> exactly two kept
        (1, "a", 10), (2, "a", 10), (3, "a", 10),
        # domain b: first-ranked doc alone exceeds the budget
        (4, "b", 100),
    ]
    df = spark.createDataFrame(rows, "doc_id int, domain string, n int")
    out = token_budget_mix(df, "doc_id", "domain", "n", budget_tokens=20)
    got = {r.doc_id for r in out.collect()}
    a_kept = got & {1, 2, 3}
    assert len(a_kept) == 2          # 2 of 3 ten-token docs fit the 20 budget
    assert 4 not in got              # over-budget singleton dropped


def test_semantic_dedup_keep_rule(spark):
    """Two tight near-dup groups in opposite half-spaces + one singleton:
    clusters split by the centroid argmax, rep = min id per cos>=t group,
    singletons kept."""
    from buskafkasparkstreaming_spark.operators.dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.01]),   # near-dup of 1
        (3, [-1.0, 0.05]),
        (4, [-0.999, 0.06]),  # near-dup of 3
        (5, [0.0, 1.0]),      # singleton (orthogonal to both groups)
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "centroid_id bigint, embedding array<double>",
    )
    out = {
        r["doc_id"]: (r["cluster"], r["rep_id"], r["is_dup"])
        for r in semantic_dedup(
            corpus, cents, "doc_id", "embedding", threshold=0.95
        ).collect()
    }
    assert out[1] == (0, 1, False)
    assert out[2] == (0, 1, True)
    assert out[3] == (1, 3, False)
    assert out[4] == (1, 3, True)
    # doc 5: cos to both groups < 0.95 -> kept, rep is itself
    assert out[5][1] == 5 and out[5][2] is False


def test_lm_unigram_score_discriminates(spark):
    """Docs made of corpus-frequent tokens must out-score docs of rare
    tokens; integer fixed-point columns must be consistent with the
    derived double."""
    from buskafkasparkstreaming_spark.operators.text import lm_unigram_score

    rows = [
        (1, "the the the the"),        # frequent tokens
        (2, "the cat sat here"),       # mixed
        (3, "zyx qwv jkl pfb"),        # singletons
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["id"]: r
        for r in lm_unigram_score(docs, "doc_id", "text").collect()
    }
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"] > out[3]["avg_logprob"]
    for r in out.values():
        assert r["n_tokens"] == 4
        assert abs(r["avg_logprob"] - r["sum_nats_fp"] / 4 / 10_000) < 1e-12


def test_prototypicality_prune_semantics(spark):
    """Cluster of 4 around +x with graded distances + singleton cluster:
    the most prototypical drop_pct% per cluster are dropped, ranked by
    cosine to the cluster centroid; a 1-element cluster keeps its row
    (rank 1 of 1 survives any drop_pct < 100)."""
    from buskafkasparkstreaming_spark.operators.sampling import (
        prototypicality_prune,
    )

    rows = [
        (1, [1.0, 0.0]),      # closest to centroid -> dropped at 25%
        (2, [0.9, 0.1]),
        (3, [0.8, 0.3]),
        (4, [0.5, 0.8]),      # least prototypical
        (5, [-1.0, 0.0]),     # own cluster, singleton
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "centroid_id bigint, embedding array<double>",
    )
    out = {
        r["doc_id"]: r
        for r in prototypicality_prune(
            corpus, cents, "doc_id", "embedding", drop_pct=25
        ).collect()
    }
    assert [out[i]["proto_rank"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert not out[1]["is_kept"]          # rank 1 of 4 -> 100 <= 4*25
    assert out[2]["is_kept"] and out[3]["is_kept"] and out[4]["is_kept"]
    assert out[5]["is_kept"] and out[5]["n_cluster"] == 1


def test_chunk_documents_boundaries(spark):
    """Chunk/overlap boundary semantics: short doc -> itself; exact
    multiple of stride -> no empty tail; overlap repeats the boundary
    words; overlap >= chunk rejected."""
    import pytest as _pytest

    from buskafkasparkstreaming_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c"),                       # shorter than one chunk
            (2, "a b c d e f g h"),             # 8 words = 2 chunks at stride 4
            (3, "a b c d e f g h i"),           # 9 words -> 3rd short chunk
        ],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=6, overlap=2)
    rows = {(r["id"], r["chunk_id"]): r for r in out.collect()}
    assert rows[(1, 0)]["chunk_text"] == "a b c" and rows[(1, 0)]["n_chunks"] == 1
    # stride 4: chunk0 = words 1..6, chunk1 = words 5..10 (clipped)
    assert rows[(2, 0)]["chunk_text"] == "a b c d e f"
    assert rows[(2, 1)]["chunk_text"] == "e f g h"       # overlap e f
    assert rows[(2, 1)]["chunk_len"] == 4
    assert rows[(3, 2)]["chunk_text"] == "i" and rows[(3, 2)]["n_chunks"] == 3
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_zorder_key_bit_interleave(spark):
    """Morton-key ground truth on known bit patterns."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(3, 0), (0, 3), (3, 3), (0b10, 0b01)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(
            zorder_key(F.col("a"), F.col("b"), bits=2).alias("z")
        ).collect()
    ]
    # a-bits at even positions, b-bits at odd: (3,0)->0101, (0,3)->1010,
    # (3,3)->1111, (2,1)->0110
    assert got == [0b0101, 0b1010, 0b1111, 0b0110]


def test_zorder_layout_quadrant_locality(spark):
    """On an aligned 64x64 grid with 16 Z-space buckets, every file is
    exactly one 16x16 quadrant — per-file spans are 15 in BOTH dimensions
    (a 1-D sort would span the full 63 in the other dimension). This is
    the data-skipping guarantee the layout exists for."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.layout import zorder_layout

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    out = zorder_layout(grid, "a", "b", bits=6, num_files=16)
    spans = (
        out.groupBy("file_id")
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(spans) == 16
    for r in spans:
        assert r["sa"] == 15 and r["sb"] == 15 and r["n"] == 256


def test_write_zordered_files_sorted(spark, tmp_path):
    """The production rewrite writes range-partitioned parquet sorted by
    zkey within each file (the row-group pruning precondition)."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.layout import write_zordered

    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("a"), (F.col("id") / 32).cast("long").alias("b")
    )
    path = str(tmp_path / "zordered")
    write_zordered(grid, path, "a", "b", bits=5, num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    import glob

    files = glob.glob(path + "/part-*.parquet")
    assert 1 < len(files) <= 4
    for f in files:
        zs = [r["zkey"] for r in spark.read.parquet(f).select("zkey").collect()]
        assert zs == sorted(zs)


def test_profile_columns_nulls_and_cardinality(spark):
    from buskafkasparkstreaming_spark.operators.stats import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id bigint, tag string"
    )
    rows = {r["column"]: r for r in profile_columns(df, ["id", "tag"]).collect()}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_null"] == 0
    assert rows["id"]["n_distinct"] == 4
    assert rows["id"]["min_str"] == "1" and rows["id"]["max_str"] == "4"
    # count(DISTINCT) and min/max ignore NULLs; the null count reports them
    assert rows["tag"]["n_null"] == 1 and rows["tag"]["n_distinct"] == 2
    assert rows["tag"]["min_str"] == "a" and rows["tag"]["max_str"] == "b"


def test_semantic_dedup_matches_numpy_reference(spark):
    """Seeded random corpus vs an independent NumPy implementation of the
    full SemDeDup contract (argmax-cosine assignment with lowest-id tie
    break, within-cluster threshold pairs, union-find, min-id rep)."""
    import numpy as np

    from buskafkasparkstreaming_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(11)
    n, dim, ncent, thr = 60, 8, 4, 0.6
    vecs = rng.randn(n, dim)
    # plant exact duplicate groups to exercise the union-find
    vecs[10] = vecs[3]
    vecs[11] = vecs[3]
    vecs[40] = vecs[25]
    cents = rng.randn(ncent, dim)

    def cos(a, b):
        return float(a @ b) / float(np.sqrt((a @ a) * (b @ b)))

    assign = [
        max(range(ncent), key=lambda c: (cos(vecs[i], cents[c]), -c))
        for i in range(n)
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if assign[i] == assign[j] and cos(vecs[i], vecs[j]) >= thr:
                parent[find(j)] = find(i)
    comp_min = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expected = {
        i: (assign[i], comp_min[find(i)], comp_min[find(i)] != i)
        for i in range(n)
    }

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "doc_id bigint, embedding array<double>",
    )
    cdf = spark.createDataFrame(
        [(c, [float(x) for x in cents[c]]) for c in range(ncent)],
        "centroid_id bigint, embedding array<double>",
    )
    got = {
        r["doc_id"]: (r["cluster"], r["rep_id"], r["is_dup"])
        for r in semantic_dedup(
            corpus, cdf, "doc_id", "embedding", threshold=thr
        ).collect()
    }
    assert got == expected


def test_incremental_lsh_matches_self_join_restriction(spark):
    """Batch x corpus incremental candidates must equal the full self-join
    candidates restricted to crossing pairs (same bands, same sketches)."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_incremental,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(i, base + f"tail {i % 4}") for i in range(40)]  # 4 dup groups
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = minhash_signatures(docs, "doc_id", k=3, num_hashes=16)
    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, bands=4, rows_per_band=4).collect()
    }
    crossing_full = {
        (a, b) for a, b in full if (a % 10 == 0) != (b % 10 == 0)
    }
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    inc = {
        (min(r["new_id"], r["corpus_id"]), max(r["new_id"], r["corpus_id"]))
        for r in lsh_candidate_pairs_incremental(
            minhash_signatures(batch, "doc_id", k=3, num_hashes=16),
            minhash_signatures(corpus, "doc_id", k=3, num_hashes=16),
            bands=4,
            rows_per_band=4,
        ).collect()
    }
    assert inc == crossing_full and len(inc) > 0


def test_curriculum_stages_banding(spark):
    """Standard-score bands: scores at/above mean -> 1, within 1 sigma
    below -> 2, beyond 2 sigma -> 4; degenerate all-equal corpus -> all 1."""
    from buskafkasparkstreaming_spark.operators.sampling import curriculum_stages

    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100), (5, 100), (6, 100),
         (7, 100), (8, 100), (9, 0)],
        "doc_id bigint, score bigint",
    )
    # mean = 88.9, sigma ≈ 31.4: the 100s sit above mean -> 1, the 0 sits
    # ~2.8 sigma below -> 4
    out = {r["doc_id"]: r["stage"] for r in curriculum_stages(df, "doc_id", "score").collect()}
    assert all(out[i] == 1 for i in range(1, 9)) and out[9] == 4
    flat = spark.createDataFrame([(1, 5), (2, 5)], "doc_id bigint, score bigint")
    assert {r["stage"] for r in curriculum_stages(flat, "doc_id", "score").collect()} == {1}


def test_lm_bigram_score_conditional_semantics(spark):
    """A doc repeating a corpus-frequent bigram out-scores one of unseen
    bigrams; single-word docs are absent (no context to condition on)."""
    from buskafkasparkstreaming_spark.operators.text import lm_bigram_score

    rows = [
        (1, "to be to be to be"),   # frequent bigrams
        (2, "to be or not here"),   # mixed
        (3, "zyx qwv jkl pfb"),     # singleton bigrams
        (4, "solo"),                # no bigram -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["id"]: r for r in lm_bigram_score(docs, "doc_id", "text").collect()}
    assert 4 not in out and len(out) == 3
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"] > out[3]["avg_logprob"]
    assert out[1]["n_bigrams"] == 5 and out[3]["n_bigrams"] == 3


def test_hashed_linear_score_deterministic_lookup(spark):
    """Same word always hits the same bucket; score is the exact integer
    sum of per-word weights; repeated words scale linearly."""
    from buskafkasparkstreaming_spark.operators.text import hashed_linear_score

    weights = [i * 1000 for i in range(16)]  # distinguishable buckets
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha alpha alpha"), (3, "alpha beta")],
        "doc_id bigint, text string",
    )
    out = {r["id"]: r for r in hashed_linear_score(docs, weights).collect()}
    w_alpha = out[1]["score_fp"]
    assert out[2]["score_fp"] == 3 * w_alpha and out[2]["n_words"] == 3
    w_beta = out[3]["score_fp"] - w_alpha
    assert w_beta in weights  # beta resolved to exactly one bucket weight
    assert abs(out[3]["mean_weight"] - out[3]["score_fp"] / 2 / 1e6) < 1e-12


def test_remove_boilerplate_chunks_rewrites_docs(spark):
    """Shared header chunks vanish, unique content survives in order, and a
    doc that is ALL boilerplate still emits a row with empty clean_text."""
    from buskafkasparkstreaming_spark.operators.dedup import (
        remove_boilerplate_chunks,
    )

    rows = [
        (1, "cookie policy notice alpha beta gamma"),
        (2, "cookie policy notice delta epsilon zeta"),
        (3, "cookie policy notice eta theta iota"),
        (4, "totally unique content lives right here"),
        (5, "cookie policy notice"),  # all boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.id: r
        for r in remove_boilerplate_chunks(
            df, "doc_id", chunk_words=3, min_docs=3
        ).collect()
    }
    assert out[1].clean_text == "alpha beta gamma"
    assert out[1].n_chunks == 2 and out[1].n_dropped == 1
    assert out[4].clean_text == "totally unique content lives right here"
    assert out[4].n_dropped == 0
    assert out[5].clean_text == "" and out[5].n_dropped == 1
    assert set(out) == {1, 2, 3, 4, 5}


def test_write_shards_one_file_per_shard_and_stable(spark, tmp_path, sf_dir):
    """Shard export: every shard dir holds exactly ONE parquet file, the
    readback equals the input, and assignment is a pure row function
    (re-assigning on the readback reproduces the same shard per row)."""
    import glob

    from buskafkasparkstreaming_spark.operators.export import (
        assign_shards,
        write_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    write_shards(docs, out, "doc_id", num_shards=8)
    for k in range(8):
        files = glob.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) == 1, f"shard {k}: {len(files)} files"
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    re_assigned = assign_shards(back.drop("shard"), "doc_id", 8)
    assert (
        back.select("doc_id", "shard")
        .exceptAll(re_assigned.select("doc_id", "shard"))
        .count()
        == 0
    )


def test_assign_shards_is_rowlocal_project(spark, sf_dir):
    """No shuffle: shard assignment must stay a pure Project over the scan."""
    from buskafkasparkstreaming_spark.operators.export import assign_shards
    from buskafkasparkstreaming_spark.plans import explain_str

    df = assign_shards(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", 16
    )
    assert "Exchange" not in explain_str(df)


def test_count_min_sketch_merge_and_bound(spark):
    """CMS invariants: (a) estimates never undercount; (b) the sketch of a
    union equals the counter-sum of per-part sketches (mergeability — what
    makes the sketch incrementally maintainable per ingest tick)."""
    from buskafkasparkstreaming_spark.operators.stats import (
        cms_point_query,
        count_min_sketch,
    )

    words = ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5 + ["delta"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    sketch = count_min_sketch(df, "word", depth=3, width=32)
    exact = df.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n"))
    est = {
        r.word: (r.n, r.cms_estimate)
        for r in cms_point_query(sketch, exact, "word", depth=3, width=32).collect()
    }
    for w, (n, e) in est.items():
        assert e >= n, f"{w}: CMS undercounted ({e} < {n})"
    assert est["alpha"][1] == 50  # heavy hitter exact at this load factor

    # mergeability: sum of per-part counter grids == whole-corpus grid
    part_a = spark.createDataFrame([(w,) for w in words[:30]], "word string")
    part_b = spark.createDataFrame([(w,) for w in words[30:]], "word string")
    merged = (
        count_min_sketch(part_a, "word", depth=3, width=32)
        .unionByName(count_min_sketch(part_b, "word", depth=3, width=32))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert merged.exceptAll(sketch).count() == 0
    assert sketch.exceptAll(merged).count() == 0


def test_bm25_ranking_semantics(spark):
    """More query-term occurrences rank higher; equal term counts in a
    LONGER doc rank lower (length normalization); non-matching docs are
    absent."""
    from buskafkasparkstreaming_spark.operators.text import bm25_scores

    rows = [
        (1, "spark spark spark filler filler"),
        (2, "spark filler filler filler filler"),
        (3, "spark filler filler filler filler filler filler filler filler filler"),
        (4, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: r.bm25_fp for r in bm25_scores(df, "doc_id", ["spark"]).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] > got[2] > got[3] > 0


def test_asof_join_null_times(spark):
    """NULL build times never match; NULL probe times match nothing but
    survive a left join unmatched."""
    probe = spark.createDataFrame(
        [(1, 1, 10), (2, 1, None)], "pid int, k int, t int"
    )
    build = spark.createDataFrame(
        [(100, 1, 5), (999, 1, None)], "bid int, k int, t int"
    )
    inner = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], how="inner",
    )
    assert {(r.pid, r.bid) for r in inner.collect()} == {(1, 100)}
    left = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], how="left",
    )
    assert {(r.pid, r.bid) for r in left.collect()} == {(1, 100), (2, None)}


def test_sessionize_drops_null_ts(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, None), (1, 5000)], "user int, sec int"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    out = sessionize(df, "user", "ts", gap_seconds=60)
    got = sorted((r.user, r.sec, r.session_id) for r in out.collect())
    assert got == [(1, 0, 1), (1, 5000, 2)]


def test_leakage_safe_split_quarantines_near_dups(spark):
    """A train doc nearly identical to a test doc must be quarantined;
    unrelated train docs stay in train; every doc appears exactly once."""
    from buskafkasparkstreaming_spark.operators.sampling import (
        _bucket_hex,
        _hex_threshold,
        leakage_safe_split,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(i, base + f"tail{i % 2}") for i in range(40)] + [
        (100 + i, f"completely unrelated text number {i} about nothing shared")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.split for r in leakage_safe_split(df, "doc_id").collect()}
    assert len(out) == 50
    test_ids = {d for d, s in out.items() if s == "test"}
    assert test_ids, "hash split produced no test docs in this id range"
    # every base-family train doc sharing a test doc's family is quarantined
    fam_test = {d % 2 for d in test_ids if d < 100}
    for d, s in out.items():
        if d < 100 and d not in test_ids and (d % 2) in fam_test:
            assert s == "quarantined", f"doc {d} leaked into train"
        if d >= 100 and d not in test_ids:
            assert s == "train", f"unrelated doc {d} wrongly {s}"


def test_pagerank_fixed_point_semantics(spark):
    """Star graph: the hub out-ranks every leaf; an isolated node keeps
    only teleport mass; total mass is conserved up to integer truncation;
    ranks are deterministic BIGINTs (exactly reproducible run to run)."""
    from buskafkasparkstreaming_spark.operators.graph import (
        pagerank_fixed_point,
    )

    # hub 0 <-> leaves 1..4 (undirected), node 9 isolated
    und = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 9]], "id long")
    r = {x.id: x.rank_fp for x in pagerank_fixed_point(edges, nodes, iters=3).collect()}
    assert r[0] > r[1] > r[9]
    assert r[1] == r[2] == r[3] == r[4]  # symmetric leaves identical
    assert sum(r.values()) <= 10**12  # mass never created
    # the isolated node is DANGLING: its mass leaks (documented
    # simplification) and it retains exactly the teleport term
    assert r[9] == (10**12 // 8) // 6
    r2 = {x.id: x.rank_fp for x in pagerank_fixed_point(edges, nodes, iters=3).collect()}
    assert r == r2


def test_hll_sketch_merge_and_accuracy(spark):
    """HLL invariants: (a) the register table of a union equals the
    bucketwise max of per-part sketches (mergeability — incremental
    distinct counting per ingest tick); (b) ranks stay in [1, 53];
    (c) the estimate lands within the 3-sigma HLL error band."""
    from buskafkasparkstreaming_spark.operators.stats import (
        hll_estimate_col,
        hll_merge,
        hll_sketch,
        hll_stats,
    )

    df = spark.range(0, 5000).select(F.col("id").alias("uid"))
    sketch = hll_sketch(df, "uid")
    ranks = [r.rank for r in sketch.collect()]
    assert all(1 <= r <= 53 for r in ranks)

    part_a = df.filter(F.col("uid") < 2000)
    part_b = df.filter(F.col("uid") >= 1500)  # overlap on purpose
    merged = hll_merge(hll_sketch(part_a, "uid"), hll_sketch(part_b, "uid"))
    assert merged.exceptAll(sketch).count() == 0
    assert sketch.exceptAll(merged).count() == 0

    est = (
        hll_stats(sketch)
        .select(hll_estimate_col(F.col("sum_fp"), F.col("empty_buckets")).alias("est"))
        .first()["est"]
    )
    assert abs(est - 5000) / 5000 < 3 * 1.04 / (256 ** 0.5), est


def test_hll_adaptive_sparse_dense_promotion(spark):
    """HLL++ adaptive invariants: (a) a group at the cap stays sparse and
    EXACT, one distinct value past the cap promotes to dense; (b) sparse
    n_kept equals the true distinct count (losslessness below the cap);
    (c) kept state is bounded at cap+1 regardless of group size; (d) the
    dense fallback lands inside the HLL 3-sigma band."""
    from buskafkasparkstreaming_spark.operators.stats import (
        hll_adaptive_stats,
        hll_estimate_col,
    )

    cap = 32
    # group 'at': exactly cap distinct; 'over': cap+1; 'big': 4000
    rows = (
        [("at", i) for i in range(cap)]
        + [("over", i) for i in range(cap + 1)]
        + [("big", i) for i in range(4000)]
        # duplicates must not affect distinctness
        + [("at", 0), ("over", 1), ("big", 2)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: r
        for r in hll_adaptive_stats(df, "v", ["g"], sparse_cap=cap).collect()
    }
    assert out["at"]["mode"] == "sparse" and out["at"]["n_kept"] == cap
    assert out["over"]["mode"] == "dense"
    assert out["big"]["mode"] == "dense"
    assert all(r["n_kept"] <= cap + 1 for r in out.values())
    est = (
        spark.createDataFrame(
            [(out["big"]["hll_sum_fp"], out["big"]["empty_buckets"])],
            "sum_fp long, empty_buckets long",
        )
        .select(
            hll_estimate_col(F.col("sum_fp"), F.col("empty_buckets")).alias("e")
        )
        .first()["e"]
    )
    assert abs(est - 4000) / 4000 < 3 * 1.04 / (256 ** 0.5), est


def test_theta_sketch_merge_setops_accuracy(spark):
    """Theta-sketch invariants: (a) per-tick mergeability — the union of
    two part sketches equals the sketch of the whole set (same entries,
    same theta); (b) set-op estimates land inside the ~3/sqrt(k) KMV
    error band; (c) under-full sketches are EXACT (theta = 2^52,
    estimate == distinct count); (d) disjoint sets estimate an empty
    intersection."""
    from buskafkasparkstreaming_spark.operators.stats import (
        THETA_MAX_FP,
        theta_diff,
        theta_estimate,
        theta_intersect,
        theta_sketch,
        theta_union,
    )

    k = 64
    df = spark.range(0, 4000).select(F.col("id").alias("uid"))
    whole = theta_sketch(df, "uid", k)
    part_a = df.filter(F.col("uid") < 2500)
    part_b = df.filter(F.col("uid") >= 2000)  # overlap on purpose
    a, b = theta_sketch(part_a, "uid", k), theta_sketch(part_b, "uid", k)
    merged = theta_union(a, b, k)
    assert merged.entries.exceptAll(whole.entries).count() == 0
    assert whole.entries.exceptAll(merged.entries).count() == 0
    assert (
        merged.theta.first()["theta_fp"] == whole.theta.first()["theta_fp"]
    )

    band = 3.0 / (k ** 0.5)
    for sk, true_n in (
        (whole, 4000),
        (theta_intersect(a, b), 500),
        (theta_diff(a, b), 2000),
    ):
        est = theta_estimate(sk).first()["estimate"]
        assert abs(est - true_n) / true_n < band, (est, true_n)

    # exact mode: fewer distinct items than k
    small = theta_sketch(df.filter(F.col("uid") < 20), "uid", k)
    row = theta_estimate(small).first()
    assert row["theta_fp"] == THETA_MAX_FP
    assert row["n_retained"] == 20 and row["estimate"] == 20.0

    # disjoint sets: intersection estimate is 0 (no false entries)
    c = theta_sketch(df.filter(F.col("uid") >= 3000), "uid", k)
    d = theta_sketch(df.filter(F.col("uid") < 1000), "uid", k)
    assert theta_estimate(theta_intersect(c, d)).first()["n_retained"] == 0


def test_tfidf_cosine_hand_computed(spark):
    """Hand-checked sparse cosine: integer weights, exact dot/norms,
    no pair for docs sharing no term, and the max_df stop-term cap."""
    import math

    from buskafkasparkstreaming_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple banana"),
            (3, "cherry cherry cherry"),
        ],
        ["doc_id", "text"],
    )
    # N=3: every df is too common for a >1 IDF bucket, so w == tf.
    # dot(1,2) = 2*1 + 1*1 = 3; n2 = 5 and 2; cos = 3/sqrt(10).
    # max_df_frac=(1,1) keeps the full tiny vocabulary.
    rows = tfidf_cosine_pairs(
        docs, "doc_id", threshold=0.5, max_df_frac=(1, 1)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["dot"]) == (1, 2, 3)
    assert r["cosine"] == 3.0 / math.sqrt(5.0 * 2.0)
    # doc 3 shares no term: the inverted index never emits the pair
    assert all(row["id_a"] != 3 and row["id_b"] != 3 for row in rows)

    # relative cap df/N <= 1/3: apple/banana (df=2, 2*3 > 3) become stop
    # terms; only cherry (df=1) survives and it lives in one doc -> no
    # pairs at all
    assert (
        tfidf_cosine_pairs(
            docs, "doc_id", threshold=0.0, max_df_frac=(1, 3)
        ).count()
        == 0
    )


def test_weighted_sample_bias_and_determinism(spark):
    """A-ES sample is a pure function of (id, salt) — identical across
    runs — and inclusion probability tracks the weight: with 100 rows at
    weight 100 vs 900 rows at weight 1, the k=100 sample is dominated by
    the heavy rows."""
    from buskafkasparkstreaming_spark.operators.sampling import weighted_sample

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") < 100, F.lit(100)).otherwise(F.lit(1)).alias("w"),
    )
    s1 = {r.id for r in weighted_sample(df, "id", "w", k=100).collect()}
    s2 = {r.id for r in weighted_sample(df, "id", "w", k=100).collect()}
    assert s1 == s2
    heavy = sum(1 for i in s1 if i < 100)
    assert heavy >= 70, f"only {heavy}/100 heavy rows sampled"
    # zero/NULL weights can never be drawn
    z = spark.createDataFrame([(1, 0), (2, None), (3, 5)], "id int, w int")
    got = {r.id for r in weighted_sample(z, "id", "w", k=10).collect()}
    assert got == {3}


def test_dsir_importance_favors_target_like_docs(spark):
    """The DSIR log-ratio is higher for docs whose vocabulary matches the
    target domain: with target docs speaking vocab A and the rest vocab
    B, an A-speaking candidate outweighs a B-speaking one."""
    from buskafkasparkstreaming_spark.operators.sampling import (
        dsir_importance_sample,
    )

    rows = [
        (1, "alpha beta gamma alpha beta", "tgt"),
        (2, "alpha gamma beta beta alpha", "tgt"),
        (3, "delta epsilon zeta delta zeta", "src"),
        (4, "delta zeta epsilon epsilon", "src"),
        (10, "alpha beta alpha gamma", "cand"),   # target-like
        (11, "delta zeta delta epsilon", "cand"), # source-only vocab
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, dom string")
    out = dsir_importance_sample(
        df, "doc_id", "text", F.col("dom") == "tgt", k=100
    )
    w = {r.id: r.sum_logratio_fp for r in out.collect()}
    assert w[10] > w[11], w
    # the whole corpus is returned when k >= corpus size, each scored
    assert set(w) == {1, 2, 3, 4, 10, 11}


def test_log_histogram_merge_and_bound(spark):
    """Log-histogram invariants: (a) per-part sketches merge by adding
    counts into exactly the whole-corpus sketch; (b) the quantile upper
    bound is >= the exact quantile and within one power-of-two bin."""
    from buskafkasparkstreaming_spark.operators.stats import (
        log_histogram_quantile,
        log_histogram_sketch,
    )

    df = spark.range(1, 2001).select((F.col("id") * 3).alias("v"))
    whole = log_histogram_sketch(df, "v")
    part_a = df.filter(F.col("v") % 2 == 0)
    part_b = df.filter(F.col("v") % 2 == 1)
    from buskafkasparkstreaming_spark.operators.stats import (
        log_histogram_merge,
    )

    merged = log_histogram_merge(
        log_histogram_sketch(part_a, "v"), log_histogram_sketch(part_b, "v")
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0

    exact_p95 = df.approxQuantile("v", [0.95], 0.0)[0]
    est = log_histogram_quantile(whole, 0.95).first()
    assert est["q_upper_bound"] >= exact_p95
    assert est["q_upper_bound"] < 2 * exact_p95 + 2  # one-bin resolution


def test_asof_join_null_keys_match_nothing(spark):
    """SQL equi-join semantics: a NULL key matches NOTHING — NULL-key
    probes stay unmatched (left) / drop (inner), NULL-key build rows are
    never candidates (r6 null-user drift finding)."""
    probe = spark.createDataFrame(
        [(1, None, 10), (2, 1, 10)], "pid int, k int, t int"
    )
    build = spark.createDataFrame(
        [(100, None, 5), (101, 1, 5)], "bid int, k int, t int"
    )
    left = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], how="left",
    )
    got = {r["pid"]: r["bid"] for r in left.collect()}
    assert got == {1: None, 2: 101}
    inner = asof_join(
        probe, build, key="k", probe_time="t", build_time="t",
        build_cols=["bid"], how="inner",
    )
    assert {r["pid"] for r in inner.collect()} == {2}


def test_bfs_levels_semantics(spark):
    """Path graph 0-1-2-3-4 plus an off-path seed: min hop from ANY
    seed, nodes beyond max_hops absent, re-discovered nodes keep the
    EARLIEST level, deterministic integers."""
    from buskafkasparkstreaming_spark.operators.graph import bfs_levels

    und = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (7, 2)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (7,)], "id long")
    out = {x.id: x.hop for x in bfs_levels(edges, seeds, max_hops=2).collect()}
    # 2 is reachable in 1 hop via seed 7 (not 2 hops via 0)
    assert out == {0: 0, 7: 0, 1: 1, 2: 1, 3: 2}
    out3 = {x.id: x.hop for x in bfs_levels(edges, seeds, max_hops=3).collect()}
    assert out3[4] == 3 and 5 not in out3


def test_triangle_counts_semantics(spark):
    """K4 on 0-3 (every node in C(3,2)=3 triangles) plus a pendant edge
    (zero triangles) and a hub wedge that must NOT count."""
    from buskafkasparkstreaming_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 9), (9, 10), (9, 11)]  # pendant chain + open wedge at 9
    edges = spark.createDataFrame(k4 + extra, "id_a long, id_b long")
    out = {x.id: x.n_triangles for x in triangle_counts(edges).collect()}
    assert out[0] == out[1] == out[2] == 3
    assert out[3] == 3  # K4 membership unchanged by the pendant
    assert out[9] == out[10] == out[11] == 0


def test_temperature_mix_rebalances_toward_tail(spark):
    """alpha=0.5 mixing must RAISE the tail domain's output share above
    its input share (and lower the head's): with head weight 100x the
    tail, sqrt scaling targets a 10:1 output ratio instead of 100:1.
    Also pins determinism: two runs produce the identical kept set."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "head", 100) for i in range(2000)] + [
        (100000 + i, "tail", 100) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    kept = temperature_mix(df, "doc_id", "source", "w").cache()
    by_dom = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # input tail share = 20/2020 ~ 1%; sqrt targets ~9%; the tail domain
    # rate must saturate (keep_all) while the head is subsampled
    thr = {
        r["source"]: r["__thr_hex"]
        for r in kept.select("source", "__thr_hex").distinct().collect()
    }
    assert thr.get("tail") == "keep_all", thr
    assert by_dom.get("tail", 0) == 20
    assert 0 < by_dom["head"] < 2000
    tail_share_in = 20 / 2020
    tail_share_out = by_dom["tail"] / (by_dom["tail"] + by_dom["head"])
    assert tail_share_out > tail_share_in
    again = temperature_mix(df, "doc_id", "source", "w")
    assert again.select("doc_id").exceptAll(kept.select("doc_id")).count() == 0
    assert kept.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def _wav(rate=8000, samples=()):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_wav_audio_tier():
    """RIFF/WAVE PCM is a REAL decode tier (stdlib struct): header
    fields from the chunk walk, duration, and a genuine per-segment RMS
    profile — silence in the first half, half-scale amplitude in the
    second."""
    from buskafkasparkstreaming_spark.operators.multimodal import (
        _real_decode,
        parse_wav_header,
        wav_features,
    )

    samples = [0] * 400 + [16384] * 400
    payload = _wav(8000, samples)
    hdr = parse_wav_header(payload)
    assert hdr[:5] == ("audio/wav", 8000, 1, 16, 800)
    hdr2, dur_ms, feat = wav_features(payload)
    assert dur_ms == 100
    assert feat[:4] == [0.0] * 4
    assert all(abs(f - 0.5) < 1e-6 for f in feat[4:])
    d = _real_decode(payload)
    assert (d["mime"], d["width"], d["height"], d["n_frames"]) == (
        "audio/wav", 8000, 1, 800,
    )
    assert d["feat"] == feat
    # malformed RIFFs must NOT parse: truncated, non-PCM, zero-rate
    assert parse_wav_header(payload[:30]) is None
    import struct as _st

    nonpcm = bytearray(payload)
    nonpcm[20:22] = _st.pack("<H", 3)  # IEEE-float format code
    assert parse_wav_header(bytes(nonpcm)) is None


def test_wav_strict_mode_through_map_in_pandas(spark):
    """Strict extract_features must route WAV payloads through the audio
    tier on executors (no fake decoder, no raise)."""
    from buskafkasparkstreaming_spark.operators.multimodal import (
        extract_features,
    )

    rows = [
        (1, bytearray(_wav(16000, [8192] * 160)), "application/octet-stream"),
        (2, bytearray(_png(64, 32)), "image/png"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary, mime string")
    out = {
        r["doc_id"]: r
        for r in extract_features(df, use_fake_decoder=False).collect()
    }
    assert out[1]["mime"] == "audio/wav"
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (16000, 1, 160)
    assert all(abs(f - 0.25) < 1e-6 for f in out[1]["feat"])
    assert out[2]["mime"] == "image/png"


def test_tdigest_pinned_structure(spark, sf_dir):
    """The pinned-order t-digest's defining properties: centroid weights
    equal the k1-scale rank-boundary differences exactly (construction
    is deterministic in rank space), tails are finer than the middle,
    and interpolating the digest reproduces the exact median within the
    widest-centroid rank bound."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    rows = sorted(
        entrymod.sketch_tdigest_pinned(spark, sf_dir).collect(),
        key=lambda r: r["centroid"],
    )
    n = sum(r["weight"] for r in rows)
    import math

    qs = entrymod._TDIGEST_QS
    bounds = [0] + [math.ceil(n * q) for q in qs] + [n]
    expected = [b - a for a, b in zip(bounds, bounds[1:]) if b - a > 0]
    got = [r["weight"] for r in rows]
    assert got == expected, (got, expected)
    mid = max(r["weight"] for r in rows)
    assert rows[0]["weight"] < mid and rows[-1]["weight"] < mid
    # centroids are value-ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a["max_cents"] <= b["min_cents"]


def test_fellegi_sunter_pattern_table(spark):
    """FS linkage on a constructed corpus: blocking keeps only same-block
    pairs, the γ pattern table partitions the candidate set, scores are
    the exact fixed-point weight sums, and decisions follow thresholds."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.dedup import (
        fellegi_sunter_patterns,
        fs_weights_fp,
    )

    a = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 20, 100)], "id_a long, blk_a int, v_a long"
    )
    b = spark.createDataFrame(
        [(7, 10, 102), (8, 10, 900), (9, 30, 100)], "id_b long, blk_b int, v_b long"
    )
    wa, wd = fs_weights_fp(0.9, 0.1)
    out = fellegi_sunter_patterns(
        a,
        b,
        block_on=[(F.col("a.blk_a"), F.col("b.blk_b"))],
        gammas={"v": F.abs(F.col("a.v_a") - F.col("b.v_b")) <= 10},
        weights_fp={"v": (wa, wd)},
        t_link_fp=wa,
        t_nonlink_fp=wd,
    ).collect()
    got = {r["g_v"]: (r["pair_count"], r["score_fp"], r["decision"]) for r in out}
    # block 10: a∈{1,2} × b∈{7,8} = 4 pairs; only (1,7) agrees (|100-102|<=10)
    assert got[1] == (1, wa, "link")
    assert got[0] == (3, wd, "non_link")
    assert wa == round(1000 * __import__("math").log2(0.9 / 0.1))


def test_kcore_fixed_point_and_invariants(spark, sf_dir):
    """The pinned J=8 peel reaches the true fixed point on the gate
    data (one extra peel changes nothing), and the survivors satisfy
    the k-core contract: every core member has core_deg >= k."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from buskafkasparkstreaming_spark.operators import dedup as D
    from buskafkasparkstreaming_spark.operators.graph import kcore_peel
    from buskafkasparkstreaming_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.05)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint(eager=False)
    at8 = {(r["id"], r["core_deg"]) for r in kcore_peel(edges, 2, 8).collect()}
    at9 = {(r["id"], r["core_deg"]) for r in kcore_peel(edges, 2, 9).collect()}
    assert at8 == at9, "pinned J=8 did not reach the fixed point"
    assert at8, "2-core unexpectedly empty on gate data"
    assert all(d >= 2 for _i, d in at8)


def _tiny_gif(indices, w, h, interlaced=False):
    """Hand-assembled GIF89a: 4-color global table, one extension block,
    one image descriptor, LZW stream encoded as [clear, literal] pairs
    at a fixed 3-bit code width (legal, never grows the table)."""
    import struct

    palette = bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255]
    )
    hdr = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x81, 0, 0]) + palette
    ext = bytes([0x21, 0xFE, 3]) + b"abc" + bytes([0])  # comment block
    ipacked = 0x40 if interlaced else 0
    desc = bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
    # min_code_size=2: clear=4, end=5; 3-bit codes, LSB-first
    codes = []
    for i in indices:
        codes += [4, i]
    codes.append(5)
    bits = 0
    acc = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += 3
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    lzw = bytes([2, len(out)]) + bytes(out) + bytes([0])
    return hdr + ext + desc + lzw + bytes([0x3B])


def test_gif_pixel_decode_tier():
    """The GIF LZW pixel tier decodes a hand-assembled 2x2 GIF to the
    exact palette colors (red/green/blue/white quadrant lumas), and an
    interlaced GIF falls back (None) rather than mis-decoding."""
    from buskafkasparkstreaming_spark.operators.multimodal import (
        decode_pixels,
    )

    gif = _tiny_gif([0, 1, 2, 3], 2, 2)
    got = decode_pixels(gif)
    assert got is not None, "GIF pixel tier did not decode"
    w, h, feat = got
    assert (w, h) == (2, 2)
    # pixels: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    mr = (255 + 0 + 0 + 255) / 4 / 255.0
    mg = (0 + 255 + 0 + 255) / 4 / 255.0
    mb = (0 + 0 + 255 + 255) / 4 / 255.0
    assert abs(feat[0] - mr) < 1e-6
    assert abs(feat[1] - mg) < 1e-6
    assert abs(feat[2] - mb) < 1e-6
    # quadrant lumas are per-pixel lumas of the 4 corners
    lum = [
        0.299 * 1.0,               # red
        0.587 * 1.0,               # green
        0.114 * 1.0,               # blue
        0.299 + 0.587 + 0.114,     # white
    ]
    for q, want in zip(feat[4:8], lum):
        assert abs(q - want) < 1e-5, (feat[4:8], lum)
    # interlaced: a 1x4 image whose display rows are 0,1,2,3 arrives in
    # the GIF 4-pass stream order 0,2,1,3 — the deinterlaced result must
    # equal the plain decode of the same display image
    plain = decode_pixels(_tiny_gif([0, 1, 2, 3], 1, 4))
    inter = decode_pixels(_tiny_gif([0, 2, 1, 3], 1, 4, interlaced=True))
    assert plain is not None and inter == plain


def test_gif_lzw_with_table_growth():
    """A real LZW stream (single clear, then literals — the table grows
    and the code width steps 3->4 mid-stream) decodes correctly: the
    decoder's width-growth schedule matches a reference encoder that
    tracks next_code identically."""
    from buskafkasparkstreaming_spark.operators.multimodal import (
        decode_pixels,
    )
    import struct

    w, h = 3, 3
    indices = [0, 1, 2, 3, 0, 1, 2, 3, 0]
    # encode literals only, but mirror the decoder's growth schedule:
    # after each emitted code (post-first), next_code += 1; width grows
    # when next_code == 1 << width
    codes = [4] + indices + [5]
    out = bytearray()
    acc = bits = 0
    width, next_code = 3, 6
    first_after_clear = True
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if c == 4:
            width, next_code, first_after_clear = 3, 6, True
        elif c != 5:
            if first_after_clear:
                first_after_clear = False
            else:
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
    if bits:
        out.append(acc & 0xFF)
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    gif = (
        b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x81, 0, 0]) + palette
        + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        + bytes([2, len(out)]) + bytes(out) + bytes([0]) + bytes([0x3B])
    )
    got = decode_pixels(gif)
    assert got is not None
    assert (got[0], got[1]) == (3, 3)
    # mean red channel: red (idx 0) appears 3x, white (idx 3) 2x
    assert abs(got[2][0] - ((255 * 3 + 255 * 2) / 9 / 255.0)) < 1e-6


def test_holt_converges_on_constant_series(spark):
    """Constant input: the Holt level must converge to x*S and the trend
    to ~0 (floor division can leave it pinned at -1), proving the pinned
    fixed-point recursion tracks the float recursion it stands for."""
    import datetime as dt

    from buskafkasparkstreaming_spark.operators.stats import (
        holt_linear_by_group,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=i), 40) for i in range(60)
    ]
    hourly = spark.createDataFrame(rows, "event_type string, h timestamp, x long")
    out = holt_linear_by_group(hourly).orderBy("i").collect()
    S = 1 << 20
    assert out[0]["level_fp"] == 40 * S and out[0]["trend_fp"] == 0
    last = out[-1]
    assert abs(last["level_fp"] - 40 * S) <= 8
    assert -2 <= last["trend_fp"] <= 0


def test_holt_tracks_linear_ramp(spark):
    """On x_i = i the fitted trend must approach the true slope S (one
    unit per tick in fixed point) once the exponential memory warms up."""
    import datetime as dt

    from buskafkasparkstreaming_spark.operators.stats import (
        holt_linear_by_group,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=i), 100 + i) for i in range(80)
    ]
    hourly = spark.createDataFrame(rows, "event_type string, h timestamp, x long")
    last = holt_linear_by_group(hourly).orderBy("i").collect()[-1]
    S = 1 << 20
    assert abs(last["trend_fp"] - S) < S * 0.05
    # forecast for the next tick lands near 100 + 80
    forecast = (last["level_fp"] + last["trend_fp"]) / S
    assert abs(forecast - 180.0) < 1.0


def test_mannwhitney_matches_rank_formula(spark, sf_dir):
    """2*U1 from the distributed per-value frame must equal the classic
    rank-sum formula 2*(R1 - n1(n1+1)/2) computed with midranks in
    numpy on the same filtered sample."""
    import numpy as np

    import __spark_entry__ as entrymod

    row = entrymod.q_mannwhitney_u(spark, sf_dir).collect()[0]
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "error")
        )
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            (F.col("event_type") == "purchase").alias("is_p"),
        )
        .collect()
    )
    cents = np.array([r["cents"] for r in ev], dtype=np.int64)
    is_p = np.array([r["is_p"] for r in ev])
    order = np.argsort(cents, kind="mergesort")
    ranks = np.empty(len(cents), dtype=np.float64)
    sorted_c = cents[order]
    i = 0
    rk = np.arange(1, len(cents) + 1, dtype=np.float64)
    while i < len(sorted_c):
        j = i
        while j + 1 < len(sorted_c) and sorted_c[j + 1] == sorted_c[i]:
            j += 1
        ranks[order[i : j + 1]] = rk[i : j + 1].mean()
        i = j + 1
    n1 = int(is_p.sum())
    r1 = float(ranks[is_p].sum())
    u1_x2_expected = 2.0 * (r1 - n1 * (n1 + 1) / 2.0)
    assert row["n1"] == n1
    assert abs(row["u1_x2"] - u1_x2_expected) < 1e-6


def _xy2d_ref(order_bits: int, x: int, y: int) -> int:
    d = 0
    s = 1 << (order_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_bijective_and_unit_steps(spark):
    """On the full 32x32 grid the operator must produce every d in
    [0, 1024) exactly once AND consecutive d must be Manhattan-adjacent
    — the defining Hilbert property; any broken rotation fails this."""
    from buskafkasparkstreaming_spark.operators.layout import hilbert_stages

    n = 32
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    rows = hilbert_stages(grid, "x", "y", bits=5).collect()
    by_d = {r["hkey"]: (r["x"], r["y"]) for r in rows}
    assert sorted(by_d) == list(range(n * n))
    for d in range(n * n - 1):
        x1, y1 = by_d[d]
        x2, y2 = by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_matches_reference_at_16_bits(spark):
    """Random 16-bit points: operator == direct Python xy2d port."""
    import random

    from buskafkasparkstreaming_spark.operators.layout import hilbert_stages

    rng = random.Random(7)
    pts = [
        (rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in hilbert_stages(df, "x", "y", bits=16).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(16, x, y)


# --- JPEG pixel tier -------------------------------------------------------

_JPEG_GRAY_2X2 = (  # real libjpeg-produced file (CPython/IPython test data)
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
    "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA/8QAHwAA"
    "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR"
    "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF"
    "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip"
    "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB"
    "AAA/ACv/2Q=="
)
_JPEG_LOGO_16X16 = (  # real 4:2:0 color baseline file (CPython test data)
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _encode_jpeg(rgb, subsample=False, restart_rows=False):
    """Minimal baseline JPEG ENCODER for round-trip validation only:
    flat all-ones quant tables (near-lossless — residual error is DCT
    float rounding), custom canonical Huffman tables (DC cats at one
    length, all 256 AC symbols split over two lengths), optional 2x2
    chroma subsampling and per-MCU-row restart markers. Independent of
    the decoder: they share only the published T.81 format."""
    import struct

    import numpy as np

    h, w, _ = rgb.shape
    x8 = np.arange(8)
    A = np.cos((2 * x8[None, :] + 1) * x8[:, None] * np.pi / 16)
    A[0, :] *= 1 / np.sqrt(2)
    A *= 0.5

    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    # canonical tables: DC cats 0..11 @ len 4; AC 0x00-0x7F @ 9, 0x80-0xFF @ 10
    dc_bits = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [0] * 16
    ac_bits[8], ac_bits[9] = 128, 128
    ac_vals = list(range(256))

    def canonical(bits, vals):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes, ac_codes = canonical(dc_bits, dc_vals), canonical(ac_bits, ac_vals)

    out = bytearray()
    bitbuf, bitcnt = 0, 0

    def put(ln, code):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << ln) | code
        bitcnt += ln
        while bitcnt >= 8:
            byte = (bitbuf >> (bitcnt - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            bitcnt -= 8
        bitbuf &= (1 << bitcnt) - 1

    def flush():
        nonlocal bitbuf, bitcnt
        if bitcnt:
            put(8 - bitcnt, (1 << (8 - bitcnt)) - 1)

    def cat(v):
        return 0 if v == 0 else int(v).bit_length()

    def emit_block(plane, y0, x0, pred):
        blk = np.zeros((8, 8))
        ph, pw = plane.shape
        ys, xs = min(8, ph - y0), min(8, pw - x0)
        blk[:ys, :xs] = plane[y0 : y0 + ys, x0 : x0 + xs]
        if ys < 8:
            blk[ys:, :] = blk[ys - 1, :]
        if xs < 8:
            blk[:, xs:] = blk[:, xs - 1 : xs]
        F = A @ (blk - 128.0) @ A.T
        q = np.rint(F).astype(int)
        zzv = [q.flat[_ZZ[i]] for i in range(64)]
        diff = zzv[0] - pred
        t = cat(diff)
        put(*dc_codes[t])
        if t:
            put(t, diff if diff >= 0 else diff + (1 << t) - 1)
        run = 0
        for kk in range(1, 64):
            v = zzv[kk]
            if v == 0:
                run += 1
                continue
            while run > 15:
                put(*ac_codes[0xF0])
                run -= 16
            s = cat(v)
            put(*ac_codes[(run << 4) | s])
            put(s, v if v >= 0 else v + (1 << s) - 1)
            run = 0
        if run:
            put(*ac_codes[0x00])
        return zzv[0]

    hdr = bytearray(b"\xff\xd8")
    hdr += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    hs = 2 if subsample else 1
    hdr += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    hdr += bytes([1, (hs << 4) | hs, 0, 2, 0x11, 0, 3, 0x11, 0])
    for tc in (0, 1):
        bits = dc_bits if tc == 0 else ac_bits
        vals = dc_vals if tc == 0 else ac_vals
        hdr += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        hdr += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    mcus_x = -(-w // (8 * hs))
    mcus_y = -(-h // (8 * hs))
    dri = mcus_x if restart_rows else 0
    if dri:
        hdr += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    hdr += b"\xff\xda" + struct.pack(">HB", 12, 3)
    hdr += bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    if subsample:
        ph, pw = mcus_y * 16, mcus_x * 16
        yp = np.full((ph, pw), 0.0)
        yp[:h, :w] = y
        yp[h:, :] = yp[h - 1 : h, :]
        yp[:, w:] = yp[:, w - 1 : w]
        cbs = (yp * 0).copy()[: ph // 2, : pw // 2]
        crs = cbs.copy()
        cbf = np.full((ph, pw), 128.0)
        crf = np.full((ph, pw), 128.0)
        cbf[:h, :w], crf[:h, :w] = cb, cr
        cbf[h:, :], crf[h:, :] = cbf[h - 1 : h, :], crf[h - 1 : h, :]
        cbf[:, w:], crf[:, w:] = cbf[:, w - 1 : w], crf[:, w - 1 : w]
        cbs = cbf.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crs = crf.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [(yp, 2), (cbs, 1), (crs, 1)]
    else:
        planes = [(y, 1), (cb, 1), (cr, 1)]

    preds = [0, 0, 0]
    mcu, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu and mcu % dri == 0:
                flush()
                out.append(0xFF)
                out.append(0xD0 + (rst % 8))
                rst += 1
                preds = [0, 0, 0]
            for ci, (plane, chs) in enumerate(planes):
                for bv in range(chs):
                    for bh in range(chs):
                        preds[ci] = emit_block(
                            plane, (my * chs + bv) * 8, (mx * chs + bh) * 8,
                            preds[ci],
                        )
            mcu += 1
    flush()
    return bytes(hdr) + bytes(out) + b"\xff\xd9"


def test_jpeg_pixel_tier_roundtrip():
    """Decoder validated against an INDEPENDENT in-test encoder with flat
    (all-ones) quant tables: 4:4:4 and 4:2:0 solid color must round-trip
    to within integer rounding; a smooth gradient within a few levels;
    restart-marker streams decode identically."""
    import numpy as np

    from buskafkasparkstreaming_spark.operators.multimodal import (
        decode_pixels,
    )

    def mean_rgb(feat):
        return [v * 255.0 for v in feat[:3]]

    solid = np.zeros((16, 16, 3), dtype=np.int64)
    solid[..., 0], solid[..., 1], solid[..., 2] = 200, 60, 120
    for sub in (False, True):
        w, h, feat = decode_pixels(_encode_jpeg(solid, subsample=sub))
        assert (w, h) == (16, 16)
        got = mean_rgb(feat)
        for gi, want in zip(got, (200, 60, 120)):
            assert abs(gi - want) <= 2.0, (sub, got)

    yy, xx = np.mgrid[0:24, 0:17]
    grad = np.stack(
        [
            (xx * 255 // 16),
            (yy * 255 // 23),
            ((xx + yy) * 255 // 39),
        ],
        axis=-1,
    ).astype(np.int64)
    w, h, feat = decode_pixels(_encode_jpeg(grad))
    assert (w, h) == (17, 24)
    want = [grad[..., i].mean() for i in range(3)]
    got = mean_rgb(feat)
    for gi, wi in zip(got, want):
        assert abs(gi - wi) <= 4.0, (got, want)

    with_rst = _encode_jpeg(grad, restart_rows=True)
    assert b"\xff\xdd" in with_rst  # DRI present
    assert decode_pixels(with_rst) == (w, h, feat)


def test_jpeg_pixel_tier_real_fixtures():
    """Real libjpeg-produced files (embedded from public CPython/IPython
    test data): the 2x2 grayscale decodes to uniform mid-gray through
    the single-component path; the 16x16 4:2:0 color logo decodes with
    non-uniform quadrants through the multi-block-MCU + upsample path.
    Both deterministic across calls."""
    import base64

    from buskafkasparkstreaming_spark.operators.multimodal import (
        decode_pixels,
        extract_features,
        parse_image_header,
    )

    gray = base64.b64decode(_JPEG_GRAY_2X2)
    logo = base64.b64decode(_JPEG_LOGO_16X16)
    assert parse_image_header(gray) == ("image/jpeg", 2, 2)
    assert parse_image_header(logo) == ("image/jpeg", 16, 16)

    wg, hg, fg = decode_pixels(gray)
    assert (wg, hg) == (2, 2)
    assert len(set(fg[:4])) == 1  # grayscale: r == g == b == luma
    assert abs(fg[3] - 128 / 255) < 0.02  # uniform mid-gray

    wl, hl, fl = decode_pixels(logo)
    assert (wl, hl) == (16, 16)
    assert all(0.0 <= v <= 1.0 for v in fl)
    assert len(set(fl[4:])) > 1  # real image content: quadrants differ

    assert decode_pixels(logo) == (wl, hl, fl)  # deterministic


def test_jpeg_decoder_matches_jvm_imageio(spark):
    """Cross-validation against an INDEPENDENT reference decoder: Spark's
    `image` data source decodes JPEG with JVM ImageIO. On the baseline
    real-camera JPEGs shipped with the Spark distro (4:2:0, ~300x300),
    the stdlib decoder's 8-dim feature vector must agree with features
    computed from the ImageIO pixel array to within 0.002 per dim
    (observed max 5e-4 — decoder IDCT/rounding differences wash out in
    the means)."""
    import os

    import pytest as _pytest

    from buskafkasparkstreaming_spark.operators.multimodal import (
        decode_pixels,
    )

    base = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"
    if not os.path.isdir(base):
        _pytest.skip("Spark distro sample images not present")
    rows = (
        spark.read.format("image")
        .load(f"{base}/kittens/*.jpg")
        .select("image.*")
        .collect()
    )
    assert len(rows) == 4
    for row in rows:
        path = row["origin"].replace("file://", "")
        mine = decode_pixels(open(path, "rb").read())
        assert mine is not None, path
        w, h, feat = mine
        assert (w, h) == (row["width"], row["height"])
        data, nch = row["data"], row["nChannels"]
        sr = sg = sb = 0
        quads, qn = [0.0] * 4, [0] * 4
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * nch
                b, g, r = data[i], data[i + 1], data[i + 2]
                sr += r
                sg += g
                sb += b
                luma = 0.299 * r + 0.587 * g + 0.114 * b
                qi = (2 if y >= h / 2 else 0) + (1 if x >= w / 2 else 0)
                quads[qi] += luma
                qn[qi] += 1
        n = w * h
        mr, mg, mb = sr / n / 255.0, sg / n / 255.0, sb / n / 255.0
        ref = [
            mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb,
            *[quads[i] / qn[i] / 255.0 for i in range(4)],
        ]
        dmax = max(abs(a - b) for a, b in zip(feat, ref))
        assert dmax <= 0.002, (path, dmax)


def test_jpeg_progressive_matches_jvm_imageio(spark):
    """PROGRESSIVE (SOF2) decode validated against JVM ImageIO on real
    files: the committed MIT-licensed Node.js doc fixtures (3-component
    4:4:4, spectral-selection scans) and the Spark distro's grayscale
    progressive sample (single component WITH successive-approximation
    DC+AC refinement scans). Agreement bound 0.002 per feature dim
    (observed max 4e-4)."""
    import os

    from buskafkasparkstreaming_spark.operators.multimodal import (
        decode_pixels,
    )

    here = os.path.dirname(os.path.abspath(__file__))
    paths = [
        os.path.join(here, "data", "thin-white-stripe.jpg"),
        os.path.join(here, "data", "full-white-stripe.jpg"),
    ]
    distro_gray = (
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg"
    )
    if os.path.exists(distro_gray):
        paths.append(distro_gray)
    rows = []
    for p in paths:
        rows += (
            spark.read.format("image").load(p).select("image.*").collect()
        )
    assert len(rows) == len(paths)
    for row in rows:
        path = row["origin"].replace("file://", "")
        mine = decode_pixels(open(path, "rb").read())
        assert mine is not None, path
        w, h, feat = mine
        assert (w, h) == (row["width"], row["height"])
        data, nch = bytes(row["data"]), row["nChannels"]
        sr = sg = sb = 0
        quads, qn = [0.0] * 4, [0] * 4
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * nch
                if nch == 1:
                    b = g = r = data[i]
                else:
                    b, g, r = data[i], data[i + 1], data[i + 2]
                sr += r
                sg += g
                sb += b
                luma = 0.299 * r + 0.587 * g + 0.114 * b
                qi = (2 if y >= h / 2 else 0) + (1 if x >= w / 2 else 0)
                quads[qi] += luma
                qn[qi] += 1
        n = w * h
        mr, mg, mb = sr / n / 255.0, sg / n / 255.0, sb / n / 255.0
        ref = [
            mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb,
            *[quads[i] / qn[i] / 255.0 for i in range(4)],
        ]
        dmax = max(abs(a - b) for a, b in zip(feat, ref))
        assert dmax <= 0.002, (path, dmax)


def test_png_adam7_interlaced_decode():
    """Adam7 interlaced PNG decodes identically to the plain encoding of
    the same image — pixels scattered across the 7 passes, each pass
    independently filtered. Encoder side is built in-test (filter-0
    scanlines per pass), independent of the decoder."""
    import struct
    import zlib

    from buskafkasparkstreaming_spark.operators.multimodal import (
        decode_pixels,
    )

    w, h = 9, 10  # non-multiples of 8 exercise partial passes
    img = [
        [((x * 31) % 256, (y * 53) % 256, ((x + y) * 17) % 256)
         for x in range(w)]
        for y in range(h)
    ]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def png(interlaced):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlaced else 0)
        raw = bytearray()
        if interlaced:
            passes = (
                (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
            )
            for x0, y0, dx, dy in passes:
                pw = (w - x0 + dx - 1) // dx if w > x0 else 0
                ph = (h - y0 + dy - 1) // dy if h > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                for r in range(ph):
                    raw.append(0)  # filter 0
                    for c in range(pw):
                        raw += bytes(img[y0 + r * dy][x0 + c * dx])
        else:
            for y in range(h):
                raw.append(0)
                for x in range(w):
                    raw += bytes(img[y][x])
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    plain = decode_pixels(png(False))
    inter = decode_pixels(png(True))
    assert plain is not None and plain[:2] == (w, h)
    assert inter == plain


def test_mp4_video_header_tier():
    """ISO-BMFF VIDEO header tier: a hand-assembled minimal MP4 (ftyp +
    moov{mvhd, trak{tkhd(640x360), mdia{minf{stbl{stsz(42 samples)}}}}})
    yields real typed metadata through _real_decode — dims from tkhd's
    16.16 fixed point, frame count from the video trak's stsz, duration
    from mvhd — with the hash-embedding feature fallback (decode itself
    stays ffmpeg-gated)."""
    import struct

    from buskafkasparkstreaming_spark.operators.multimodal import (
        _real_decode,
        parse_mp4_header,
    )

    def box(typ, payload_bytes):
        return struct.pack(">I", 8 + len(payload_bytes)) + typ + payload_bytes

    mvhd = box(
        b"mvhd",
        # v0: version/flags, creation+modification, timescale, duration
        bytes(4) + bytes(8) + struct.pack(">II", 1000, 7500) + bytes(80),
    )
    tkhd = box(
        b"tkhd",
        # v0: version/flags + 72 bytes of fields/matrix, then 16.16 dims
        bytes(4) + bytes(72) + struct.pack(">II", 640 << 16, 360 << 16),
    )
    stsz = box(b"stsz", bytes(4) + struct.pack(">II", 0, 42))
    stbl = box(b"stbl", stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    mp4 = box(b"ftyp", b"isom" + bytes(8)) + moov

    assert parse_mp4_header(mp4) == ("video/mp4", 640, 360, 7500, 42)
    d = _real_decode(mp4)
    assert d["mime"] == "video/mp4"
    assert (d["width"], d["height"], d["n_frames"]) == (640, 360, 42)
    assert len(d["feat"]) == 8 and all(0.0 <= v <= 1.0 for v in d["feat"])
    # non-MP4 garbage still raises (the documented ffmpeg gate)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        _real_decode(b"\x00\x01\x02this is not media")


def test_wav_g711_law_tiers():
    """G.711 mu-law/A-law WAV decode: expansion tables are validated
    sample-exactly against the stdlib audioop reference (all 256 codes,
    both laws), and a companded 440 Hz sine's RMS profile must land
    within 0.5% of the PCM16 original's (companding quantization
    error only)."""
    import math
    import struct
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from buskafkasparkstreaming_spark.operators.multimodal import (
        parse_wav_header,
        wav_features,
    )

    rate, n = 8000, 800
    pcm = [
        int(12000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)
    ]
    pcm_bytes = b"".join(struct.pack("<h", s) for s in pcm)

    def wav(code, bits, data):
        fmt = struct.pack(
            "<HHIIHH", code, 1, rate, rate * (bits // 8), bits // 8, bits
        )
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    h16, _, f16 = wav_features(wav(1, 16, pcm_bytes))
    hu, du, fu = wav_features(wav(7, 8, audioop.lin2ulaw(pcm_bytes, 2)))
    ha, da, fa = wav_features(wav(6, 8, audioop.lin2alaw(pcm_bytes, 2)))
    assert hu[:3] == ("audio/wav", rate, 1) and hu[3] == -7
    assert ha[3] == -6 and hu[4] == ha[4] == n
    assert du == da == n * 1000 // rate
    for ref, got in zip(f16, fu):
        assert abs(got - ref) <= 0.005 * max(ref, 0.01), (f16, fu)
    for ref, got in zip(f16, fa):
        assert abs(got - ref) <= 0.005 * max(ref, 0.01), (f16, fa)

    # table-exactness vs the stdlib reference decoder: a 256-sample ramp
    # (every code, both laws) must produce IDENTICAL segment features to
    # the audioop-expanded PCM16 of the same ramp
    ramp = bytes(range(256))
    for law, lin in (
        (7, audioop.ulaw2lin(ramp, 2)),
        (6, audioop.alaw2lin(ramp, 2)),
    ):
        _, _, f_law = wav_features(wav(law, 8, ramp))
        _, _, f_ref = wav_features(wav(1, 16, lin))
        assert f_law == f_ref, (law, f_law, f_ref)


def test_twap_negative_epoch_and_null_id(spark):
    """Review repros: (1) a pre-1970 segment must bucket by FLOOR
    division — truncation emits a negative-weight phantom hour-0 row
    and misses hour -2; (2) a NULL id tied on ms must lose the
    tie-break (NULLS LAST) exactly as the SQL oracle's default."""
    import datetime as dt

    from buskafkasparkstreaming_spark.operators.timeseries import (
        twap_hourly,
    )

    epoch = dt.datetime(1970, 1, 1)
    ts = lambda ms: epoch + dt.timedelta(milliseconds=ms)  # noqa: E731

    # segment -5400000 .. -1800000 covers hour -2 fully (1.8e6 ms) and
    # hour -1 half (1.8e6 ms); hour 0 is never touched
    neg = spark.createDataFrame(
        [(1, "g", ts(-5400000), 1.0), (2, "g", ts(-1800000), 9.0)],
        "event_id long, grp string, ts timestamp, value double",
    )
    rows = {
        r["h"]: (r["w_ms"], r["twap_cents"])
        for r in twap_hourly(neg, "grp", "ts", "value", "event_id").collect()
    }
    assert rows == {-2: (1800000, 100.0), -1: (1800000, 100.0)}, rows

    # NULL id ties with id=5 at ms=1000: NULLS LAST makes id=5 the
    # zero-length dropped segment and the NULL-id row the survivor
    dup = spark.createDataFrame(
        [(None, "g", ts(1000), 1.0), (5, "g", ts(1000), 2.0),
         (6, "g", ts(7000), 3.0)],
        "event_id long, grp string, ts timestamp, value double",
    )
    out = twap_hourly(dup, "grp", "ts", "value", "event_id").collect()
    assert len(out) == 1 and out[0]["twap_cents"] == 100.0, out


def test_basket_lift_null_keys_excluded(spark):
    """Review repro: a NULL basket key must not inflate c_a/c_b — with
    it counted, lift for a perfectly-associated pair deflates from 1.0
    to 0.75."""
    from buskafkasparkstreaming_spark.operators.stats import (
        basket_lift_pairs,
    )

    rows = [(None, 1), (10, 1), (10, 2), (20, 1), (20, 2), (30, 1),
            (30, 2), (40, None)]
    df = spark.createDataFrame(rows, "o long, p long")
    out = basket_lift_pairs(df, "o", "p", min_support=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["c_ab"], r["c_a"], r["c_b"], r["n_orders"]) == (3, 3, 3, 3)
    assert r["lift"] == 1.0


def test_allen_relations_exhaustive(spark):
    """Allen cascade ground truth, exhaustively over every interval pair
    on a 5-point grid (sa<=ea, sb<=eb — 225 pairs, degenerate points
    included): (1) for PROPER intervals (s<e both) exactly ONE of the 13
    conditions holds — Allen 1983's mutual exclusivity/exhaustiveness;
    (2) for every pair (degenerate too) the first-match cascade picks
    the same label in pure Python, in DuckDB through allen_relation_sql,
    and in Spark through allen_relation — the three evaluation paths
    can never disagree."""
    import duckdb

    from buskafkasparkstreaming_spark.operators.joins import (
        ALLEN_RELATIONS,
        allen_relation,
        allen_relation_sql,
    )

    def holds(expr, sa, ea, sb, eb):
        env = {"sa": sa, "ea": ea, "sb": sb, "eb": eb}
        ok = True
        for clause in expr.split(" AND "):
            lhs, op, rhs = clause.split(" ")
            a, b = env[lhs], env[rhs]
            ok = ok and {"=": a == b, "<": a < b, ">": a > b}[op]
        return ok

    pairs = [
        (sa, ea, sb, eb)
        for sa in range(5)
        for ea in range(sa, 5)
        for sb in range(5)
        for eb in range(sb, 5)
    ]
    py_label = {}
    for sa, ea, sb, eb in pairs:
        matches = [n for n, e in ALLEN_RELATIONS if holds(e, sa, ea, sb, eb)]
        if sa < ea and sb < eb:
            assert len(matches) == 1, (sa, ea, sb, eb, matches)
        assert matches, (sa, ea, sb, eb)  # exhaustive even for points
        py_label[(sa, ea, sb, eb)] = matches[0]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p (sa BIGINT, ea BIGINT, sb BIGINT, eb BIGINT)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?)", pairs)
    sql_case = allen_relation_sql("sa", "ea", "sb", "eb")
    for sa, ea, sb, eb, rel in con.execute(
        f"SELECT sa, ea, sb, eb, {sql_case} FROM p"
    ).fetchall():
        assert rel == py_label[(sa, ea, sb, eb)], (sa, ea, sb, eb, rel)
    con.close()

    sdf = spark.createDataFrame(pairs, "sa long, ea long, sb long, eb long")
    out = sdf.withColumn(
        "rel",
        allen_relation(F.col("sa"), F.col("ea"), F.col("sb"), F.col("eb")),
    )
    for r in out.collect():
        assert r["rel"] == py_label[(r["sa"], r["ea"], r["sb"], r["eb"])], r


def test_unicode_clean_semantics(spark):
    """unicode_clean pins: decomposed (e+COMBINING ACUTE) and
    precomposed é hash IDENTICALLY after NFC; C0/C1 controls strip
    while tab/newline fold into the whitespace collapse; the collapse
    class is ASCII-explicit, so U+00A0 (no-break space) survives —
    the deliberate cross-engine choice (Python \\s would eat it, RE2's
    would not); edge whitespace trims. Round-12 ADVICE fix pinned by
    row 6: C1 controls (U+0080-U+009F, incl. U+0085 NEL) now strip
    — the class previously covered C0+DEL only."""
    import hashlib

    from buskafkasparkstreaming_spark.operators.text import unicode_clean

    rows = [
        (1, "café"),            # precomposed
        (2, "café"),           # decomposed — same NFC form as 1
        (3, "a\x07b\x1fc"),          # controls strip to 'abc'
        (4, "  x \t\n y\f "),        # runs collapse, edges trim
        (5, "a b"),             # NBSP survives (ASCII class only)
        (6, "a\x85b\x9fc\x80d"),     # C1 block strips (incl. NEL)
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    out = {
        r["id"]: (r["n_before"], r["n_after"], r["clean_md5"])
        for r in unicode_clean(df, "doc_id", "t").collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1][2] == out[2][2] == md5("café")
    assert out[2][0] == 5 and out[2][1] == 4  # NFC composed one pair
    assert out[3] == (5, 3, md5("abc"))
    assert out[4][2] == md5("x y")
    assert out[5] == (3, 3, md5("a b"))
    assert out[6] == (7, 4, md5("abcd"))


def test_weighted_reservoir_tiers_matches_bruteforce(spark):
    """Batch A-ES reservoir (sampling.py::weighted_reservoir_tiers) ==
    a driver-side brute force of the same max-of-w-md5 priority and
    (prio DESC, id ASC, w ASC) top-k — including verbatim DUPLICATE
    rows (set semantics: one slot) and out-of-range weights (clamp to
    [1, max_weight], the streaming tracker's rule — a 0/negative/huge
    weight must degrade, never crash or shift others' slots)."""
    import hashlib

    from buskafkasparkstreaming_spark.operators.sampling import (
        weighted_reservoir_tiers,
    )

    data = []
    for i in range(40):
        s = "a" if i % 2 == 0 else "b"
        w = [0, 1, 3, 8, 12, -3][i % 6]
        data.append((s, i, w))
    data += data[::7]  # verbatim duplicates
    df = spark.createDataFrame(data, "s string, id long, w long")
    out = weighted_reservoir_tiers(
        df, id_col="id", weight_col="w", stratum_col="s", k=5,
        salt="t", max_weight=8, prune_buckets=4,
    )
    got = {(r.s, r.id, r.w, r.prio) for r in out.collect()}
    assert len(got) == len(out.collect()), "duplicate output rows"

    pool: dict[tuple, str] = {}
    for s, i, w in data:
        w2 = min(max(w, 1), 8)
        prio = max(
            hashlib.md5(f"{i}:{j}:t".encode()).hexdigest()
            for j in range(1, w2 + 1)
        )
        pool[(s, i, w2)] = prio
    want = set()
    for s in ("a", "b"):
        items = sorted(
            ((p, i, w) for (ss, i, w), p in pool.items() if ss == s),
            key=lambda t: (t[1], t[2]),
        )
        items.sort(key=lambda t: t[0], reverse=True)
        want |= {(s, i, w, p) for p, i, w in items[:5]}
    assert got == want
