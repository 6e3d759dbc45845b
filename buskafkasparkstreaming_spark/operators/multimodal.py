"""Multimodal column handling (BASELINE.json north_star).

Design: media payloads are opaque `binary` columns with typed metadata
alongside (mime, width/height, duration, ...). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages — the only
sane shape for Python-side media work at 100 TB:

* the binary column travels in Arrow record batches (no per-row pickling);
* each task decodes its partition independently — embarrassingly parallel;
* output schemas are declared up front so downstream stays Catalyst-planned.

Decode has three REAL tiers plus a test stand-in. PIXEL decode — PNG
(stdlib zlib inflate + scanline unfilter), uncompressed BMP, GIF (LZW),
and Huffman JPEG — baseline AND progressive (stdlib marker/Huffman
walk + numpy IDCT, any chroma subsampling, restart markers,
spectral-selection/successive-approximation scans; validated against the
independent JVM ImageIO decoder) — reads the actual pixel array and
emits real color/luma features; no codec library needed. HEADER decode —
dimension/mime sniffing for WebP / arithmetic-coded
JPEG — parses the container header (magic bytes + fixed offsets from the
published specs); those features fall back to the payload-hash
embedding. AUDIO decode —
RIFF/WAVE PCM and G.711 mu-law/A-law (stdlib struct + the published
ITU expansion tables) — walks the chunk list and computes a real
8-segment RMS energy profile over the samples; typed metadata
maps onto the fixed schema as width=sample_rate, height=n_channels,
n_frames=audio frames. VIDEO HEADER decode — ISO-BMFF (MP4/MOV) box
walk (stdlib struct) — yields real typed metadata (dims from tkhd,
frame count from the video trak's stsz, duration from mvhd); frame
decode and the remaining formats (compressed audio, non-MP4 video)
raise NotImplementedError behind an import-try on PIL/ffmpeg; a
deterministic fake decoder (seeded by sha2 of the payload) stands in
for unrecognized payloads and exercises the identical Spark plumbing —
schema, batching, partitioning — in tests.
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
        JPEG SOFn marker walk (ITU T.81 §B.2.2), WebP RIFF container
        VP8/VP8L/VP8X chunks (RFC 9649)."""
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
        if (
            len(payload) >= 25
            and payload[:4] == b"RIFF"
            and payload[8:12] == b"WEBP"
        ):
            # WebP container spec (Google, RFC 9649): first chunk at 12
            fourcc = payload[12:16]
            p = payload[20:]  # chunk payload
            if fourcc == b"VP8 " and len(p) >= 10 and p[3:6] == b"\x9d\x01\x2a":
                (w,) = struct.unpack("<H", p[6:8])
                (h,) = struct.unpack("<H", p[8:10])
                return ("image/webp", w & 0x3FFF, h & 0x3FFF)
            if fourcc == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
                (b,) = struct.unpack("<I", p[1:5])
                return ("image/webp", (b & 0x3FFF) + 1, ((b >> 14) & 0x3FFF) + 1)
            if fourcc == b"VP8X" and len(p) >= 10:
                w = int.from_bytes(p[4:7], "little") + 1
                h = int.from_bytes(p[7:10], "little") + 1
                return ("image/webp", w, h)
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


def _make_pixel_decoder():
    """Pure-stdlib PIXEL decoder for the formats that need no codec
    library: PNG (zlib IDAT + per-scanline unfilter, 8-bit gray/RGB ±
    alpha, plain AND Adam7 interlaced), uncompressed 24/32-bit BMP,
    GIF87a/89a
    (full LZW decompression + color-table mapping, incl. the 4-pass
    interlace), and
    Huffman JPEG, baseline AND progressive (T.81 entropy decode + numpy
    IDCT). Built as a nested function so worker closures pickle it by
    value. Returns (width, height, feat8) — feat8 = [mean_r, mean_g,
    mean_b, mean_luma, quadrant lumas] in [0,1] — or None for formats
    that genuinely need PIL/ffmpeg (arithmetic-coded JPEG, video)."""

    def _features(px_rows):
        # px_rows: list of rows, each a list of (r, g, b) tuples
        h = len(px_rows)
        w = len(px_rows[0]) if h else 0
        if not h or not w:
            return None
        sr = sg = sb = 0
        quads = [0.0, 0.0, 0.0, 0.0]
        qn = [0, 0, 0, 0]
        for y, row in enumerate(px_rows):
            for x, (r, g, b) in enumerate(row):
                sr += r
                sg += g
                sb += b
                luma = 0.299 * r + 0.587 * g + 0.114 * b
                qi = (2 if y >= h / 2 else 0) + (1 if x >= w / 2 else 0)
                quads[qi] += luma
                qn[qi] += 1
        n = w * h
        mr, mg, mb = sr / n / 255.0, sg / n / 255.0, sb / n / 255.0
        ml = 0.299 * mr + 0.587 * mg + 0.114 * mb
        qs = [quads[i] / qn[i] / 255.0 if qn[i] else 0.0 for i in range(4)]
        return [round(v, 6) for v in (mr, mg, mb, ml, *qs)]

    def _decode_png(payload):
        import struct
        import zlib

        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos, idat, ihdr = 8, b"", None
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data[:13])
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            pos += 12 + ln  # len + type + crc
        if ihdr is None or not idat:
            return None
        w, h, depth, color, _comp, _filt, interlace = ihdr
        # 8-bit; color 0=gray, 2=RGB, 4=gray+A, 6=RGBA
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
        if depth != 8 or interlace not in (0, 1) or channels is None:
            return None
        raw = zlib.decompress(idat)

        def to_pixels(line):
            if channels == 1:
                return [(v, v, v) for v in line]
            if channels == 2:
                return [
                    (line[i], line[i], line[i])
                    for i in range(0, len(line), 2)
                ]
            step = channels
            return [tuple(line[i : i + 3]) for i in range(0, len(line), step)]

        def unfilter(off, n_rows, px_w):
            """Unfilter `n_rows` scanlines of `px_w` pixels starting at
            `off` in the inflated stream (RFC 2083 filters 0-4; `prev`
            resets per call, as each Adam7 pass filters independently).
            Returns (pixel rows, new offset) or None on a bad filter."""
            stride = px_w * channels
            rows, prev = [], bytearray(stride)
            for _y in range(n_rows):
                ftype = raw[off]
                line = bytearray(raw[off + 1 : off + 1 + stride])
                off += 1 + stride
                if ftype == 1:  # Sub
                    for i in range(channels, stride):
                        line[i] = (line[i] + line[i - channels]) & 0xFF
                elif ftype == 2:  # Up
                    for i in range(stride):
                        line[i] = (line[i] + prev[i]) & 0xFF
                elif ftype == 3:  # Average
                    for i in range(stride):
                        left = line[i - channels] if i >= channels else 0
                        line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    for i in range(stride):
                        a = line[i - channels] if i >= channels else 0
                        b = prev[i]
                        c = prev[i - channels] if i >= channels else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = (
                            a if (pa <= pb and pa <= pc)
                            else (b if pb <= pc else c)
                        )
                        line[i] = (line[i] + pr) & 0xFF
                elif ftype != 0:
                    return None
                prev = line
                rows.append(to_pixels(line))
            return rows, off

        if interlace == 0:
            got = unfilter(0, h, w)
            if got is None:
                return None
            return (w, h, _features(got[0]))

        # Adam7: 7 independently-filtered passes scattered onto the grid
        grid = [[(0, 0, 0)] * w for _ in range(h)]
        off = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            got = unfilter(off, ph, pw)
            if got is None:
                return None
            prows, off = got
            for r, row in enumerate(prows):
                y = y0 + r * dy
                for c, px in enumerate(row):
                    grid[y][x0 + c * dx] = px
        return (w, h, _features(grid))

    def _decode_bmp(payload):
        import struct

        if len(payload) < 54 or payload[:2] != b"BM":
            return None
        (data_off,) = struct.unpack("<I", payload[10:14])
        (dib,) = struct.unpack("<I", payload[14:18])
        if dib < 40:
            return None
        w, h_signed = struct.unpack("<ii", payload[18:26])
        (bpp,) = struct.unpack("<H", payload[28:30])
        (compression,) = struct.unpack("<I", payload[30:34])
        if compression != 0 or bpp not in (24, 32) or w <= 0 or h_signed == 0:
            return None
        h = abs(h_signed)
        bytes_pp = bpp // 8
        stride = (w * bytes_pp + 3) & ~3
        if data_off + stride * h > len(payload):
            return None
        rows = []
        for yy in range(h):
            # positive height = bottom-up row order
            src_y = (h - 1 - yy) if h_signed > 0 else yy
            base = data_off + src_y * stride
            row = []
            for x in range(w):
                i = base + x * bytes_pp
                b, g, r = payload[i], payload[i + 1], payload[i + 2]
                row.append((r, g, b))
            rows.append(row)
        return (w, h, _features(rows))

    def _gif_lzw(data: bytes, min_code_size: int):
        """GIF LZW decompression (the published GIF89a appendix
        algorithm): LSB-first variable-width codes, clear/end codes,
        table growth with the 12-bit cap. Returns the color-index list
        or None on a malformed stream."""
        clear = 1 << min_code_size
        end = clear + 1
        nbits = len(data) * 8
        bitpos = 0
        code_size = min_code_size + 1
        table: dict[int, list[int]] = {i: [i] for i in range(clear)}
        next_code = end + 1
        prev: list[int] | None = None
        out: list[int] = []

        def read_code(size: int):
            nonlocal bitpos
            if bitpos + size > nbits:
                return None
            v = 0
            for i in range(size):
                byte = data[(bitpos + i) >> 3]
                v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
            bitpos += size
            return v

        while True:
            code = read_code(code_size)
            if code is None or code == end:
                break
            if code == clear:
                table = {i: [i] for i in range(clear)}
                next_code = end + 1
                code_size = min_code_size + 1
                prev = None
                continue
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + [prev[0]]
            else:
                return None
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
        return out

    def _decode_gif(payload):
        """GIF87a/89a PIXEL decode, stdlib-only: logical screen
        descriptor, global/local color table, extension-block walk,
        first image descriptor, LZW-decompressed indices mapped through
        the color table, deinterlacing the 4-pass row order when the
        interlace flag is set."""
        import struct

        if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        packed = payload[10]
        pos = 13
        gct = None
        if packed >> 7:
            n = 2 ** ((packed & 7) + 1)
            if pos + 3 * n > len(payload):
                return None
            gct = [
                (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                 payload[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x21:  # extension: label byte + sub-blocks
                pos += 2
                while pos < len(payload) and payload[pos] != 0:
                    pos += payload[pos] + 1
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                if pos + 10 > len(payload):
                    return None
                _l, _t, iw, ih = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
                ipacked = payload[pos + 9]
                pos += 10
                ct = gct
                if ipacked >> 7:  # local color table
                    n = 2 ** ((ipacked & 7) + 1)
                    if pos + 3 * n > len(payload):
                        return None
                    ct = [
                        (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                         payload[pos + 3 * i + 2])
                        for i in range(n)
                    ]
                    pos += 3 * n
                if ct is None or iw == 0 or ih == 0:
                    return None  # no palette -> header tier
                interlaced = (ipacked >> 6) & 1
                min_code_size = payload[pos]
                pos += 1
                data = b""
                while pos < len(payload) and payload[pos] != 0:
                    ln = payload[pos]
                    data += payload[pos + 1:pos + 1 + ln]
                    pos += ln + 1
                idx = _gif_lzw(data, min_code_size)
                if idx is None or len(idx) < iw * ih:
                    return None
                if interlaced:
                    # GIF89a 4-pass interlace: the stream carries rows
                    # 0,8,16.. then 4,12.. then 2,6.. then 1,3,5..
                    order = (
                        list(range(0, ih, 8))
                        + list(range(4, ih, 8))
                        + list(range(2, ih, 4))
                        + list(range(1, ih, 2))
                    )
                else:
                    order = list(range(ih))
                rows = [None] * ih
                for sy, ty in enumerate(order):
                    rows[ty] = [
                        ct[idx[sy * iw + x] % len(ct)] for x in range(iw)
                    ]
                return (iw, ih, _features(rows))
            else:  # trailer (0x3B) or junk
                return None
        return None

    def _decode_jpeg(payload):
        """JPEG PIXEL decode, stdlib + numpy (already a worker
        dependency): baseline sequential (SOF0/1) AND progressive (SOF2)
        Huffman JPEG per ITU T.81 — marker walk, canonical Huffman
        tables (Annex C), spectral-selection / successive-approximation
        scan accumulation for progressive (Annex G incl. EOB runs and
        the correction-bit refinement), zigzag dequant, 8x8 IDCT as one
        orthonormal matrix product, chroma upsampling by pixel
        replication, JFIF YCbCr->RGB. Handles grayscale, any h/v
        sampling factors (4:4:4, 4:2:2, 4:2:0), restart markers, and
        tables redefined between scans. Arithmetic-coded and
        hierarchical files return None -> header tier. Validated
        against the independent JVM ImageIO decoder (Spark's `image`
        source) on real baseline AND progressive files."""
        import struct

        import numpy as np

        if payload[:2] != b"\xff\xd8":
            return None
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple[int, int], dict] = {}
        sof = None
        progressive = False
        dri = 0
        scans = []  # (scan_comps, ss, se, ah, al, segments, dri)
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
                if marker == 0xD9:
                    break
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            seg = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 15
                    i += 1
                    if pq:
                        vals = struct.unpack(f">{64}H", seg[i : i + 128])
                        i += 128
                    else:
                        vals = tuple(seg[i : i + 64])
                        i += 64
                    qt[tq] = np.asarray(vals, dtype=np.float64)
                pos += 2 + seglen
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                progressive = marker == 0xC2
                _prec, hh, ww = seg[0], *struct.unpack(">HH", seg[1:5])
                nc = seg[5]
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hs, vs = seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15
                    comps.append((cid, hs, vs, seg[8 + 3 * c]))
                sof = (ww, hh, comps)
                pos += 2 + seglen
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless/arithmetic/hierarchical -> header tier
            elif marker == 0xC4:  # DHT (may be redefined between scans)
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 15
                    bits = seg[i + 1 : i + 17]
                    nvals = sum(bits)
                    vals = seg[i + 17 : i + 17 + nvals]
                    # canonical code assignment (T.81 Annex C); REBIND so
                    # earlier scans keep their snapshot reference
                    table, code, k = {}, 0, 0
                    for ln in range(1, 17):
                        for _ in range(bits[ln - 1]):
                            table[(ln, code)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(tc, th)] = table
                    i += 17 + nvals
                pos += 2 + seglen
            elif marker == 0xDD:  # DRI
                (dri,) = struct.unpack(">H", seg[:2])
                pos += 2 + seglen
            elif marker == 0xDA:  # SOS — snapshot tables + entropy data
                ns = seg[0]
                scomps = []
                for c in range(ns):
                    cs = seg[1 + 2 * c]
                    td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                    scomps.append(
                        (cs, huff.get((0, td)), huff.get((1, ta)))
                    )
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                a = seg[3 + 2 * ns]
                pos += 2 + seglen
                segments, cur = [], bytearray()
                i = pos
                while i < n:
                    b0 = payload[i]
                    if b0 == 0xFF:
                        nxt = payload[i + 1] if i + 1 < n else 0xD9
                        if nxt == 0x00:
                            cur.append(0xFF)
                            i += 2
                            continue
                        if 0xD0 <= nxt <= 0xD7:
                            segments.append(bytes(cur))
                            cur = bytearray()
                            i += 2
                            continue
                        break  # EOI or next marker
                    cur.append(b0)
                    i += 1
                segments.append(bytes(cur))
                scans.append((scomps, ss, se, a >> 4, a & 15, segments, dri))
                pos = i
            else:  # APPn / COM / other
                pos += 2 + seglen
        if sof is None or not scans:
            return None
        ww, hh, comps = sof
        if ww == 0 or hh == 0:
            return None

        class _Bits:
            def __init__(self, data):
                self.d, self.p = data, 0

            def bit(self):
                byte = self.d[self.p >> 3]
                b = (byte >> (7 - (self.p & 7))) & 1
                self.p += 1
                return b

            def receive(self, cnt):
                v = 0
                for _ in range(cnt):
                    v = (v << 1) | self.bit()
                return v

        def hdecode(bits, table):
            code, ln = 0, 0
            while ln < 16:
                code = (code << 1) | bits.bit()
                ln += 1
                sym = table.get((ln, code))
                if sym is not None:
                    return sym
            raise ValueError("bad huffman code")

        def extend(v, t):
            # T.81 EXTEND: low-half codes map to negative values
            return v if t == 0 or v >= (1 << (t - 1)) else v - ((1 << t) - 1)

        zz = [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
        ]

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-ww // (8 * hmax))
        mcus_y = -(-hh // (8 * vmax))
        by_id = {c[0]: c for c in comps}
        # coefficient store (zigzag index space, int64 for the
        # refinement bit tests), allocated at interleaved coverage
        coefs = {
            cid: np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
            for cid, hs, vs, _tq in comps
        }

        def decode_scan(scomps, ss, se, ah, al, segments, sdri):
            interleaved = len(scomps) > 1
            if interleaved and ss != 0:
                raise ValueError("interleaved AC scan")
            # per-scan state
            preds = {cs: 0 for cs, _d, _a in scomps}
            eobrun = 0
            seg_idx = 0
            bits = _Bits(segments[0])

            def dc_unit(cs, dct, row, col):
                nonlocal bits
                c = coefs[cs]
                if ah == 0:
                    t = hdecode(bits, dct)
                    diff = extend(bits.receive(t), t)
                    preds[cs] += diff
                    c[row, col, 0] = preds[cs] << al
                else:  # refinement: one bit
                    if bits.bit():
                        c[row, col, 0] |= 1 << al

            def ac_first(cs, act, row, col):
                nonlocal bits, eobrun
                c = coefs[cs]
                if eobrun > 0:
                    eobrun -= 1
                    return
                k = ss
                while k <= se:
                    rs = hdecode(bits, act)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += bits.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past band")
                    c[row, col, k] = extend(bits.receive(s), s) << al
                    k += 1

            def ac_refine(cs, act, row, col):
                nonlocal bits, eobrun
                c = coefs[cs]
                p1, m1 = 1 << al, -(1 << al)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = hdecode(bits, act)
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += bits.receive(r)
                                break
                            # r == 15: skip 16 zero-history coefs
                        else:  # s == 1 by spec
                            val = p1 if bits.bit() else m1
                        while k <= se:
                            if c[row, col, k] != 0:
                                if bits.bit() and not (c[row, col, k] & p1):
                                    c[row, col, k] += (
                                        p1 if c[row, col, k] > 0 else m1
                                    )
                            else:
                                if r == 0:
                                    if val:
                                        c[row, col, k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        if c[row, col, k] != 0:
                            if bits.bit() and not (c[row, col, k] & p1):
                                c[row, col, k] += (
                                    p1 if c[row, col, k] > 0 else m1
                                )
                        k += 1
                    eobrun -= 1

            def baseline_unit(cs, dct, act, row, col, tq):
                nonlocal bits
                c = coefs[cs]
                t = hdecode(bits, dct)
                diff = extend(bits.receive(t), t)
                preds[cs] += diff
                c[row, col, 0] = preds[cs]
                k = 1
                while k < 64:
                    rs = hdecode(bits, act)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block")
                    c[row, col, k] = extend(bits.receive(s), s)
                    k += 1

            def restart(unit_no):
                nonlocal bits, seg_idx, eobrun
                if sdri and unit_no and unit_no % sdri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("missing restart segment")
                    bits = _Bits(segments[seg_idx])
                    for cs in preds:
                        preds[cs] = 0
                    eobrun = 0

            full_band = ss == 0 and se == 63 and ah == 0 and al == 0

            def comp_blocks(cs):
                _cid, hs, vs, _tq = by_id[cs]
                bx = -(-((ww * hs + hmax - 1) // hmax) // 8)
                by = -(-((hh * vs + vmax - 1) // vmax) // 8)
                return bx, by

            if full_band:
                # baseline single scan. A non-interleaved baseline scan
                # of a SUBSAMPLED component of a multi-component image
                # would need its own block-raster order — unsupported
                # (never produced by common encoders) -> header tier.
                if not interleaved and len(comps) > 1:
                    cs = scomps[0][0]
                    if (by_id[cs][1], by_id[cs][2]) != (hmax, vmax):
                        raise ValueError("non-interleaved subsampled scan")
                unit = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        restart(unit)
                        for cs, dct, act in scomps:
                            _cid, hs, vs, tq = by_id[cs]
                            for bv in range(vs):
                                for bh in range(hs):
                                    baseline_unit(
                                        cs, dct, act,
                                        my * vs + bv, mx * hs + bh, tq,
                                    )
                        unit += 1
            elif ss == 0:
                # progressive DC scan (first or refinement)
                if interleaved:
                    unit = 0
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            restart(unit)
                            for cs, dct, _act in scomps:
                                _cid, hs, vs, _tq = by_id[cs]
                                for bv in range(vs):
                                    for bh in range(hs):
                                        dc_unit(
                                            cs, dct,
                                            my * vs + bv, mx * hs + bh,
                                        )
                            unit += 1
                else:
                    cs, dct, _act = scomps[0]
                    bx, by = comp_blocks(cs)
                    unit = 0
                    for row in range(by):
                        for col in range(bx):
                            restart(unit)
                            dc_unit(cs, dct, row, col)
                            unit += 1
            else:
                # progressive AC scan: single component, raster over its
                # own block grid
                cs, _dct, act = scomps[0]
                bx, by = comp_blocks(cs)
                unit = 0
                for row in range(by):
                    for col in range(bx):
                        restart(unit)
                        if ah == 0:
                            ac_first(cs, act, row, col)
                        else:
                            ac_refine(cs, act, row, col)
                        unit += 1

        for scomps, ss, se, ah, al, segments, sdri in scans:
            if any(d is None or a is None for _c, d, a in scomps):
                # a scan may legitimately omit the unused table (DC-only
                # scans carry no AC table and vice versa)
                scomps = [
                    (c, d or {}, a or {}) for c, d, a in scomps
                ]
            decode_scan(scomps, ss, se, ah, al, segments, sdri)

        # reconstruction: dequant + IDCT every allocated block
        x8 = np.arange(8)
        A = np.cos((2 * x8[None, :] + 1) * x8[:, None] * np.pi / 16)
        A[0, :] *= 1 / np.sqrt(2)
        A *= 0.5  # orthonormal DCT-II basis; IDCT f = A.T @ F @ A
        inv_zz = np.zeros(64, dtype=np.int64)
        for j in range(64):
            inv_zz[zz[j]] = j
        planes = {}
        for cid, hs, vs, tq in comps:
            c = coefs[cid]
            nby, nbx = c.shape[0], c.shape[1]
            # vectorized over all blocks: dequant in zigzag space,
            # de-zigzag, batched IDCT
            dq = c.astype(np.float64) * qt[tq][None, None, :]
            blocks = dq[:, :, inv_zz].reshape(nby, nbx, 8, 8)
            recon = (
                np.einsum("ux,rcuv,vy->rcxy", A, blocks, A) + 128.0
            )
            plane = recon.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
            planes[cid] = plane

        full = {}
        for cid, hs, vs, _tq in comps:
            p = np.repeat(
                np.repeat(planes[cid], vmax // vs, axis=0), hmax // hs, axis=1
            )
            full[cid] = p[:hh, :ww]
        if len(comps) == 1:
            y = np.clip(full[comps[0][0]], 0, 255)
            rgb = np.stack([y, y, y], axis=-1)
        elif len(comps) == 3:
            y = full[comps[0][0]]
            cb = full[comps[1][0]] - 128.0
            cr = full[comps[2][0]] - 128.0
            rgb = np.stack(
                [
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ],
                axis=-1,
            )
            rgb = np.clip(rgb, 0, 255)
        else:
            return None
        px = np.rint(rgb).astype(np.int64)
        rows = [
            [tuple(int(v) for v in px[y, x]) for x in range(ww)]
            for y in range(hh)
        ]
        return (ww, hh, _features(rows))

    def decode_pixels(payload: bytes):
        try:
            return (
                _decode_png(payload)
                or _decode_bmp(payload)
                or _decode_gif(payload)
                or _decode_jpeg(payload)
            )
        except Exception:
            return None

    return decode_pixels


decode_pixels = _make_pixel_decoder()


def _make_wav_decoder():
    """AUDIO tier: RIFF/WAVE PCM plus G.711 mu-law/A-law (the published
    ITU expansion formulas — 256-entry tables built here) need only
    struct. Nested-builder for the same pickle-by-value reason as the
    image parser. Returns (header_fn, features_fn)."""
    import struct

    def _ulaw_table():
        out = []
        for u in range(256):
            v = ~u & 0xFF
            exp, mant = (v >> 4) & 7, v & 0x0F
            x = (((mant << 3) + 0x84) << exp) - 0x84
            out.append(-x if v & 0x80 else x)
        return out

    def _alaw_table():
        out = []
        for a in range(256):
            v = a ^ 0x55
            exp, mant = (v >> 4) & 7, v & 0x0F
            if exp == 0:
                x = (mant << 4) + 8
            else:
                x = ((mant << 4) + 0x108) << (exp - 1)
            # A-law: the (toggled) sign bit SET means positive — the
            # opposite convention from mu-law
            out.append(x if v & 0x80 else -x)
        return out

    ULAW, ALAW = _ulaw_table(), _alaw_table()

    def parse_wav_header(payload: bytes):
        """RIFF/WAVE chunk walk (the published container spec): locate
        'fmt ' (format code 1 = PCM 8/16-bit, 6 = G.711 A-law,
        7 = G.711 mu-law) and 'data'. Returns
        ("audio/wav", sample_rate, n_channels, bits, n_frames,
        data_offset, data_len) or None; `bits` is -6/-7 for the law
        codecs (8-bit stored, 13/14-bit linear range)."""
        if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = pos + 8
            if cid == b"fmt " and clen >= 16 and body + 16 <= len(payload):
                code, nch, rate = struct.unpack(
                    "<HHI", payload[body : body + 8]
                )
                (bits,) = struct.unpack("<H", payload[body + 14 : body + 16])
                fmt = (code, nch, rate, bits)
            elif cid == b"data":
                data = (body, min(clen, len(payload) - body))
            pos = body + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        code, nch, rate, bits = fmt
        if nch < 1 or rate < 1:
            return None
        if code in (6, 7):
            if bits != 8:
                return None
            bits = -code  # law codecs: 8-bit stored, flagged negative
        elif code != 1 or bits not in (8, 16):
            return None
        frame_bytes = nch * (1 if bits < 0 else bits // 8)
        n_frames = data[1] // frame_bytes if frame_bytes else 0
        return ("audio/wav", rate, nch, bits, n_frames, data[0], data[1])

    def wav_features(payload: bytes):
        """duration_ms + an 8-dim per-segment RMS energy vector over the
        REAL samples (first channel) — the shape an audio embedding
        takes at cluster scale. Integer sums of squares (exact), one
        sqrt + normalization per segment."""
        hdr = parse_wav_header(payload)
        if hdr is None:
            return None
        _, rate, nch, bits, n_frames, off, dlen = hdr
        if n_frames == 0:
            return hdr, 0, [0.0] * 8
        width = 1 if bits < 0 else bits // 8
        stride = nch * width
        full_scale = 32768.0 if bits in (16, -6, -7) else 128.0
        seg_sums = [0] * 8
        seg_counts = [0] * 8
        for i in range(n_frames):
            base = off + i * stride
            if bits == 16:
                (s,) = struct.unpack_from("<h", payload, base)
            elif bits == -7:
                s = ULAW[payload[base]]
            elif bits == -6:
                s = ALAW[payload[base]]
            else:
                s = payload[base] - 128
            seg = min(7, i * 8 // n_frames)
            seg_sums[seg] += s * s
            seg_counts[seg] += 1
        feat = [
            round((ss / sc) ** 0.5 / full_scale, 6) if sc else 0.0
            for ss, sc in zip(seg_sums, seg_counts)
        ]
        duration_ms = n_frames * 1000 // rate
        return hdr, duration_ms, feat

    return parse_wav_header, wav_features


def _make_mp4_parser():
    """VIDEO HEADER tier: ISO-BMFF (MP4/MOV) metadata needs only struct —
    box walk to moov/mvhd (timescale+duration), the video trak's tkhd
    (16.16 fixed-point width/height), and its stbl/stsz sample count
    (frame count). No codec work: decode stays ffmpeg-gated, but the
    typed metadata a video pipeline partitions/filters on is real.
    Nested-builder for the same pickle-by-value reason as the image
    parser."""
    import struct

    _CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

    def _boxes(buf, start, end):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            typ = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    return
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:
                size = end - pos
            if size < 8 or pos + size > end:
                return
            yield typ, body, pos + size
            pos += size

    def parse_mp4_header(payload: bytes):
        """(mime, width, height, duration_ms, n_frames) or None."""
        if len(payload) < 16 or payload[4:8] != b"ftyp":
            return None
        timescale = duration = 0
        width = height = 0
        n_frames = 0

        def walk(start, end, in_video_trak):
            nonlocal timescale, duration, width, height, n_frames
            for typ, body, bend in _boxes(payload, start, end):
                if typ == b"mvhd":
                    ver = payload[body]
                    if ver == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", payload[body + 20 : body + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", payload[body + 12 : body + 20]
                        )
                elif typ == b"tkhd":
                    # width/height (16.16 fixed) follow the 36-byte
                    # matrix: body offset 76 for v0, 88 for v1
                    ver = payload[body]
                    off = body + (88 if ver == 1 else 76)
                    if off + 8 <= bend:
                        w_fp, h_fp = struct.unpack(
                            ">II", payload[off : off + 8]
                        )
                        if w_fp and h_fp:
                            width, height = w_fp >> 16, h_fp >> 16
                            in_video_trak[0] = True
                elif typ == b"stsz" and in_video_trak[0]:
                    (cnt,) = struct.unpack(
                        ">I", payload[body + 8 : body + 12]
                    )
                    if n_frames == 0:
                        n_frames = cnt
                elif typ == b"trak":
                    walk(body, bend, [False])
                elif typ in _CONTAINERS:
                    walk(body, bend, in_video_trak)

        walk(0, len(payload), [False])
        if width == 0 or height == 0:
            return None
        dur_ms = (duration * 1000) // timescale if timescale else 0
        return ("video/mp4", width, height, dur_ms, n_frames)

    return parse_mp4_header


parse_mp4_header = _make_mp4_parser()


parse_wav_header, wav_features = _make_wav_decoder()


def _real_decode(payload: bytes) -> dict:
    """Real media decode in two tiers, no codec library needed for either:

    * PIXEL tier (PNG, uncompressed BMP, non-interlaced GIF, baseline
      AND progressive JPEG — stdlib zlib/struct, a ~60-line LZW decoder,
      and a T.81 Huffman+IDCT decoder riding numpy, already a worker
      dependency):
      dimensions from the actual pixel array plus a real 8-dim
      color/luma feature vector (mean RGB, mean luma, quadrant lumas) —
      the shape a CNN/CLIP embedding would take at cluster scale.
    * HEADER tier (arithmetic-coded/hierarchical JPEG, WebP):
      dimensions + mime from the container header; the feature vector
      falls back to the deterministic payload-hash embedding.

    Raises only for formats with neither tier (compressed audio, non-MP4
    video), where PIL/ffmpeg on the cluster image is the real
    dependency."""
    hdr = parse_image_header(payload)
    if hdr is None:
        wv = wav_features(payload)
        if wv is not None:
            # AUDIO tier (RIFF/WAVE PCM, stdlib struct): typed metadata
            # maps onto the fixed feature schema as width=sample_rate,
            # height=n_channels, n_frames=audio frames; feat is the
            # REAL 8-segment RMS energy profile
            (mime, rate, nch, _bits, n_frames, _off, _dl), _dur, feat = wv
            return {
                "mime": mime,
                "width": rate,
                "height": nch,
                "n_frames": n_frames,
                "feat": feat,
            }
        mp4 = parse_mp4_header(payload)
        if mp4 is not None:
            # VIDEO HEADER tier (ISO-BMFF, stdlib struct): real typed
            # metadata (dims, frame count from the video trak's stsz);
            # frame DECODE stays ffmpeg-gated, so the feature vector is
            # the deterministic payload-hash embedding
            import hashlib

            mime, vw, vh, _dur_ms, vframes = mp4
            digest = hashlib.sha256(payload).digest()
            return {
                "mime": mime,
                "width": vw,
                "height": vh,
                "n_frames": max(vframes, 1),
                "feat": [round(b / 255.0, 6) for b in digest[3:11]],
            }
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
    px = decode_pixels(payload)
    if px is not None and px[2] is not None:
        width, height, feat = px[0], px[1], px[2]
    else:
        digest = hashlib.sha256(payload).digest()
        feat = [round(b / 255.0, 6) for b in digest[3:11]]
    return {
        "mime": mime,
        "width": width,
        "height": height,
        "n_frames": 1,
        "feat": feat,
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
    pixel_decode = _make_pixel_decoder()
    wav_decode = _make_wav_decoder()[1]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def decode(payload: bytes, in_mime: str) -> tuple:
            h = hashlib.sha256(payload).digest()
            feat = [round(b / 255.0, 6) for b in h[3:11]]
            hdr = parse_header(payload)
            if hdr is not None:
                mime, width, height = hdr
                px = pixel_decode(payload)
                if px is not None and px[2] is not None:
                    # pixel tier: real dims + real color/luma features
                    return (mime, px[0], px[1], 1, px[2])
                return (mime, width, height, 1, feat)
            wv = wav_decode(payload)
            if wv is not None:
                # audio tier: width=sample_rate, height=n_channels,
                # n_frames=audio frames, feat=8-segment RMS profile
                (wmime, rate, nch, _b, n_fr, _o, _d), _dur, wfeat = wv
                return (wmime, rate, nch, n_fr, wfeat)
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
