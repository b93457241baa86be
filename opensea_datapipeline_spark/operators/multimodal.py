"""Multimodal column handling — image/audio/video as opaque binary columns
with typed metadata (LLM-data-pipeline extension mandated by BASELINE.json;
the reference's closest analog is its image-embedding ingestion,
`scripts/embeddings/generate_clip_embeddings.py:28-91`).

Conventions:

- A media asset is ``(asset_id LONG, media BINARY, media_type STRING,
  meta STRUCT<...>)``. The binary payload is opaque to the engine; all
  engine-side ops are metadata extraction, chunking/frame-sampling, and
  batched feature extraction over Arrow.
- ``decode_media`` is a REAL decoder: a pure-Python PNG/GIF/BMP/JPEG/WebP
  header parser with a PIL fallback behind an import-try (no stub). The
  Spark-side plumbing — schema, partitioning, ``mapInPandas`` batch
  shape — is tested with ``byte_histogram_features`` as the
  deterministic featurizer.
- Payload columns are heavy: every op here projects the binary column
  late and never shuffles it unless the result requires it (metadata ops
  reduce to scalars *before* any groupBy).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8  # byte-histogram buckets (256 / 32)


def attach_binary_payload(
    df: DataFrame, source_col: str, out_col: str = "media",
    media_type: str = "text/plain",
) -> DataFrame:
    """Materialize an opaque binary payload column. In production this is
    the raw image/audio bytes read by ``spark.read.format('binaryFile')``;
    the testdata stand-in encodes an existing string column — the
    downstream plumbing is identical either way."""
    return df.withColumn(out_col, F.encode(F.col(source_col), "UTF-8")).withColumn(
        "media_type", F.lit(media_type)
    )


def binary_metadata(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """Typed metadata over the opaque payload: byte length, content digest,
    magic-prefix hex. All JVM built-ins — no payload leaves the executor,
    no Python boundary."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_md5"),
        F.lower(F.hex(F.substring(F.col(bin_col), 1, 4))).alias("magic_hex"),
        "media_type",
    )


def frame_sample(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "asset_id",
    frame_bytes: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Frame/chunk sampling for a video/audio-like payload: split the byte
    stream into fixed-size frames, keep every ``stride``-th. Pure built-ins
    (sequence + transform + posexplode) — rows fan out on the executors,
    never through the driver."""
    n_frames = F.ceil(F.octet_length(F.col(bin_col)) / F.lit(frame_bytes))
    frames = F.transform(
        F.sequence(F.lit(0), n_frames.cast("int") - 1),
        lambda i: F.substring(
            F.col(bin_col), i * F.lit(frame_bytes) + 1, F.lit(frame_bytes)
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(frames).alias("frame_idx", "frame"))
        .filter(F.col("frame_idx") % stride == 0)
        .select(
            id_col,
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.octet_length("frame").cast("long").alias("frame_len"),
            F.lower(F.hex(F.substring(F.col("frame"), 1, 8))).alias("frame_prefix_hex"),
        )
    )


def byte_histogram_features(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Deterministic stand-in featurizer: normalized ``dim``-bucket byte
    histogram per asset, computed in Arrow batches via ``mapInPandas``.

    This is the exact seam a real encoder (CLIP / wav2vec / a
    ``predict_batch_udf`` model) plugs into: binary column in → fixed-dim
    ``array<double>`` out, one Arrow batch per partition chunk, zero
    driver involvement. Swap the numpy body for model inference and the
    plan is unchanged.
    """
    import numpy as np
    import pandas as pd

    bucket = 256 // dim
    schema = f"{id_col} long, feature array<double>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[bin_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // bucket, minlength=dim).astype("float64")
                total = hist.sum()
                # raw float64 divisions, deliberately un-rounded: the DuckDB
                # oracle computes the same count/total in float64, so the
                # bits match exactly; pre-rounding here (numpy half-even)
                # can disagree with SQL ROUND (half-away) on exact ties
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.select(id_col, bin_col).mapInPandas(featurize, schema=schema)


def synthesize_image_payloads(
    df: DataFrame, id_col: str = "doc_id", out_id: str = "asset_id"
) -> DataFrame:
    """Deterministic stand-in for a binaryFile scan of an image corpus:
    per row, a structurally valid PNG / GIF / BMP / JPEG / WebP *header*
    (format cycles on ``id % 5``; dims derive from the id) built entirely
    JVM-side via ``format_string`` + ``unhex``. Exercises the real byte
    layout each decoder parses — magic, big-endian PNG IHDR / JPEG SOF0,
    little-endian GIF/BMP/VP8 dimension fields, JPEG marker-segment
    walking past a JFIF APP0 — so `decode_media` is tested against actual
    bytes, not a mock."""
    w = (F.col(id_col) % 640 + 16).cast("int")
    h = (F.col(id_col) % 480 + 16).cast("int")
    fmt = F.col(id_col) % 5

    def le16(c):  # 2-byte little-endian hex
        return F.format_string("%02x%02x", c % 256, (c / 256).cast("int"))

    def be16(c):  # 2-byte big-endian hex
        return F.format_string("%04x", c)

    def be32(c):  # 4-byte big-endian hex
        return F.format_string("%08x", c)

    def le32(c):  # 4-byte little-endian hex (dims < 2^16 so hi bytes are 0)
        return F.concat(le16(c), F.lit("0000"))

    png = F.concat(
        F.lit("89504e470d0a1a0a" "0000000d" "49484452"), be32(w), be32(h),
        F.lit("0802"),  # bit depth 8, color type 2 (truecolor RGB)
    )
    gif = F.concat(
        F.lit("474946383961"), le16(w), le16(h),
        F.lit("00" * 16),  # screen-descriptor tail padding
    )
    bmp = F.concat(
        F.lit("424d" + "00" * 12 + "28000000"), le32(w), le32(h),
        F.lit("0100" "1800"),  # 1 plane, 24 bpp
    )
    jpeg = F.concat(
        # SOI + full JFIF APP0 (len 0x10), so the parser must actually
        # walk the marker stream, then SOF0 (len 0x11): precision 8,
        # HEIGHT-then-WIDTH big-endian, 3 components (YCbCr -> RGB)
        F.lit("ffd8" "ffe0" "0010" "4a46494600" "0101" "00"
              "0001" "0001" "0000" "ffc0" "0011" "08"),
        be16(h), be16(w),
        F.lit("03" "011100" "021101" "031101"),
    )
    webp = F.concat(
        # RIFF(22) WEBP + lossy VP8 chunk(10): 3-byte frame tag
        # (keyframe), 9d012a sync, then 14-bit little-endian dims
        F.lit("52494646" "16000000" "57454250" "56503820" "0a000000"
              "000000" "9d012a"),
        le16(w), le16(h),
    )
    hex_payload = (
        F.when(fmt == 0, png).when(fmt == 1, gif).when(fmt == 2, bmp)
        .when(fmt == 3, jpeg).otherwise(webp)
    )
    return df.select(
        F.col(id_col).alias(out_id), F.unhex(hex_payload).alias("media")
    )


_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_BMP_MODES = {1: "1", 8: "P", 24: "RGB", 32: "RGBA"}


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """Pure-Python image header parse: (width, height, mode) for PNG, GIF,
    BMP, JPEG (SOF0-SOF15 marker scan), and WebP (VP8/VP8L/VP8X) payloads,
    None for anything unrecognized. Reads only the fixed
    header region — no decoder library, no full-image decode — which is
    exactly what dimension/metadata extraction needs at corpus scale
    (the reference's image ingestion pulls Image.size the same way,
    `scripts/embeddings/generate_clip_embeddings.py:28-91`).
    """
    import struct

    # 25 = minimal VP8L WebP; every branch below bounds-checks its own
    # wider reads (a real PNG/BMP is always >= 26 bytes anyway)
    if payload is None or len(payload) < 25:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        mode = _PNG_MODES.get(payload[25], "RGB") if len(payload) > 25 else "RGB"
        return w, h, mode
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "P"
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0] if len(payload) >= 30 else 24
        return w, abs(h), _BMP_MODES.get(bpp, "RGB")
    if payload[:2] == b"\xff\xd8":
        # JPEG: walk the marker stream to the first SOF frame header
        # (C0-CF minus DHT C4 / JPG C8 / DAC CC), which carries
        # [precision][height:2][width:2][n_components]. Real corpora —
        # including the reference's own raw images, which it AVIF->PNG
        # converts (batch_generate_all_embeddings.py:67-69) — are mostly
        # JPEG, so the no-PIL fallback must cover it.
        pos = 2
        while pos + 9 < len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length field
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                ncomp = payload[pos + 9]
                return w, h, {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, "RGB")
            pos += 2 + struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        fourcc = payload[12:16]
        if fourcc == b"VP8 " and len(payload) >= 30 and payload[23:26] == b"\x9d\x01\x2a":
            w, h = struct.unpack("<HH", payload[26:30])
            return w & 0x3FFF, h & 0x3FFF, "RGB"
        if fourcc == b"VP8L" and payload[20] == 0x2F:
            bits = struct.unpack("<I", payload[21:25])[0]
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "RGBA"
        if fourcc == b"VP8X" and len(payload) >= 30:
            wm1 = int.from_bytes(payload[24:27], "little")
            hm1 = int.from_bytes(payload[27:30], "little")
            return wm1 + 1, hm1 + 1, ("RGBA" if payload[20] & 0x10 else "RGB")
        return None
    return None


def _decode_binary_metadata(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    parser,
    columns: list[str],
    schema_tail: str,
) -> DataFrame:
    """Shared ``mapInPandas`` scaffold for every binary-metadata decoder
    (image/audio/video): Arrow batches in, exactly one row per asset
    out, ``parser(payload)`` returning a ``len(columns)`` tuple or None
    — unrecognized payloads yield NULL fields instead of failing the
    batch (permissive-scan semantics, matching the engine's CSV
    policy). One copy of the batch loop keeps the permissive-NULL and
    batch-shape behavior identical across formats."""
    from collections.abc import Iterator as It

    import pandas as pd

    schema = f"{id_col} long, {schema_tail}"
    nulls = (None,) * len(columns)

    def decode(batches: It[pd.DataFrame]) -> It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[bin_col]):
                parsed = parser(payload)
                rows.append((aid, *(parsed if parsed else nulls)))
            yield pd.DataFrame(rows, columns=[id_col, *columns])

    return df.select(id_col, bin_col).mapInPandas(decode, schema=schema)


def decode_media(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """Image metadata decode over the binary payload column: (width,
    height, mode) per asset via ``mapInPandas`` Arrow batches.

    Uses PIL when installed (full format coverage); otherwise falls back to
    the pure-Python header parser (PNG/GIF/BMP) — real decode either way,
    no stub."""
    import io

    try:
        import PIL.Image as Image
    except ImportError:
        Image = None

    def parse(payload):
        parsed = parse_image_header(payload)
        if parsed is None and Image is not None and payload:
            try:
                img = Image.open(io.BytesIO(payload))
                parsed = (img.width, img.height, img.mode)
            except Exception:
                parsed = None
        return parsed

    return _decode_binary_metadata(
        df, bin_col, id_col, parse,
        ["width", "height", "mode"],
        "width long, height long, mode string",
    )


def synthesize_audio_payloads(
    df: DataFrame, id_col: str = "doc_id", out_id: str = "asset_id"
) -> DataFrame:
    """Deterministic stand-in for a binaryFile scan of an audio corpus:
    per row, a structurally valid PCM WAV *header* (RIFF/WAVE with a
    16-byte fmt chunk and a declared-size data chunk) built entirely
    JVM-side via ``format_string`` + ``unhex`` — the audio sibling of
    ``synthesize_image_payloads``. Every ``id % 7 == 0`` payload gets a
    LIST/INFO chunk BETWEEN fmt and data so the parser must actually
    walk the RIFF chunk stream (the same honesty trick as the JPEG
    APP0 segment). Channels/rate/bits/sample-count all derive from the
    id, so an SQL oracle can recompute the expected metadata exactly."""
    # stage the derived params as projection columns: subexpression
    # elimination skips when-chains, so referencing the rate CASE (or
    # anything built on it) multiple times in one projection would
    # re-evaluate the whole chain per reference (the repo's
    # stage-expensive-exprs rule; CollapseProject keeps multiply-
    # referenced non-cheap aliases staged)
    staged = df.select(
        F.col(id_col).alias(out_id),
        (F.col(id_col) % 2 + 1).cast("int").alias("_ch"),
        (
            F.when(F.col(id_col) % 5 == 0, 8000)
            .when(F.col(id_col) % 5 == 1, 16000)
            .when(F.col(id_col) % 5 == 2, 22050)
            .when(F.col(id_col) % 5 == 3, 44100)
            .otherwise(48000)
        ).cast("int").alias("_rate"),
        F.when(F.col(id_col) % 3 == 0, 8).otherwise(16).cast("int").alias(
            "_bits"
        ),
        (F.col(id_col) % 1000 + 100).cast("int").alias("_n"),
        (F.col(id_col) % 7 == 0).alias("_hl"),
    ).withColumn(
        "_ba", (F.col("_ch") * F.col("_bits") / 8).cast("int")
    ).withColumn(
        "_ds", F.col("_n") * F.col("_ba")
    )
    ch, rate, bits = F.col("_ch"), F.col("_rate"), F.col("_bits")
    block_align, data_size = F.col("_ba"), F.col("_ds")
    has_list = F.col("_hl")
    byte_rate = rate * block_align
    extra = F.when(has_list, 12).otherwise(0)

    def le16(c):  # 2-byte little-endian hex
        return F.format_string("%02x%02x", c % 256, (c / 256).cast("int"))

    def le32(c):  # 4-byte little-endian hex (values < 2^24 here)
        return F.format_string(
            "%02x%02x%02x00",
            c % 256,
            (c / 256).cast("int") % 256,
            (c / 65536).cast("int") % 256,
        )

    hex_payload = F.concat(
        F.lit("52494646"), le32(F.lit(36) + extra + data_size),  # RIFF size
        F.lit("57415645" "666d7420" "10000000" "0100"),  # WAVE fmt(16) PCM
        le16(ch), le32(rate), le32(byte_rate), le16(block_align), le16(bits),
        F.when(has_list, F.lit("4c495354" "04000000" "494e464f")).otherwise(
            F.lit("")
        ),
        F.lit("64617461"), le32(data_size),  # data chunk, declared size
    )
    return staged.select(out_id, F.unhex(hex_payload).alias("media"))


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Pure-Python RIFF/WAVE header parse: (channels, sample_rate,
    bits_per_sample, n_samples) from the fmt and data chunks, walking
    the chunk stream (word-aligned sizes) so LIST/INFO or other chunks
    between fmt and data are skipped correctly. Returns None for
    anything unrecognized. Reads only declared sizes — the data bytes
    themselves may be absent (header-only payloads), exactly like the
    image header parsers."""
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and size >= 16 and pos + 24 <= len(payload):
            body = payload[pos + 8 : pos + 24]
            audio_format = int.from_bytes(body[0:2], "little")
            if audio_format != 1:  # PCM only
                return None
            fmt = (
                int.from_bytes(body[2:4], "little"),    # channels
                int.from_bytes(body[4:8], "little"),    # sample_rate
                int.from_bytes(body[12:14], "little"),  # block_align
                int.from_bytes(body[14:16], "little"),  # bits
            )
        elif cid == b"data":
            data_size = size
            break  # data is the terminal chunk for metadata purposes
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    channels, sample_rate, block_align, bits = fmt
    if not channels or not sample_rate or not block_align:
        return None
    return channels, sample_rate, bits, data_size // block_align


def decode_audio(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """Audio metadata decode over the binary payload column: (channels,
    sample_rate, bits_per_sample, n_samples, duration_us) per asset via
    ``mapInPandas`` Arrow batches — the audio seam of the multimodal
    column family. Unrecognized payloads yield NULL fields instead of
    failing the batch (permissive-scan semantics, like decode_media).

    Duration is INTEGER MICROSECONDS computed JVM-side from the decoded
    integers, not a Python-rounded float: n/16000-style durations are
    mathematically exact halfway cases at 6 decimals for every odd
    sample count, where Python's banker rounding and SQL's half-up
    diverge structurally. floor(n·1e6/rate) in IEEE doubles is exact
    (values ≤ ~1e9, gaps to the nearest integer ≥ 1/rate ≫ double
    error), so both engines agree bit-for-bit."""
    return _decode_binary_metadata(
        df, bin_col, id_col, parse_wav_header,
        ["channels", "sample_rate", "bits_per_sample", "n_samples"],
        "channels long, sample_rate long, bits_per_sample long, "
        "n_samples long",
    ).withColumn(
        "duration_us",
        F.floor(
            F.col("n_samples") * 1_000_000 / F.col("sample_rate")
        ).cast("long"),
    )


def synthesize_video_payloads(
    df: DataFrame, id_col: str = "doc_id", out_id: str = "asset_id"
) -> DataFrame:
    """Deterministic stand-in for a binaryFile scan of a video corpus:
    per row, a structurally valid MP4 header — ``ftyp`` box plus a
    ``moov`` box nesting ``mvhd`` (v0: timescale + duration) and a
    ``trak``/``tkhd`` (v0: 16.16 fixed-point width/height) — built
    JVM-side, completing the image/audio/video triple. Every
    ``id % 7 == 0`` payload carries a ``free`` box between ftyp and
    moov, and inside moov an ``udta`` box BEFORE trak, so the parser
    must genuinely walk both the top-level and the nested box streams.
    Timescale cycles {600, 1000, 90000, 24000, 30000} on ``id % 5``;
    duration ticks = id % 9000 + 600; width/height reuse the image
    formulas ((id % 640) + 16, (id % 480) + 16)."""
    # stage the params (same rule as synthesize_audio_payloads: the
    # timescale CASE and duration feed multiple byte fields)
    staged = df.select(
        F.col(id_col).alias(out_id),
        (F.col(id_col) % 640 + 16).cast("long").alias("_w"),
        (F.col(id_col) % 480 + 16).cast("long").alias("_h"),
        (
            F.when(F.col(id_col) % 5 == 0, 600)
            .when(F.col(id_col) % 5 == 1, 1000)
            .when(F.col(id_col) % 5 == 2, 90000)
            .when(F.col(id_col) % 5 == 3, 24000)
            .otherwise(30000)
        ).cast("long").alias("_tsc"),
        (F.col(id_col) % 9000 + 600).cast("long").alias("_dur"),
        (F.col(id_col) % 7 == 0).alias("_he"),
    )
    w, h = F.col("_w"), F.col("_h")
    tsc, dur = F.col("_tsc"), F.col("_dur")
    has_extra = F.col("_he")

    def be32(c):  # 4-byte big-endian hex
        return F.format_string("%08x", c)

    ftyp = F.lit("0000001466747970" "69736f6d" "00000200" "6d703431")
    free = F.when(has_extra, F.lit("0000000c6672656500000000")).otherwise(
        F.lit("")
    )
    # mvhd v0: 8 (hdr) + 4 (ver/flags) + 8 (times) + 4 tsc + 4 dur + 80 tail
    mvhd = F.concat(
        F.lit("0000006c" "6d766864" "00000000" "00000000" "00000000"),
        be32(tsc), be32(dur),
        F.lit("00" * 80),
    )
    udta = F.when(has_extra, F.lit("0000000c7564746100000000")).otherwise(
        F.lit("")
    )
    # tkhd v0: 8 + 4 + 8 (times) + 4 id + 4 res + 4 dur + 8 res + 2+2+2+2
    # + 36 matrix + 4 w(16.16) + 4 h(16.16) = 92
    tkhd = F.concat(
        F.lit("0000005c" "746b6864" "00000007" "00000000" "00000000"
              "00000001" "00000000"),
        be32(dur),
        F.lit("00" * 8 + "0000" "0000" "0000" "0000" + "00" * 36),
        be32(w * 65536), be32(h * 65536),
    )
    trak = F.concat(be32(F.length(F.unhex(tkhd)) + 8), F.lit("7472616b"), tkhd)
    moov_body = F.concat(mvhd, udta, trak)
    moov = F.concat(
        be32(F.length(F.unhex(moov_body)) + 8), F.lit("6d6f6f76"), moov_body
    )
    hex_payload = F.concat(ftyp, free, moov)
    return staged.select(out_id, F.unhex(hex_payload).alias("media"))


def parse_mp4_header(payload: bytes):
    """Pure-Python MP4 box walk: (timescale, duration_ticks, width,
    height) from moov/mvhd and the first video trak/tkhd, walking the
    top-level box stream and the nested moov stream (so free/udta boxes
    are skipped correctly). Returns None for anything unrecognized.
    tkhd width/height are 16.16 fixed point; only version-0 boxes are
    handled (the synthesizer emits v0; real v1 boxes would extend the
    time fields to 64 bits — a documented TODO seam, not silent
    misparse: v1 returns None)."""
    def boxes(buf, pos, end):
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            if size < 8 or pos + size > end:
                return
            yield btype, pos + 8, pos + size
            pos += size

    if payload is None or len(payload) < 16:
        return None
    if payload[4:8] != b"ftyp":
        return None
    tsc = dur = width = height = None
    for btype, body, bend in boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ityp, ib, ie in boxes(payload, body, bend):
            if ityp == b"mvhd" and ie - ib >= 20:
                if payload[ib] != 0:  # v1 (64-bit times): refuse, no guess
                    return None
                tsc = int.from_bytes(payload[ib + 12 : ib + 16], "big")
                dur = int.from_bytes(payload[ib + 16 : ib + 20], "big")
            elif ityp == b"trak" and width is None:
                for ttyp, tb, te in boxes(payload, ib, ie):
                    if ttyp == b"tkhd" and te - tb >= 84:
                        if payload[tb] != 0:
                            return None
                        width = int.from_bytes(payload[te - 8 : te - 4], "big") >> 16
                        height = int.from_bytes(payload[te - 4 : te], "big") >> 16
    if tsc is None or not tsc or dur is None or width is None:
        return None
    return tsc, dur, width, height


def decode_video(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """Video metadata decode over the binary payload column: (timescale,
    duration_ticks, width, height, duration_us) per asset via
    ``mapInPandas`` Arrow batches — the video seam of the multimodal
    column family. Permissive NULLs on unrecognized payloads; duration
    converted JVM-side to integer microseconds (same exact-floor
    rationale as decode_audio)."""
    return _decode_binary_metadata(
        df, bin_col, id_col, parse_mp4_header,
        ["timescale", "duration_ticks", "width", "height"],
        "timescale long, duration_ticks long, width long, height long",
    ).withColumn(
        "duration_us",
        F.floor(
            F.col("duration_ticks") * 1_000_000 / F.col("timescale")
        ).cast("long"),
    )
