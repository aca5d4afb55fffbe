"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY §7.6, beyond-reference surface).

Spark-side plumbing is real and tested: schema (`binary` payload +
metadata struct), Arrow-batched decode/feature UDFs over `mapInPandas`,
partition sizing for large blobs. The image codec slot is REAL for
PNG/PPM/PGM/BMP (operators/imagecodec.py — pure numpy+zlib decode,
bilinear resize, PNG encode, spec-golden tested), baseline JPEG
(operators/jpegcodec.py — from-scratch T.81 sequential DCT + Huffman,
r9), and animated GIF (operators/gifcodec.py — from-scratch LZW, r9;
`gif_frame_codec` makes frame sampling a real extraction path with the
duration read from the container bytes). Formats that need external
libraries (WEBP, mp4/webm video, compressed audio) fall back to
clearly-marked deterministic fakes so every transform stays total and
reproducible.

SCALE:
- Blobs ride in parquet binary columns; `rebatch_for_blobs` keeps Arrow
  record batches small so a partition of large blobs fits executor
  memory (`spark.sql.execution.arrow.maxRecordsPerBatch` is the global
  knob; per-operator we repartition by count).
- Decode is embarrassingly parallel → mapInPandas, no shuffle.
- Frame-sampling/fingerprints reduce early (project small features
  before any join/agg so blobs never shuffle).
"""

from __future__ import annotations

import hashlib
from contextlib import contextmanager
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


@contextmanager
def blob_batch_size(spark, max_records_per_batch: int = 64):
    """Scoped Arrow batch-size cap for blob-heavy mapInPandas work:
    sets `spark.sql.execution.arrow.maxRecordsPerBatch` on entry and
    RESTORES the previous value on exit, so the cap never leaks into
    unrelated pandas-UDF operators (kmeans partials, Arrow IVF) in the
    same session. The conf is read at EXECUTION time, so run the
    action(s) inside the `with` block."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, str(max_records_per_batch))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def rebatch_for_blobs(
    df: DataFrame,
    *,
    max_records_per_batch: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Right-size Arrow transfer for large binary payloads (the
    multimodal analog of the reference's nline mapper-sizing,
    io/nline.clj:8-19).

    The actual per-task memory bound for mapInPandas over blobs is the
    Arrow record batch, so `max_records_per_batch` caps
    `spark.sql.execution.arrow.maxRecordsPerBatch` — NOTE this conf is
    SESSION-WIDE and applies to every subsequent pandas-UDF operator
    until changed back; prefer the scoped `blob_batch_size` context
    manager around the action instead. Left `None`, nothing is mutated.
    Partition byte sizing comes free from the scan
    (`spark.sql.files.maxPartitionBytes` splits parquet by bytes, blobs
    included). NO counting pass — a `df.count()` here would be a full
    extra scan of the binary data. Pass `num_partitions` only when the
    caller knows the blob geometry better than the file splits do
    (e.g. after an explodey transform). Parameters are keyword-only
    (the first positional arg changed meaning in r2 — loud is better
    than silent)."""
    if max_records_per_batch is not None:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(max_records_per_batch),
        )
    return df.repartition(num_partitions) if num_partitions else df


def binary_fingerprint(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact-dedup fingerprint for blobs — JVM-side md5 over binary, no
    Python. The blob itself never shuffles; only (id, fp)."""
    return df.withColumn("fp", F.md5(F.col(payload_col)))


def decode_distinct(
    df: DataFrame,
    decode_fn,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Exact-duplicate short-circuit for Python codec paths (r7 verdict
    #8): fingerprint every blob JVM-side (md5 — `binary_fingerprint`),
    decode each DISTINCT payload ONCE, and fan the decoded columns back
    to every id by fingerprint. Web-scale media corpora are heavy with
    byte-identical payloads (mirrors, hotlinks, re-crawls); the Python
    decode is the expensive stage, so paying it per distinct blob
    instead of per row is a direct multiplier on codec throughput.

    `decode_fn` is any of this module's codec operators — a function
    DataFrame[(id, payload)] → DataFrame[(id, ...decoded)] whose output
    is a PURE function of the payload (true of every codec here:
    features/hashes/fingerprints never depend on the id) and
    ROW-PRESERVING (one output row per input row — a codec that drops
    undecodable rows instead of emitting a fallback would silently
    drop every duplicate of those payloads here; this module's codecs
    all emit fallbacks). The result is row-for-row identical to
    `decode_fn(df)` — the gate entry pins that hash-equality against
    the per-row path's own oracle.

    SCALE: one blob scan → per-fingerprint partial-agg dedup
    (dropDuplicates: map-side First() combine, so the shuffle carries
    roughly per-partition-distinct blobs, never the raw corpus) →
    decode over the distinct set → two KEY-SIZED joins ((id, fp) ⋈
    (fp, decoded) — 32-hex strings + decoded scalars, no payload
    bytes). NULL payloads fingerprint to a sentinel so they flow
    through the same path (the codecs already handle None)."""
    fp = F.coalesce(F.md5(F.col(payload_col)), F.lit("__null__"))
    fp_df = df.select(
        F.col(id_col), F.col(payload_col), fp.alias("__fp")
    )
    ids = fp_df.select(id_col, "__fp")
    # The distinct-representative set is PERSISTED and materialized
    # (r12): it is consumed twice (the decode pass and the fingerprint
    # fan-back join), and each unpersisted consumption re-executed the
    # whole upstream blob scan — profiled as 3-4 source passes per run
    # where two are inherent (the fingerprint pass + one distinct
    # build). Caching it is the operator's own scale premise: distinct
    # payloads ≪ corpus rows, and persist's MEMORY_AND_DISK default
    # spills rather than recomputes if a corpus breaks the premise.
    # The caller owns the blocks (same contract as jaccard_verify).
    # Discharge handle (r13, ADVICE fix): `reps` is internal, so the
    # persisted frame rides on the returned DataFrame as
    # `._parkour_persisted` — long-lived sessions unpersist those (or
    # spark.catalog.clearCache()) once the result is consumed.
    reps = fp_df.dropDuplicates(["__fp"]).persist()
    reps.count()
    decoded = decode_fn(reps.drop("__fp"))
    by_fp = decoded.withColumnRenamed(id_col, "__rep").join(
        reps.select(F.col(id_col).alias("__rep"), "__fp"), "__rep"
    ).drop("__rep")
    out_cols = [c for c in decoded.columns if c != id_col]
    out = ids.join(by_fp, "__fp").select(id_col, *out_cols)
    out._parkour_persisted = [reps]
    return out


def decode_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Image decode → feature vector via Arrow-batched mapInPandas.

    For decodable formats (PNG/PPM/PGM/BMP — operators/imagecodec.py,
    pure numpy+zlib) the features are REAL per-channel mean/std + an
    8-bin gray histogram; payloads needing an external codec
    (JPEG/WEBP) fall back to a clearly-marked deterministic fake, so
    the transform stays total and reproducible. Both paths emit 16
    floats.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _fake_decode(payload: bytes) -> list[float]:
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[:16]]

    def _features(payload: bytes) -> list[float]:
        # real per-channel stats + gray histogram for decodable formats
        # (imagecodec.py); sha-derived fake otherwise — both 16 floats
        from parkour_spark.operators import imagecodec as IC

        if IC.sniff_format(payload) is not None:
            try:
                return [float(x) for x in IC.image_stats(payload, bins=8)]
            except Exception:
                pass  # sniffed magic on non-image bytes — never crash
        return _fake_decode(payload)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features(p) if p is not None else None for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(decode, schema=out_schema)


def decode_audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Audio decode → feature vector via Arrow-batched mapInPandas: for
    RIFF WAV PCM payloads (operators/audiocodec.py — pure struct+numpy)
    the features are REAL [duration_s, rms, peak, zcr, 8 log-spaced
    spectral band densities]; compressed formats (MP3/AAC) fall back to
    the deterministic fake. Both paths emit 12 floats; nulls pass
    through."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _fake(payload: bytes) -> list[float]:
        digest = hashlib.sha256(b"audio:" + payload).digest()
        return [b / 255.0 for b in digest[:12]]

    def _features(payload: bytes) -> list[float]:
        from parkour_spark.operators import audiocodec as AC

        if AC.sniff_wav(payload):
            try:
                return [float(x) for x in AC.audio_stats(payload, bands=8)]
            except Exception:
                pass  # sniffed magic on garbage bytes — never crash
        return _fake(payload)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features(p) if p is not None else None for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(decode, schema=out_schema)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image codec resize: sha256 keyed by
    payload+dims, tiled to a plausible output size. CLEARLY A STUB —
    used only for formats the real codec can't decode (JPEG/WEBP need
    libraries this container lacks)."""
    digest = hashlib.sha256(payload + f":{width}x{height}".encode()).digest()
    out_len = max(32, (width * height) // 64)
    return (digest * (out_len // len(digest) + 1))[:out_len]


def default_resize(payload: bytes, width: int, height: int) -> bytes:
    """Default image-resize codec: REAL decode → bilinear → PNG for the
    formats operators/imagecodec.py implements in pure numpy+zlib (PNG,
    PPM/PGM, 24-bit BMP); the deterministic fake only for payloads it
    can't decode — so the gate's text-byte payloads stay exactly
    reproducible while real images get a real resample."""
    from parkour_spark.operators import imagecodec as IC

    if IC.sniff_format(payload) is not None:
        try:
            return IC.resize_payload(payload, width, height)
        except Exception:
            # a sniffed magic on non-image bytes (text starting "BM"),
            # or an unsupported variant (16-bit / interlaced PNG) —
            # decode of ARBITRARY bytes must never sink the pipeline
            pass
    return _fake_resize(payload, width, height)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    codec=None,
) -> DataFrame:
    """Image resize over Arrow-batched mapInPandas: (media_id, payload,
    width, height) out, one row per input image. The Spark-side
    plumbing — schema, batch iteration, null passthrough, no shuffle —
    is real; `codec` is `callable(bytes, w, h) -> bytes`. The default
    (`default_resize`) does a REAL decode → bilinear → PNG re-encode
    for PNG/PPM/PGM/BMP payloads via the pure-numpy codec in
    operators/imagecodec.py, falling back to the deterministic fake
    only for formats that genuinely need an external library
    (JPEG/WEBP)."""
    codec = codec or default_resize
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                codec(p, width, height) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(work, schema=out_schema)


def _fake_frame(payload: bytes, frame_idx: int) -> bytes:
    """Deterministic stand-in for a video-frame extraction codec."""
    return hashlib.sha256(payload + f":frame{frame_idx}".encode()).digest()


def gif_frame_codec(payload: bytes, frame_idx: int) -> bytes:
    """REAL frame-extraction codec for animated GIF payloads
    (operators.gifcodec, from-scratch LZW — r9): extracts the frame
    losslessly and returns it PNG-encoded, so every downstream image
    operator (dhash, stats, resize) composes unchanged. The first
    codec slot in this module that is real for a genuinely MULTI-frame
    container; mp4/webm stay behind `codec=` (ffmpeg/pyav in
    production)."""
    from parkour_spark.operators.gifcodec import gif_frame
    from parkour_spark.operators.imagecodec import encode_png

    return encode_png(gif_frame(payload, frame_idx))


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    codec=None,
    duration_fn=None,
) -> DataFrame:
    """Frame sampling over mapInPandas: one output row per sampled frame
    (media_id, frame_idx, frame_ms, frame). Frame count derives from
    meta.duration_ms — a row-expanding (UDTF-shaped) Pandas transform,
    the streaming-friendly batch shape: frames for one video are emitted
    incrementally, never materialized per-video. `codec` is
    `callable(bytes, frame_idx) -> bytes` (gif_frame_codec for animated
    GIFs — real, from-scratch; ffmpeg/pyav for mp4/webm in production);
    the default is a deterministic fake. `duration_fn`
    (`callable(bytes) -> ms`, e.g. gifcodec.gif_duration_ms) derives
    the duration from the CONTAINER BYTES instead of trusting metadata
    — crawled media metadata lies; the container doesn't."""
    codec = codec or _fake_frame
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, frames = [], [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf[payload_col], pdf["meta"]
            ):
                if duration_fn is not None and payload is not None:
                    try:
                        duration = duration_fn(bytes(payload))
                    except ValueError:
                        continue  # undecodable container: no frames
                else:
                    duration = (meta or {}).get("duration_ms") or 0
                if payload is None or duration <= 0:
                    continue
                for i, ms in enumerate(range(0, int(duration), every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    mss.append(ms)
                    frames.append(codec(payload, i))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ms": mss, "frame": frames}
            )

    return df.mapInPandas(work, schema=out_schema)


def perceptual_dhash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_id, dhash, decodable) — 64-bit perceptual difference hash
    per image blob, the image analog of SimHash: near-duplicate images
    (recompressed, slightly edited, re-rendered) land within a few
    Hamming bits, so image-level near-dedup becomes integer Hamming
    machinery instead of pixel comparison.

    REAL decode → 9×8 bilinear → integer-luma gradient signs for the
    formats operators/imagecodec.py decodes (PNG/PPM/PGM/BMP);
    undecodable payloads get a DETERMINISTIC content-hash stand-in
    (sha256-derived signed long, decodable=false) so the pipeline
    never sinks and exact copies of opaque formats still collide.

    SCALE: Arrow-batched mapInPandas over the blob scan — hashes (one
    long per image) leave the scan, blobs never shuffle."""
    import hashlib
    import struct

    from parkour_spark.operators import imagecodec as IC

    def one(payload: bytes) -> tuple[int, bool]:
        if payload is not None and IC.sniff_format(payload) is not None:
            try:
                return IC.dhash64(payload), True
            except Exception:
                pass
        digest = hashlib.sha256(payload if payload is not None else b"").digest()
        return struct.unpack(">q", digest[:8])[0], False

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("dhash", T.LongType(), True),
            T.StructField("decodable", T.BooleanType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, flags = [], []
            for p in pdf[payload_col]:
                h, ok = one(p)
                hashes.append(h)
                flags.append(ok)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "dhash": hashes, "decodable": flags}
            )

    return df.mapInPandas(work, schema=out_schema)


def dhash_near_dup(
    hashes: DataFrame,
    max_hamming: int = 8,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup pairs by banded Hamming
    join — the SimHash block scheme on the 64-bit perceptual hash:
    split into `bands` 16-bit keys; two hashes within Hamming r share
    ≥1 exact band whenever r < bands (pigeonhole — r ≤ bands−1 bit
    flips cannot touch every band); for r ≥ bands the bands are a
    recall-bounded blocking like the text SimHash path. Candidates =
    same (band_idx, band_value) bucket, NEVER all pairs; verify =
    bit_count(xor) — pure integer Columns.

    SCALE: one scan-side band explode (bands rows per image), one
    bucket shuffle with the df-cap analog (`max_bucket` drops
    degenerate buckets — e.g. the all-zero band of flat images), and
    the verify join moves only candidate hash pairs."""
    if bands <= 0 or 64 % bands != 0:
        raise ValueError(
            f"dhash_near_dup: bands must divide 64, got {bands}"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    bexpr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.expr(f"shiftrightunsigned({hash_col}, {i * width})")
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for i in range(bands)
        ]
    )
    exploded = (
        hashes.select(F.col(id_col), F.col(hash_col), F.explode(bexpr).alias("b"))
        .select(
            id_col,
            hash_col,
            F.concat_ws("|", F.col("b.band_idx"), F.col("b.band_val")).alias(
                "band_key"
            ),
        )
    )
    buckets = (
        exploded.groupBy("band_key")
        .agg(
            F.array_sort(
                F.collect_set(F.struct(F.col(id_col).alias("i"), F.col(hash_col).alias("h")))
            ).alias("__ms")
        )
        .where(F.size("__ms") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.where(F.size("__ms") <= max_bucket)
    ms = F.col("__ms")
    pair_expr = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + 2, F.size(ms)),
                lambda y: F.struct(
                    x["i"].alias("id_a"),
                    y["i"].alias("id_b"),
                    x["h"].alias("ha"),
                    y["h"].alias("hb"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b", "p.ha", "p.hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def audio_fingerprint(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_id, afp, decodable) — 64-bit frame-energy fingerprint per
    audio blob (audiocodec.energy_fingerprint64): the audio analog of
    `perceptual_dhash`, and `dhash_near_dup` consumes its output
    unchanged for banded-Hamming audio near-dedup (the band machinery
    is hash-agnostic). REAL RIFF/WAV PCM decode; non-WAV payloads get
    the deterministic sha256 stand-in with decodable=false. Arrow-
    batched over the blob scan — longs leave the scan, blobs never
    shuffle."""
    import hashlib
    import struct

    from parkour_spark.operators import audiocodec as AC

    def one(payload: bytes) -> tuple[int, bool]:
        if payload is not None and AC.sniff_wav(payload):
            try:
                return AC.energy_fingerprint64(payload), True
            except Exception:
                pass
        digest = hashlib.sha256(payload if payload is not None else b"").digest()
        return struct.unpack(">q", digest[:8])[0], False

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
            T.StructField("decodable", T.BooleanType(), False),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps, flags = [], []
            for p in pdf[payload_col]:
                h, ok = one(p)
                fps.append(h)
                flags.append(ok)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "afp": fps, "decodable": flags}
            )

    return df.mapInPandas(work, schema=out_schema)
