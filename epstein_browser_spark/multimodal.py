"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

Decode is REAL for uncompressed formats (``decode_image``: binary PPM,
pure numpy — value-oracled end to end via q81) and degrades per-row to a
deterministic stub for compressed formats, which need codec libraries
this container lacks. Everything Spark-side is real and tested either
way: schema, partitioning, UDF signature, Arrow batch shape, and the
metadata/feature columns. Reference analog: the repo treats page images as
opaque files keyed by path with typed metadata rows
(/root/reference/index_images.py:117-133) and re-encodes them out-of-band
(/root/reference/app.py:808-835 — an explicit non-goal, SURVEY.md §7.5).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "mime string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, payload_hash string, "
    "feature array<float>, decode_status string"
)

FEATURE_DIM = 8


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for uncompressed formats, pure numpy — no image
    libraries needed. Currently: binary PPM (P6, the netpbm raw-RGB
    format). Returns an (h, w, 3) uint8 array. Compressed formats
    (JPEG/PNG) still require a codec library absent from this container
    and raise NotImplementedError — the caller routes those rows to the
    stubbed feature path, so the pipeline degrades per-row, not
    per-job."""
    if payload[:2] == b"P6":
        # header = magic, whitespace-separated width/height/maxval with
        # optional '#' comment lines, ONE whitespace byte, then raw RGB
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise NotImplementedError("16-bit PPM not supported")
        n = w * h * 3
        pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
        return pix.reshape(h, w, 3)
    raise NotImplementedError(
        "compressed image decode requires PIL/libvips, "
        "not present in this environment"
    )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, c) array via pure numpy
    index arithmetic: out[i, j] = src[floor(i·h/out_h), floor(j·w/out_w)].
    The pixel-level half of the q50 resize PLAN — real for any decoded
    image, vectorized (two take operations, no Python pixel loop)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def _fake_features(payload: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in feature extractor: FEATURE_DIM moments of the
    raw bytes. Vectorized over the batch; byte-level stats via frombuffer."""
    feats = []
    for b in payload:
        if b is None or len(b) == 0:
            feats.append([0.0] * FEATURE_DIM)
            continue
        arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float64)
        chunks = np.array_split(arr, FEATURE_DIM)
        feats.append([float(np.mean(c)) if len(c) else 0.0 for c in chunks])
    return pd.DataFrame({"feature": pd.Series(feats, dtype=object)})


def media_features_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas over MEDIA_SCHEMA → FEATURE_SCHEMA.

    Real plumbing: binary payloads cross the JVM↔Python boundary as Arrow
    binary arrays; hashing and sizing are vectorized; the decode itself is
    the stubbed deterministic fake (decode_status='stubbed')."""
    import hashlib

    for pdf in batches:
        if not len(pdf):
            continue
        payload = pdf["payload"]
        n_bytes = payload.map(lambda b: 0 if b is None else len(b)).astype("int64")
        payload_hash = payload.map(
            lambda b: hashlib.md5(bytes(b) if b is not None else b"").hexdigest()
        )
        feats = _fake_features(payload)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "payload_hash": payload_hash,
                "feature": feats["feature"].map(
                    lambda xs: [np.float32(x) for x in xs]
                ),
                "decode_status": "stubbed",
            }
        )


def extract_media_features(media_df):
    """media table (MEDIA_SCHEMA) → features table (FEATURE_SCHEMA)."""
    return media_df.mapInPandas(media_features_map_in_pandas, schema=FEATURE_SCHEMA)


DECODE_SCHEMA = (
    "media_id bigint, width int, height int, "
    "r_mean double, g_mean double, b_mean double, decode_status string"
)


def decoded_features_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas: REAL decode (decode_image — PPM today, any codec a
    fatter worker image provides) → per-channel pixel means. Rows whose
    format the decoder can't handle degrade to decode_status='stubbed'
    with null features — per-row, so one JPEG in a PPM corpus doesn't
    fail the job. The loop is per-IMAGE (each payload is one opaque
    object); the arithmetic inside is vectorized numpy per pixel."""
    for pdf in batches:
        if not len(pdf):
            continue
        rows = []
        for mid, b in zip(pdf["media_id"], pdf["payload"]):
            try:
                img = decode_image(bytes(b))
                h, w = img.shape[:2]
                m = img.reshape(-1, 3).astype(np.float64).mean(axis=0)
                rows.append((int(mid), w, h,
                             round(float(m[0]), 6), round(float(m[1]), 6),
                             round(float(m[2]), 6), "decoded"))
            except (NotImplementedError, ValueError, IndexError):
                rows.append((int(mid), None, None, None, None, None,
                             "stubbed"))
        yield pd.DataFrame(
            rows,
            columns=["media_id", "width", "height", "r_mean", "g_mean",
                     "b_mean", "decode_status"],
        )


def extract_decoded_features(media_df):
    """media table → decoded per-channel means (DECODE_SCHEMA)."""
    return media_df.mapInPandas(decoded_features_map_in_pandas,
                                schema=DECODE_SCHEMA)


FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, ts_ms int, frame_hash string, "
    "decode_status string"
)


def frames_map_in_pandas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1→N frame sampling through Arrow: each video row expands to
    ceil-capped ``max(1, duration_ms // 1000)`` frame records at 1 fps.
    The decode itself is stubbed (no video libs in this container) — the
    frame identity is a deterministic hash of (payload, frame_idx) — but
    the Spark-side plumbing is real: binary payloads in, row-expansion
    out, vectorized with numpy repeat (no per-row Python loop over
    frames)."""
    import hashlib

    for pdf in batches:
        pdf = pdf[pdf["kind"] == "video"].reset_index(drop=True)
        if not len(pdf):
            continue
        n_frames = np.maximum(
            1, pdf["duration_ms"].to_numpy(dtype=np.int64) // 1000
        )
        row_of = np.repeat(np.arange(len(pdf)), n_frames)
        # frame_idx = position within each row's run
        starts = np.cumsum(n_frames) - n_frames
        frame_idx = np.arange(len(row_of)) - starts[row_of]
        payloads = pdf["payload"].to_numpy(dtype=object)
        hashes = [
            hashlib.md5(
                bytes(payloads[r]) + b":" + str(i).encode()
            ).hexdigest()
            for r, i in zip(row_of, frame_idx)
        ]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].to_numpy()[row_of],
                "frame_idx": frame_idx.astype("int32"),
                "ts_ms": (frame_idx * 1000).astype("int32"),
                "frame_hash": hashes,
                "decode_status": "stubbed",
            }
        )


def sample_frames(media_df):
    """video rows of a media table → frame records (FRAME_SCHEMA)."""
    return media_df.mapInPandas(frames_map_in_pandas, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "media_id bigint, src_w int, src_h int, out_w int, out_h int, "
    "scale double, resize_status string"
)


def resize_map_in_pandas(target: int = 32):
    """Aspect-fit resize planning for image rows: scale = min(t/w, t/h)
    capped at 1.0 (never upscale), output dims = max(1, floor(dim*scale)).
    The pixel resample itself is stubbed (no image libs here) — the
    geometry math, vectorized numpy over the Arrow batch, is the real
    plumbing a decode-capable worker would share."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"].reset_index(drop=True)
            if not len(pdf):
                continue
            w = pdf["width"].to_numpy(dtype=np.float64)
            h = pdf["height"].to_numpy(dtype=np.float64)
            scale = np.minimum(1.0, np.minimum(target / w, target / h))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "src_w": pdf["width"].astype("int32"),
                    "src_h": pdf["height"].astype("int32"),
                    "out_w": np.maximum(1, np.floor(w * scale)).astype("int32"),
                    "out_h": np.maximum(1, np.floor(h * scale)).astype("int32"),
                    "scale": scale,
                    "resize_status": "stubbed",
                }
            )

    return fn


def resize_media(media_df, target: int = 32):
    """image rows of a media table → resize plan records (RESIZE_SCHEMA)."""
    return media_df.mapInPandas(resize_map_in_pandas(target),
                                schema=RESIZE_SCHEMA)


def synth_media_spark(spark, n: int = 100):
    """Deterministic binary test fixtures built with column expressions:
    payload = md5 hex of the id, cast to binary."""
    from pyspark.sql import functions as F

    df = spark.range(n)
    return df.select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.repeat(F.md5(F.col("id").cast("string")), 4), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        # varied dims so the resize geometry is non-trivial
        (F.lit(32) * (F.pmod("id", F.lit(4)) + 1)).cast("int").alias("width"),
        (F.lit(24) * (F.pmod("id", F.lit(3)) + 1)).cast("int").alias("height"),
        # variable durations so frame sampling expands to 1..2 frames
        (F.lit(500) * (F.pmod("id", F.lit(5)) + 1)).cast("int").alias("duration_ms"),
    )


def synth_ppm_media_spark(spark, n: int = 200, w: int = 4, h: int = 4):
    """Deterministic REAL-format image fixtures, pure column expressions:
    each payload is a valid binary PPM (P6) — header + w·h·3 raw RGB
    bytes drawn from an md5 chain (``unhex(md5(id || ':' || block))``,
    16 bytes per block). decode_image parses these for real, and the
    same md5-hex byte arithmetic restates in DuckDB, so the decoded
    pixel statistics are fully value-oracle-able (q81). Keep w·h a
    power of two: the per-channel mean divides by w·h exactly, making
    numpy's mean and SQL's avg bit-identical."""
    from pyspark.sql import functions as F

    npix = w * h * 3
    n_blocks = (npix + 15) // 16
    header = f"P6\n{w} {h}\n255\n"
    blocks = [
        F.unhex(F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{b}"))))
        for b in range(n_blocks)
    ]
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(F.encode(F.lit(header), "utf-8"), *blocks).alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.lit(w).cast("int").alias("width"),
        F.lit(h).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
