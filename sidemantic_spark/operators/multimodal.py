"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` stages so the heavy per-item work is vectorized and
embarrassingly parallel (each batch is independent; no shuffle).

The codec layer is runtime-gated: when Pillow is importable the
``fake=False`` paths run a real image decode (channel-mean block
features) and a real resize (LANCZOS thumbnail + PNG re-encode); when
it is absent they raise NotImplementedError and ``fake=True`` runs a
deterministic stand-in with the identical batching/schema so the
Spark-side plumbing (schema, batching, partitioning) stays fully
testable either way.
"""

from __future__ import annotations

import importlib.util

from collections.abc import Iterator

_HAS_PIL = importlib.util.find_spec("PIL") is not None

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("codec", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("feature_dim", LongType(), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used in tests: wraps a text table into the media schema
    (payload = utf8 bytes) so the decode pipeline has real input."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: rolling-hash the bytes
    into ``dim`` stable floats in [0, 1)."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    h = 1469598103934665603
    for i, byte in enumerate(payload):
        h = ((h ^ byte) * 1099511628211) % (1 << 64)
        acc[i % dim] = (acc[i % dim] + h) % (1 << 32)
    return [a / float(1 << 32) for a in acc]


def _band_means(px: list, w: int, h: int, dim: int) -> list[float]:
    """``dim`` horizontal-band mean intensities in [0, 1) over a
    row-major grayscale pixel list — shared by both real decoders so
    Pillow and the pure-Python fallback emit identical features."""
    if not px:
        return [0.0] * dim
    bands: list[list[int]] = [[] for _ in range(dim)]
    for row in range(h):
        bands[row * dim // max(h, 1)].extend(px[row * w:(row + 1) * w])
    return [
        (sum(b) / len(b)) / 256.0 if b else 0.0
        for b in bands
    ]


def _pil_decode(payload: bytes, dim: int) -> list[float] | None:
    """Real image features via Pillow: grayscale the image, split it
    into ``dim`` horizontal bands, mean intensity per band in [0, 1).
    Returns None when the bytes don't decode as an image."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as img:
            g = img.convert("L")
            w, h = g.size
            px = list(g.getdata())
    except Exception:
        return None
    return _band_means(px, w, h, dim)


def _pure_decode(payload: bytes, dim: int) -> list[float] | None:
    """Pillow-free real decode: the stdlib-only PNG decoder
    (:mod:`sidemantic_spark.operators.png`) feeding the same band-mean
    featurizer.  Pillow's grayscale formula is replicated exactly, so
    on a shared PNG input both paths return identical features."""
    from sidemantic_spark.operators.png import decode_png_gray

    decoded = decode_png_gray(payload)
    if decoded is None:
        return None
    w, h, px = decoded
    return _band_means(px, w, h, dim)


def decode_features(
    df: DataFrame,
    dim: int = 16,
    fake: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table.

    ``fake=False`` is the production path: Pillow when importable on
    the executor (any format Pillow reads), else the stdlib-only PNG
    decoder (``operators/png.py`` — same grayscale formula, identical
    features on shared PNG inputs); undecodable payloads yield
    decode_ok='error'.  ``fake=True`` runs the deterministic stand-in
    with the identical batching/schema so plans and tests are faithful
    without codecs.
    """

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        real = _pil_decode if _HAS_PIL else _pure_decode

        for pdf in batches:
            if fake:
                feats = [
                    _fake_decode(p, dim) if p is not None else None
                    for p in pdf["payload"]
                ]
                status = [
                    "ok" if f is not None else "null_payload" for f in feats
                ]
            else:
                feats, status = [], []
                for p in pdf["payload"]:
                    if p is None:
                        feats.append(None)
                        status.append("null_payload")
                        continue
                    f = real(p, dim)
                    feats.append(f)
                    status.append("ok" if f is not None else "error")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feature_dim": [dim if f is not None else 0 for f in feats],
                    "decode_ok": status,
                }
            )

    # mapInPandas is opaque to Catalyst's column pruning: without this
    # projection every MEDIA_SCHEMA column (type/codec strings, the
    # width/height/duration metadata) crosses the Arrow boundary into
    # Python even though the kernel only reads (media_id, payload).
    return df.select("media_id", "payload").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


def resize_images(
    df: DataFrame,
    max_side: int = 256,
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched image resize over the media table (stubbed codec).

    Output keeps MEDIA_SCHEMA: width/height are rescaled to fit
    ``max_side`` preserving aspect ratio; the payload is re-emitted by
    the (stub) codec. A real implementation must decode + re-encode the
    payload bytes, which is why this is a ``mapInPandas`` stage and not
    a JVM column expression — the metadata arithmetic alone would not
    need Python, the pixel work does. ``fake=True`` passes payload
    bytes through unchanged and fills missing dims with ``max_side``
    so the batching/schema path is fully testable.  ``fake=False``
    requires Pillow: LANCZOS thumbnail + PNG re-encode per payload,
    with real decoded dimensions written back.
    """
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "real image resize requires Pillow, which is not importable in "
            "this environment; run with fake=True for the plumbing path"
        )

    def resize_batches(batches: Iterator) -> Iterator:
        for pdf in batches:
            if fake:
                w = pdf["width"].fillna(max_side).astype("int64")
                h = pdf["height"].fillna(max_side).astype("int64")
                longest = w.combine(h, max).clip(lower=1)
                scale = (max_side / longest).clip(upper=1.0)
                out = pdf.copy()
                out["width"] = (w * scale).astype("int64").clip(lower=1)
                out["height"] = (h * scale).astype("int64").clip(lower=1)
                # stub codec: payload unchanged; a real codec re-encodes
                yield out
                continue
            import io

            from PIL import Image

            out = pdf.copy()
            new_payloads, new_w, new_h, new_codec = [], [], [], []
            for p, cw, ch, cc in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["codec"]
            ):
                if p is None:
                    new_payloads.append(None)
                    new_w.append(cw)
                    new_h.append(ch)
                    new_codec.append(cc)
                    continue
                try:
                    with Image.open(io.BytesIO(p)) as img:
                        img.thumbnail(
                            (max_side, max_side), Image.Resampling.LANCZOS
                        )
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        new_payloads.append(buf.getvalue())
                        new_w.append(img.size[0])
                        new_h.append(img.size[1])
                        new_codec.append("png")
                except Exception:
                    # undecodable payload: pass through untouched
                    new_payloads.append(p)
                    new_w.append(cw)
                    new_h.append(ch)
                    new_codec.append(cc)
            out["payload"] = new_payloads
            out["width"] = new_w
            out["height"] = new_h
            out["codec"] = new_codec
            yield out

    return df.mapInPandas(resize_batches, schema=MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (JVM-side sequence; the decode of each frame would be a
    mapInPandas stage like :func:`decode_features`)."""
    return df.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
