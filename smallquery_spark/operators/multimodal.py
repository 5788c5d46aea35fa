"""Multimodal column conventions (SURVEY.md §2 C5).

Convention: a modality column is an opaque ``binary`` payload plus a
typed metadata struct (mime, width/height or duration, source URI).
Large blobs stay OUT of row storage — the payload column may hold the
bytes (small assets) or be null with only ``uri`` set (large assets,
fetched lazily inside the decode UDF batch-by-batch).

The decode/feature-extract steps run as ``mapInPandas`` — Arrow batches
in, Arrow batches out, one Python worker per partition, which is the
correct shape at 100 TB (no driver involvement, payload never shuffles
unless a later op groups on it).

Image decode is REAL in every environment: PIL when importable, else
the stdlib PNG codec (png_codec.py — zlib inflate + per-scanline
de-filter; no third-party dependency), selected by ``codec_tier()``.
Audio/video decode remains STUBBED (no stdlib codec exists):
``decode_image_stub``/``audio_features_stub`` produce deterministic
fakes so the plumbing — schema, batching, partition behavior — is fully
real and tested; swap the stub body for ffmpeg/librosa in a real
deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "doc_id long, mime string, uri string, payload binary, "
    "width int, height int"
)


def have_pil() -> bool:
    """Capability probe: True when a real image codec (PIL) is importable.
    Mirrors the b67 protobuf gate (streaming_queries.py): the SAME
    operator runs the real codec path in richer images and the
    deterministic stub here, both oracle-checked."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def codec_tier() -> str:
    """Decode-capability tier: ``"pil"`` (any format, if PIL importable)
    → ``"png"`` (stdlib zlib/struct codec, always available — see
    png_codec.py) → never "stub" for images anymore. The stub tier
    remains only for formats with no stdlib decode (audio/video)."""
    return "pil" if have_pil() else "png"


def attach_png_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """stdlib-codec twin of attach_real_images: payload is a REAL PNG
    (solid gray, fill doc_id % 256, (id%64+8) x (id%48+6)) encoded by
    png_codec.png_encode_gray in mapInPandas — same pixel contract as
    the PIL path, so both share one closed-form oracle."""
    from smallquery_spark.operators.png_codec import png_encode_gray

    out_schema = IMAGE_SCHEMA

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                doc_id = int(doc_id)
                w, h = doc_id % 64 + 8, doc_id % 48 + 6
                payload = png_encode_gray(w, h, bytes([doc_id % 256]) * (w * h))
                rows.append(
                    (doc_id, "image/png", f"mem://img/{doc_id}", payload, w, h)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "uri", "payload", "width", "height"],
            )

    return df.select(F.col(id_col)).mapInPandas(encode, schema=out_schema)


def decode_image_png(df: DataFrame) -> DataFrame:
    """stdlib-codec twin of decode_image_real: an ACTUAL pixel decode
    (zlib inflate + de-filter) of the payload column, same output schema
    (doc_id, dec_width, dec_height, n_bytes=pixel count, mean_pixel).
    """
    from smallquery_spark.operators.png_codec import png_decode

    out_schema = (
        "doc_id long, dec_width int, dec_height int, n_bytes long, mean_pixel double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, raster = png_decode(bytes(payload))
                n = w * h * ch
                rows.append((doc_id, w, h, n, sum(raster) / n))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "dec_width",
                    "dec_height",
                    "n_bytes",
                    "mean_pixel",
                ],
            )

    return df.mapInPandas(decode, schema=out_schema)


def attach_real_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """PIL path of attach_fake_images: payload is a REAL PNG — a solid
    gray image, fill value doc_id % 256, sized like the fake path
    ((id%64+8) x (id%48+6)) — encoded batch-by-batch in mapInPandas.
    Solid fill makes the decoded mean pixel exactly the fill value, so
    the oracle stays a closed-form SQL expression."""
    from PIL import Image
    import io

    out_schema = IMAGE_SCHEMA

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                doc_id = int(r[id_col])
                w, h = doc_id % 64 + 8, doc_id % 48 + 6
                img = Image.new("L", (w, h), color=doc_id % 256)
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                rows.append(
                    (
                        doc_id,
                        "image/png",
                        f"mem://img/{doc_id}",
                        buf.getvalue(),
                        w,
                        h,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "uri", "payload", "width", "height"],
            )

    return df.select(F.col(id_col)).mapInPandas(encode, schema=out_schema)


def decode_image_real(df: DataFrame) -> DataFrame:
    """PIL path of decode_image_stub: real decode via PIL.Image.open, same
    output schema (doc_id, dec_width, dec_height, n_bytes, mean_pixel)
    — n_bytes is the PIXEL count here (w*h), mean_pixel the true mean
    of decoded pixel values."""
    from PIL import Image
    import io

    import numpy as np

    out_schema = (
        "doc_id long, dec_width int, dec_height int, n_bytes long, mean_pixel double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = Image.open(io.BytesIO(bytes(r["payload"])))
                arr = np.asarray(img, dtype=np.int64)
                rows.append(
                    (
                        r["doc_id"],
                        img.width,
                        img.height,
                        int(arr.size),
                        float(arr.sum()) / arr.size,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "dec_width",
                    "dec_height",
                    "n_bytes",
                    "mean_pixel",
                ],
            )

    return df.mapInPandas(decode, schema=out_schema)


def attach_fake_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically synthesize an image-ish binary column: a header
    ``IMG:<w>x<h>:`` followed by the doc text bytes. Stands in for real
    stored assets; everything downstream treats it as opaque."""
    w = (F.col(id_col) % 64 + 8).cast("int")
    h = (F.col(id_col) % 48 + 6).cast("int")
    header = F.concat(
        F.lit("IMG:"), w.cast("string"), F.lit("x"), h.cast("string"), F.lit(":")
    )
    return df.select(
        F.col(id_col),
        F.lit("image/fake").alias("mime"),
        F.concat(F.lit("mem://img/"), F.col(id_col).cast("string")).alias("uri"),
        F.encode(F.concat(header, F.col("text")), "utf-8").alias("payload"),
        w.alias("width"),
        h.alias("height"),
    )


def decode_image_stub(df: DataFrame) -> DataFrame:
    """'Decode' payloads via mapInPandas: parse the fake header, emit
    (doc_id, width, height, n_bytes, mean_pixel). Real decoders (PIL,
    torchvision) drop into the same iterator body unchanged.
    """

    out_schema = (
        "doc_id long, dec_width int, dec_height int, n_bytes long, mean_pixel double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r["payload"])
                try:
                    head, _, _body = raw.split(b":", 2)
                    dims = raw.split(b":", 2)[1]
                    w, h = (int(x) for x in dims.split(b"x"))
                    if head != b"IMG":
                        raise ValueError
                except (ValueError, IndexError):
                    # Real codec path would go here; unknown payloads are
                    # surfaced, not silently dropped.
                    w, h = -1, -1
                # deterministic fake "mean pixel": average byte value.
                mean_px = sum(raw) / len(raw) if raw else 0.0
                rows.append((r["doc_id"], w, h, len(raw), mean_px))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "dec_width", "dec_height", "n_bytes", "mean_pixel"],
            )

    return df.mapInPandas(decode, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plumbing: one row per sampled frame
    index. Frame *content* decode is stubbed (no codecs in image); the
    explode/partition shape is the real thing."""
    return df.select(
        "doc_id",
        "uri",
        F.explode(
            F.sequence(F.lit(0), (F.col("width") * 0 + 30) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_image_stub(
    df: DataFrame, max_w: int = 32, max_h: int = 24
) -> DataFrame:
    """'Resize' via mapInPandas: clamp dims to (max_w, max_h) keeping the
    fake header consistent, re-emit the payload with the new header. The
    byte-slicing is the real Arrow-batch plumbing; a real thumbnailer
    (PIL.Image.thumbnail) drops into the same loop."""
    out_schema = (
        "doc_id long, out_width int, out_height int, out_bytes long, payload binary"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w = min(int(r["width"]), max_w)
                h = min(int(r["height"]), max_h)
                body = bytes(r["payload"]).split(b":", 2)[-1]
                # proportional byte budget stands in for pixel resampling
                keep = max(1, (len(body) * w * h) // max(r["width"] * r["height"], 1))
                payload = b"IMG:%dx%d:" % (w, h) + body[:keep]
                rows.append((r["doc_id"], w, h, len(payload), payload))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "out_width", "out_height", "out_bytes", "payload"],
            )

    return df.mapInPandas(resize, schema=out_schema)


def attach_fake_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed audio-column convention: sample rate + sample count metadata,
    payload deferred (uri-only) — the 100 TB posture for big media."""
    return df.select(
        F.col(id_col),
        F.lit("audio/fake").alias("mime"),
        F.concat(F.lit("mem://aud/"), F.col(id_col).cast("string")).alias("uri"),
        (8000 + (F.col(id_col) % 3) * 4000).cast("int").alias("sample_rate"),
        (500 + F.col(id_col) % 500).cast("int").alias("n_samples"),
    )


def audio_features_stub(df: DataFrame) -> DataFrame:
    """Feature extraction via mapInPandas with VECTORIZED numpy per row
    batch: synthesize the deterministic fake waveform (stands in for the
    codec read), compute integer-exact sum-of-squares and RMS. Real
    librosa/torchaudio feature code drops into the same body."""
    import numpy as np

    out_schema = "doc_id long, sample_rate int, n_samples int, sum_sq long, rms double"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                n = int(r["n_samples"])
                i = np.arange(n, dtype=np.int64)
                samples = (int(r["doc_id"]) * 7 + i * 13) % 256
                ss = int((samples * samples).sum())
                rms = float(np.sqrt(ss / n))
                rows.append((r["doc_id"], r["sample_rate"], n, ss, rms))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "sum_sq", "rms"],
            )

    return df.mapInPandas(feats, schema=out_schema)
