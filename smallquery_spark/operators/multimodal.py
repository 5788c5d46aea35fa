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

The actual pixel/audio decode is STUBBED: codec libraries are not in
this image. ``decode_image_stub`` produces a deterministic fake
(width/height parsed from the synthetic payload header) so the plumbing
— schema, batching, partition behavior — is fully real and tested; swap
the stub body for PIL/ffmpeg in a real deployment.
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
