"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema, partition-friendly
``mapInPandas`` batch shape, Arrow transfer of binary columns, typed
metadata structs.  The codec step itself is STUBBED (no image/audio
libraries in this container): ``decode_image_batches`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder exercises the full pipeline.

At 100 TB the pattern holds: binaries stay columnar (parquet binary +
Arrow), decode happens executor-side in Arrow batches, and metadata-only
queries never touch the payload bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# decoded-feature schema produced by decode_image_batches
IMAGE_FEATURES_DDL = (
    "asset_id bigint, media_type string, n_bytes int, "
    "width int, height int, mean_luma double"
)


def with_media_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decoding: size + magic-byte type.

    Pure JVM expressions — a metadata-only query prunes the payload column
    entirely at the parquet scan."""
    b = F.col(bin_col)
    magic = F.hex(F.substring(b, 1, 4))
    return df.withColumn("n_bytes", F.length(b)).withColumn(
        "media_type",
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("52494646"), "wav")
        .otherwise("unknown"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real codec: pretends the byte length
    encodes dimensions and brightness."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, round((sum(payload[:64]) % 256) / 255.0, 4)


def decode_image_batches(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow-batched binary).

    STUB: real decoding needs PIL/ffmpeg, absent here.  ``fake=True``
    runs a deterministic fake decoder through the identical plumbing
    (schema, batching, partitioning) so the pipeline is fully testable.
    """

    out_cols = [f.split()[0] for f in IMAGE_FEATURES_DDL.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/ffmpeg (not in this container); "
                    "pass fake=True for the deterministic test decoder"
                )
            # vectorized batch shape: one Series.map over the payload column
            # (a real codec drop-in replaces _fake_decode with e.g.
            # PIL-open-per-element or a batch API, never per-row iterrows —
            # the whole batch stays a columnar frame end to end)
            payloads = pdf[bin_col].map(lambda p: bytes(p) if p is not None else b"")
            decoded = payloads.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].to_numpy(),
                    "media_type": (
                        pdf["media_type"].to_numpy()
                        if "media_type" in pdf.columns
                        else "unknown"
                    ),
                    "n_bytes": payloads.map(len).to_numpy(),
                    "width": decoded.map(lambda t: t[0]).to_numpy(),
                    "height": decoded.map(lambda t: t[1]).to_numpy(),
                    "mean_luma": decoded.map(lambda t: t[2]).to_numpy(),
                },
                columns=out_cols,
            )

    cols = [id_col, bin_col] + (["media_type"] if "media_type" in df.columns else [])
    return df.select(*cols).mapInPandas(run, IMAGE_FEATURES_DDL)


def sample_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "asset_id",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame sampling' plumbing: explode a video-ish binary into frame
    offsets (the real version would demux; the offsets/explode shape and
    per-frame rows are what matter for the pipeline)."""
    n = F.length(F.col(bin_col))
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.greatest((n / every_n_bytes).cast("int") - 1, F.lit(0)), F.lit(max_frames - 1)
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(idx).alias("frame_no", "_i"),
    ).select(
        id_col, "frame_no", (F.col("frame_no") * every_n_bytes).alias("byte_offset")
    )
