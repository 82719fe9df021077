"""Multimodal column plumbing (SURVEY.md §7.5): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
Pandas UDFs over mapInPandas.

The Spark-side contract is fully real and tested — schema convention,
partition-size control, UDF signatures, batch shapes.  The actual
codec calls (PIL/ffmpeg/torchaudio) are STUBBED: those libraries are
not in this container, so ``decode=`` defaults to a clearly-marked
deterministic fake and ``decode='real'`` raises NotImplementedError
at the call site where the codec would run.

Scale design: media bytes never pass through the driver; mapInPandas
streams Arrow batches executor-side, and ``target_batch_rows`` bounds
memory per batch (media rows are fat — size batches by bytes, not
rows, on a real cluster via maxRecordsPerBatch)."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema convention for a media column group: <name>_bytes binary,
# <name>_meta struct<format string, width int, height int, ...>.
MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_width", LongType()),
        StructField("feat_height", LongType()),
        StructField("feat_checksum", LongType()),
    ]
)


def _make_fake_decode():
    """Factory returning a FRESH closure per call.

    The decoder crosses the driver→executor boundary inside the
    mapInPandas closure; cloudpickle serializes module-level functions
    BY REFERENCE, which breaks when executor Python workers cannot
    import this package (driver launched from another cwd with only a
    driver-side sys.path insert).  A closure instance that is not a
    module attribute is pickled BY VALUE and always deserializes."""

    def fake_decode(data: bytes) -> dict:
        # Deterministic stand-in for a codec: stable pseudo
        # width/height/checksum from the bytes.  Replace with a real
        # decoder (PIL.Image.open etc.) when codec libraries exist.
        checksum = 0
        for b in data[:4096]:
            checksum = (checksum * 131 + b) % (1 << 40)
        return {
            "width": 16 + checksum % 1024,
            "height": 16 + (checksum >> 10) % 1024,
            "checksum": checksum,
        }

    return fake_decode


# Direct-call convenience (tests, driver-side use); NOT what the UDF
# captures — see _make_fake_decode.
fake_decode = _make_fake_decode()


def real_decode(data: bytes) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "real media decoding requires codec libraries (PIL/ffmpeg) not "
        "present in this environment; wire them in here"
    )


def extract_media_features(
    df: DataFrame,
    key_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    format_col: str = "media_format",
    decode: str | Callable[[bytes], dict] = "fake",
    target_batch_rows: int = 256,
) -> DataFrame:
    """Decode/feature-extract a binary media column via mapInPandas →
    MEDIA_FEATURE_SCHEMA rows.  The decoder runs per Arrow batch on
    executors; bytes never collect to the driver."""
    import pandas as pd

    if decode == "fake":
        decoder = _make_fake_decode()  # by-value pickling (see factory)
    elif decode == "real":

        def decoder(data: bytes) -> dict:
            raise NotImplementedError(
                "real media decoding requires codec libraries "
                "(PIL/ffmpeg) not present in this environment"
            )

    else:
        decoder = decode

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            for start in range(0, len(pdf), target_batch_rows):
                chunk = pdf.iloc[start : start + target_batch_rows]
                feats = [decoder(b) for b in chunk[bytes_col]]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk[key_col].values,
                        "media_format": chunk[format_col].values,
                        "n_bytes": [len(b) for b in chunk[bytes_col]],
                        "feat_width": [f["width"] for f in feats],
                        "feat_height": [f["height"] for f in feats],
                        "feat_checksum": [f["checksum"] for f in feats],
                    }
                )

    cols = [key_col, bytes_col, format_col]
    return df.select(*cols).mapInPandas(batches, MEDIA_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    key_col: str = "doc_id",
    n_frames_col: str = "n_frames",
    every: int = 30,
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (explode of a sequence — pure expression; the frame
    DECODE would then join this plan against the binary column)."""
    return df.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    )
