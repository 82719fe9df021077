"""Multimodal column plumbing (SURVEY.md §7.5): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
Pandas UDFs over mapInPandas.

The Spark-side contract is fully real and tested — schema convention,
partition-size control, UDF signatures, batch shapes.  Codecs:
``decode='real'`` genuinely decodes the containers that need no codec
library — netpbm images (PPM P6 / PGM P5, parsed with numpy) and PCM
WAV audio (stdlib ``wave``); compressed formats (PNG/JPEG/MP4) require
PIL/ffmpeg, absent from this container, and raise NotImplementedError
at the exact call site where they would be wired in.  ``decode='fake'``
remains the deterministic stand-in used by the oracle-checked query.

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


def _make_real_decode():
    """Factory returning a self-contained REAL decoder closure
    (by-value pickling, same cloudpickle caveat as the fake factory).

    PPM/PGM (netpbm) and PCM WAV decode for real — stdlib + numpy,
    no codec library needed.  Compressed containers (PNG/JPEG/MP4)
    still require PIL/ffmpeg, absent from this environment, and raise
    at the call site where the codec would be wired in."""

    def decode_pnm(data: bytes) -> dict:
        # Binary netpbm: ASCII header (magic, width, height, maxval,
        # '#' comments allowed) followed by raw samples.
        import numpy as np

        fields: list[int] = []
        i = 2  # past magic
        while len(fields) < 3:
            if i >= len(data):
                raise ValueError("truncated PNM header")
            c = data[i : i + 1]
            if c == b"#":  # comment to end of line
                i = data.index(b"\n", i) + 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(data) and not data[j : j + 1].isspace():
                    j += 1
                fields.append(int(data[i:j]))
                i = j
        width, height, maxval = fields
        i += 1  # single whitespace after maxval
        channels = 3 if data[:2] == b"P6" else 1
        depth = 1 if maxval < 256 else 2
        n = width * height * channels * depth
        pixels = np.frombuffer(data[i : i + n], dtype=np.uint8)
        if pixels.size != n:
            raise ValueError("truncated PNM pixel data")
        return {
            "width": width,
            "height": height,
            "checksum": int(pixels.astype(np.uint64).sum() % (1 << 40)),
        }

    def decode_wav(data: bytes) -> dict:
        # PCM WAV via stdlib wave: width = frames, height = channels.
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(data), "rb") as w:
            n_frames = w.getnframes()
            n_channels = w.getnchannels()
            raw = w.readframes(n_frames)
        samples = np.frombuffer(raw, dtype=np.uint8)
        return {
            "width": n_frames,
            "height": n_channels,
            "checksum": int(samples.astype(np.uint64).sum() % (1 << 40)),
        }

    def real(data: bytes) -> dict:
        if data[:2] in (b"P5", b"P6"):
            return decode_pnm(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return decode_wav(data)
        raise NotImplementedError(
            "compressed media decoding (PNG/JPEG/MP4) requires codec "
            "libraries (PIL/ffmpeg) not present in this environment; "
            "wire them in here"
        )

    return real


# Direct-call convenience (tests, driver-side use); the UDF captures a
# fresh factory instance instead — see _make_fake_decode.
real_decode = _make_real_decode()


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
        decoder = _make_real_decode()  # by-value pickling (see factory)
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
