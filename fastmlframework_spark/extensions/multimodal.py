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

    PPM/PGM (netpbm), PCM WAV, and non-interlaced 8-bit PNG decode
    for real — stdlib + numpy, no codec library needed (PNG is zlib
    inflate + per-scanline unfiltering; the container needs no codec).
    JPEG/MP4 still require PIL/ffmpeg, absent from this environment,
    and raise at the call site where the codec would be wired in."""

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

    def decode_png(data: bytes) -> dict:
        # Non-interlaced 8-bit gray/RGB(±alpha) PNG: stdlib zlib for
        # the IDAT stream, numpy + the five spec filters (None/Sub/Up/
        # Average/Paeth) for scanline reconstruction.  Palette,
        # sub-byte depths, 16-bit, and Adam7 stay out of scope — they
        # raise with a reason rather than mis-decode.
        import struct
        import zlib

        import numpy as np

        if data[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG signature")
        pos = 8
        header = None
        idat = []
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            ctype = data[pos + 4 : pos + 8]
            chunk = data[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                header = struct.unpack(">IIBBBBB", chunk)
            elif ctype == b"IDAT":
                idat.append(chunk)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if header is None or not idat:
            raise ValueError("PNG missing IHDR/IDAT")
        width, height, bit_depth, color_type, _comp, _filt, interlace = header
        if bit_depth != 8:
            raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
        if interlace != 0:
            raise NotImplementedError("Adam7-interlaced PNG")
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise NotImplementedError(f"PNG color type {color_type}")
        raw = zlib.decompress(b"".join(idat))
        stride = width * channels
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG scanline data size mismatch")
        bpp = channels  # bytes per pixel at depth 8
        out = np.empty((height, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(height):
            off = y * (stride + 1)
            ftype = raw[off]
            cur = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=off + 1
            ).copy()
            if ftype == 0:  # None
                pass
            elif ftype == 1:  # Sub
                for x in range(bpp, stride):
                    cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
            elif ftype == 2:  # Up (uint8 addition wraps mod 256)
                cur += prev
            elif ftype == 3:  # Average
                for x in range(stride):
                    left = int(cur[x - bpp]) if x >= bpp else 0
                    cur[x] = (
                        int(cur[x]) + ((left + int(prev[x])) >> 1)
                    ) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    a = int(cur[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    cur[x] = (int(cur[x]) + pred) & 0xFF
            else:
                raise ValueError(f"PNG filter type {ftype}")
            out[y] = cur
            prev = cur
        return {
            "width": width,
            "height": height,
            "checksum": int(out.astype(np.uint64).sum() % (1 << 40)),
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

    def decode_jpeg(data: bytes) -> dict:
        # Baseline JPEG via the pure-Python decoder (extensions/jpeg.py
        # — stdlib + numpy, golden-tested against hand-built streams);
        # progressive/arithmetic still raise NotImplementedError.
        import numpy as np

        from fastmlframework_spark.extensions.jpeg import decode_baseline

        img = decode_baseline(data)
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "checksum": int(img.astype(np.uint64).sum() % (1 << 40)),
        }

    def real(data: bytes) -> dict:
        if data[:2] in (b"P5", b"P6"):
            return decode_pnm(data)
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return decode_wav(data)
        if data[:2] == b"\xff\xd8":
            return decode_jpeg(data)
        raise NotImplementedError(
            "compressed video decoding (MP4) requires ffmpeg, not "
            "present in this environment; wire it in here "
            "(progressive JPEG likewise raises from extensions/jpeg.py)"
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
