"""Image-side descriptors (SURVEY.md §2.4 A8 image analogs, §2.5 W1, §2.7 C8).

The ProFET "sequence" for the image payload is the pixel-statistic
stream: per-row luminance means form a 1-D numeric sequence that gets the
same windowed-profile treatment as the caption's property profile
(SURVEY.md §1.2). Decode runs in ``mapInPandas`` (iterator-of-batches,
U3) so per-batch init is amortized and Arrow batch size bounds memory
when multi-KB ``bytes`` values flow through (SURVEY.md §4.3).

phash ops (C8) stay JVM-side: nibble extraction and Hamming distance to
the previous snapshot are pure built-in bit expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from profet_spark.imaging import average_hash, decode, luminance

IMG_FEATURES = [
    ("lum_mean", T.DoubleType()),
    ("lum_var", T.DoubleType()),
    ("lum_min", T.DoubleType()),
    ("lum_max", T.DoubleType()),
    ("edge_density", T.DoubleType()),
    ("rowprof_max", T.DoubleType()),
    ("rowprof_min", T.DoubleType()),
    ("rowprof_mean", T.DoubleType()),
    ("phash_check", T.LongType()),
    ("decode_ok", T.BooleanType()),
]

_PROFILE_WINDOW = 5


def compute_image_stats(data: bytes, fmt: str) -> dict:
    """Pixel-stat vector for one image. The oracle path for tests.

    Only the specific codec failure modes a malformed/unsupported payload
    can produce are mapped to decode_ok=False; a programming bug in the
    decoder raises instead of silently yielding zero-features."""
    import struct
    import zlib
    try:
        if data is None:
            # a NULL bytes cell is a missing payload, not a programming
            # bug: map it to the decode-failure row like any corruption
            # (bytes(None) would raise an uncaught TypeError and kill the
            # whole stage)
            raise ValueError("NULL image bytes")
        arr = decode(bytes(data), fmt)
    except (NotImplementedError, ValueError, zlib.error, struct.error):
        return {n: (False if n == "decode_ok" else (0 if n == "phash_check" else 0.0))
                for n, _ in IMG_FEATURES}
    lum = luminance(arr)
    # horizontal gradient magnitude as edge density
    edges = np.abs(np.diff(lum, axis=1)).mean() if lum.shape[1] > 1 else 0.0
    row_means = lum.mean(axis=1)
    w = _PROFILE_WINDOW
    if len(row_means) >= w:
        p = len(row_means) - w + 1
        prof = np.zeros(p)
        for k in range(w):  # sequential summation convention (see text UDF)
            prof += row_means[k : k + p]
        prof /= w
        pmax, pmin, pmean = float(prof.max()), float(prof.min()), float(prof.mean())
    else:
        pmax = pmin = pmean = 0.0
    return {
        "lum_mean": float(lum.mean()),
        "lum_var": float(lum.var()),
        "lum_min": float(lum.min()),
        "lum_max": float(lum.max()),
        "edge_density": float(edges),
        "rowprof_max": pmax,
        "rowprof_min": pmin,
        "rowprof_mean": pmean,
        "phash_check": average_hash(arr),
        "decode_ok": True,
    }


def add_image_features(
    df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt", drop_bytes: bool = True
) -> DataFrame:
    """Decode + pixel stats through mapInPandas. ``drop_bytes`` prunes the
    binary column from the output so downstream stages never shuffle it."""
    in_fields = [f for f in df.schema.fields if not (drop_bytes and f.name == bytes_col)]
    schema = T.StructType(in_fields + [T.StructField(n, t, True) for n, t in IMG_FEATURES])
    keep = [f.name for f in in_fields]
    feat_names = [n for n, _ in IMG_FEATURES]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            stats = [compute_image_stats(b, f) for b, f in zip(pdf[bytes_col], pdf[fmt_col])]
            sdf = pd.DataFrame(stats, index=pdf.index)
            yield pd.concat([pdf[keep], sdf[feat_names]], axis=1)

    return df.mapInPandas(kernel, schema=schema)


def phash_nibbles(df: DataFrame, phash_col: str = "phash", out_col: str = "nibbles") -> DataFrame:
    """C8: 16-nibble stream of the 64-bit phash, JVM-side bit ops only."""
    nibs = [
        F.shiftrightunsigned(F.col(phash_col), 4 * i).bitwiseAND(F.lit(15)).cast("int")
        for i in range(16)
    ]
    return df.withColumn(out_col, F.array(*nibs))


def phash_hamming_to_prev(
    df: DataFrame, entity: str = "image_id", ts: str = "ts", phash_col: str = "phash",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """C8+W3: Hamming distance of phash to the previous snapshot —
    bit_count(xor) over a lag window, all built-in."""
    w = Window.partitionBy(entity).orderBy(ts, *(tiebreak or []))
    prev = F.lag(phash_col).over(w)
    return df.withColumn(
        "phash_hamming_prev",
        F.when(prev.isNull(), F.lit(None)).otherwise(
            F.bit_count(F.col(phash_col).bitwiseXOR(prev))
        ),
    )
