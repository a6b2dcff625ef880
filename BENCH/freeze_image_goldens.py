"""Freeze the image-slice golden table (VERDICT r4 ask #5).

Writes ``BENCH/fixtures/image_slice_golden.parquet``: one row per
snapshot of the deterministic 80-entity fixture, carrying the fixture's
scalar metadata plus decode-free golden pixel statistics computed
DIRECTLY from :func:`fixtures.pixel_array` (the pre-encode ground-truth
array) — never through the PNG/PPM codec path.

The driver key ``image_features_sql_slice`` then hash-grades the REAL
pipeline (fixture → encode → Spark ``mapInPandas`` decode → stats →
phash lag window) against this frozen table: a driver-certified proof
that the full codec + Arrow-batch + window machinery reproduces the
direct-from-pixels values bit for bit. The stats formulas themselves
are pinned against textbook re-implementations in
tests/test_descriptors.py (O(n^4) DCT etc.); this freeze reuses the
imaging helpers on the RAW array, so the codec roundtrip and the Spark
plumbing are the things under test, not the formulas.

Deterministic in every input (seeded fixture, integer pixel source) —
re-running this script must reproduce the committed parquet bitwise;
tests/test_pipeline.py::test_image_slice_goldens_reproducible pins it.

Run: ``python BENCH/freeze_image_goldens.py``
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profet_spark import fixtures  # noqa: E402
from profet_spark import imaging  # noqa: E402

N_ENTITIES = 80
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", "image_slice_golden.parquet")

from profet_spark.functions.image_descriptors import (  # noqa: E402
    _PROFILE_WINDOW,
)


def golden_stats(arr: np.ndarray) -> dict:
    """compute_image_stats' arithmetic on the RAW pixel array (no
    codec): same numpy calls in the same order, so a lossless
    encode→decode roundtrip must reproduce these values bitwise."""
    lum = imaging.luminance(arr)
    edges = np.abs(np.diff(lum, axis=1)).mean() if lum.shape[1] > 1 else 0.0
    row_means = lum.mean(axis=1)
    w = _PROFILE_WINDOW
    if len(row_means) >= w:
        p = len(row_means) - w + 1
        prof = np.zeros(p)
        for k in range(w):
            prof += row_means[k: k + p]
        prof /= w
        pmean = float(prof.mean())
    else:
        pmean = 0.0
    return {
        "g_lum_mean": float(lum.mean()),
        "g_lum_var": float(lum.var()),
        "g_edge_density": float(edges),
        "g_rowprof_mean": pmean,
        "g_phash_dct": imaging.phash_dct(arr),
    }


def build() -> pd.DataFrame:
    pdf = fixtures.make_fixture(n_entities=N_ENTITIES)
    # version = per-entity snapshot index in generation order (ts is
    # strictly increasing within an entity, so cumcount == ver)
    pdf = pdf.copy()
    pdf["ver"] = pdf.groupby("image_id").cumcount()
    stats = [
        golden_stats(fixtures.pixel_array(r.image_id, int(r.ver),
                                          int(r.w), int(r.h)))
        for r in pdf.itertuples()
    ]
    out = pd.concat(
        [pdf[["image_id", "ts", "w", "h", "fmt", "phash"]].reset_index(drop=True),
         pd.DataFrame(stats)], axis=1)
    return out


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = build()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    schema = pa.schema([
        ("image_id", pa.string()), ("ts", pa.timestamp("us")),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("phash", pa.int64()),
        ("g_lum_mean", pa.float64()), ("g_lum_var", pa.float64()),
        ("g_edge_density", pa.float64()), ("g_rowprof_mean", pa.float64()),
        ("g_phash_dct", pa.int64()),
    ])
    table = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
    # fixed creator metadata + no compression variability → bitwise
    # reproducible file for the determinism pin
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {len(out)} rows -> {OUT}")


if __name__ == "__main__":
    main()
