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


RESIZE_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures", "resize_slice_golden.parquet")
RESIZE_ENTITIES = 24
RESIZE_WH = 8


def build_resize() -> pd.DataFrame:
    """Golden stats of the 8×8 nearest-neighbor resample of every
    snapshot in the 24-entity multimodal fixture — computed from the
    RAW pixel arrays (decode-free), same convention as :func:`build`.
    The driver key `multimodal_resize_slice` proves
    decode → _resize_nn → PPM re-encode → decode → stats reproduces
    these bitwise."""
    from profet_spark.functions.multimodal import _resize_nn

    pdf = fixtures.make_fixture(n_entities=RESIZE_ENTITIES,
                                img_sizes=(16, 32))
    pdf = pdf.copy()
    pdf["ver"] = pdf.groupby("image_id").cumcount()
    stats = []
    for r in pdf.itertuples():
        arr = fixtures.pixel_array(r.image_id, int(r.ver),
                                   int(r.w), int(r.h))
        # _resize_nn's fancy indexing returns a non-contiguous view
        # whose pairwise-summation order differs from the C-contiguous
        # array the codec roundtrip yields (1-ulp drift in the means);
        # the pipeline's layout is laundered through the PPM bytes, so
        # freeze from the same C-contiguous layout
        g = golden_stats(np.ascontiguousarray(
            _resize_nn(arr, RESIZE_WH, RESIZE_WH)))
        stats.append({"g_lum_mean": g["g_lum_mean"],
                      "g_lum_var": g["g_lum_var"],
                      "g_edge_density": g["g_edge_density"]})
    return pd.concat(
        [pdf[["image_id", "ts"]].reset_index(drop=True),
         pd.DataFrame(stats)], axis=1)


CURATE_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures", "curate_slice_golden.parquet")
CURATE_ENTITIES = 60


def build_curate() -> pd.DataFrame:
    """Frozen pixel stats of the 60-entity (16,32) curation fixture —
    the ORIGINAL (pre-planting) metadata plus decode-free golden
    stats; the driver oracle replants the metadata defects in SQL
    (portable h32) and recomputes the whole two-tier gate."""
    pdf = fixtures.make_fixture(n_entities=CURATE_ENTITIES,
                                img_sizes=(16, 32))
    pdf = pdf.copy()
    pdf["ver"] = pdf.groupby("image_id").cumcount()
    stats = []
    for r in pdf.itertuples():
        g = golden_stats(fixtures.pixel_array(
            r.image_id, int(r.ver), int(r.w), int(r.h)))
        stats.append({"g_lum_mean": g["g_lum_mean"],
                      "g_lum_var": g["g_lum_var"],
                      "g_edge_density": g["g_edge_density"]})
    return pd.concat(
        [pdf[["image_id", "ts", "w", "h", "fmt"]].reset_index(drop=True),
         pd.DataFrame(stats)], axis=1)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    cout = build_curate()
    cschema = pa.schema([
        ("image_id", pa.string()), ("ts", pa.timestamp("us")),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("g_lum_mean", pa.float64()), ("g_lum_var", pa.float64()),
        ("g_edge_density", pa.float64()),
    ])
    os.makedirs(os.path.dirname(CURATE_OUT), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(cout, schema=cschema,
                                        preserve_index=False),
                   CURATE_OUT, compression="snappy")
    print(f"wrote {len(cout)} rows -> {CURATE_OUT}")

    rout = build_resize()
    rschema = pa.schema([
        ("image_id", pa.string()), ("ts", pa.timestamp("us")),
        ("g_lum_mean", pa.float64()), ("g_lum_var", pa.float64()),
        ("g_edge_density", pa.float64()),
    ])
    os.makedirs(os.path.dirname(RESIZE_OUT), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(rout, schema=rschema,
                                        preserve_index=False),
                   RESIZE_OUT, compression="snappy")
    print(f"wrote {len(rout)} rows -> {RESIZE_OUT}")

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
