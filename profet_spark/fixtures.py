"""Deterministic image+caption snapshot fixture (FIXTURES.md §A).

Exactly the BASELINE.json input_hint schema
``(image_id, bytes, w, h, fmt, caption, phash)`` plus the derived
temporal key ``ts`` (1-8 snapshot versions per entity, irregular gaps).
Everything re-derivable from ``(image_id, version)`` + seed alone, so
decode tests need no stored originals.

Fixture properties wired in for the test plan (SURVEY.md §5.2):
- a designated ~2% of entities share ONE phash cluster that covers ~30%
  of all rows (the skew fixture for the salted as-of path);
- ~1% of entities carry a "future poison" final snapshot with extreme
  caption/pixel values — leakage tests assert it never influences
  features at earlier ts;
- null-gap rows (caption unchanged while pixels change, and vice versa)
  exercise ffill/bfill.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from profet_spark.imaging import ENCODERS, average_hash

SEED = 42
BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")

# exactly the BASELINE.json input_hint schema + derived ts
SNAPSHOT_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, ts timestamp"
)


def to_spark(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf, schema=SNAPSHOT_DDL)


def stage_parquet(spark, pdf: pd.DataFrame, path: str):
    """Write the fixture to parquet (pyarrow, explicit schema) and read it
    back — the production-faithful input shape (scan from storage).

    ``createDataFrame(pdf)`` plans a parallelized local collection whose
    data rides INSIDE every task binary (~MBs per task, re-shipped on every
    re-computation after a cache drop — the 'task of very large size'
    warnings); a parquet scan ships only file splits. Column types mirror
    SNAPSHOT_DDL exactly (``ts`` cast back to TIMESTAMP after the read),
    so frames from either loader union/join cleanly."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("ts", pa.timestamp("us")),
    ])
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
                   os.path.join(path, "part-0.parquet"))
    # parquet naive timestamps read back as TIMESTAMP_NTZ; cast to the
    # SNAPSHOT_DDL TIMESTAMP type so both fixture loaders stay
    # union/join-compatible (session TZ is pinned UTC — identity cast)
    df = spark.read.parquet(path)
    return df.withColumn("ts", df["ts"].cast("timestamp"))

_VOCAB = None


def vocab() -> list[str]:
    """512 deterministic pseudo-words."""
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.default_rng(SEED)
        cons = list("bcdfghjklmnpqrstvwxyz")
        vow = list("aeiou")
        words = []
        while len(words) < 512:
            n_syll = rng.integers(1, 4)
            w = "".join(rng.choice(cons) + rng.choice(vow) for _ in range(n_syll))
            if rng.random() < 0.3:
                w += rng.choice(cons)
            words.append(w)
        _VOCAB = words
    return _VOCAB


def _entity_rng(image_id: str, version: int) -> np.random.Generator:
    # stable across processes (Python's hash() is salted per process)
    import hashlib

    d = hashlib.blake2b(f"profet_fixture|{image_id}|{version}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(d, "big"))


def pixel_array(image_id: str, version: int, w: int, h: int) -> np.ndarray:
    """Ground-truth pixels: gradients + seeded texture, uint8 RGB."""
    rng = _entity_rng(image_id, version)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int64)
    texture = rng.integers(-40, 41, size=(h, w, 3))
    return np.clip(base + texture, 0, 255).astype(np.uint8)


def caption_for(image_id: str, version: int, poison: bool = False) -> str:
    rng = _entity_rng(image_id, version * 7919 + 1)
    v = vocab()
    n_words = int(rng.integers(3, 41))
    words = [v[int(i)] for i in rng.integers(0, 512, n_words)]
    if poison:
        return "ZZZZPOISON " + " ".join(words) + " QQQQ" * 20
    return " ".join(words)


def hot_entity_ids(n_entities: int, hot_entity_frac: float = 0.02) -> list[str]:
    n_hot = max(1, int(n_entities * hot_entity_frac))
    return [f"img{k:08d}" for k in range(n_hot)]


def make_fixture(
    n_entities: int = 300,
    seed: int = SEED,
    hot_entity_frac: float = 0.02,
    hot_row_target: float = 0.30,
    poison_frac: float = 0.01,
    with_images: bool = True,
    img_sizes: tuple[int, ...] = (32, 64),
) -> pd.DataFrame:
    """Build the snapshot table as pandas (deterministic in all args)."""
    rng = np.random.default_rng(seed)
    rows = []
    n_hot = max(1, int(n_entities * hot_entity_frac))
    # hot entities get enough versions to hold ~hot_row_target of rows:
    # n_cold_rows ≈ (n_entities - n_hot) * 4.5 avg versions
    est_cold = (n_entities - n_hot) * 4.5
    hot_versions = max(2, int(est_cold * hot_row_target / (1 - hot_row_target) / n_hot))
    hot_phash = None
    for k in range(n_entities):
        image_id = f"img{k:08d}"
        is_hot = k < n_hot
        n_ver = hot_versions if is_hot else int(rng.integers(1, 9))
        is_poison = (not is_hot) and rng.random() < poison_frac
        t = BASE_TS + np.timedelta64(int(rng.integers(0, 86_400_000_000)), "us")
        for ver in range(n_ver):
            poison_row = is_poison and ver == n_ver - 1
            w = int(rng.choice(img_sizes))
            h = int(rng.choice(img_sizes))
            fmt = "ppm" if rng.random() < 0.5 else "png"
            caption = caption_for(image_id, ver, poison=poison_row)
            if with_images:
                arr = pixel_array(image_id, ver, w, h)
                data = ENCODERS[fmt](arr)
                ph = average_hash(arr)
            else:
                data, ph = b"", int(rng.integers(-(2**62), 2**62))
            if is_hot:
                if hot_phash is None:
                    hot_phash = ph
                ph = hot_phash
            rows.append((image_id, data, w, h, fmt, caption, ph, t))
            # irregular forward gaps: minutes → days
            gap_us = int(rng.choice([60, 3600, 7200, 86400, 259200])) * 1_000_000
            gap_us += int(rng.integers(0, 3_600_000_000))
            t = t + np.timedelta64(gap_us, "us")
    pdf = pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "ts"]
    )
    if pdf.duplicated(["image_id", "ts"]).any():
        raise ValueError("fixture generated duplicate (image_id, ts) keys")
    return pdf


def updates_fixture(n_entities: int = 300, seed: int = SEED + 1, rows_per_entity: int = 5) -> pd.DataFrame:
    """Right-side build table for as-of join tests (FIXTURES.md §A.3):
    irregular ts NOT aligned with snapshot ts."""
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_entities):
        image_id = f"img{k:08d}"
        n = int(rng.integers(0, rows_per_entity * 2))
        for _ in range(n):
            t = BASE_TS + np.timedelta64(int(rng.integers(0, 40 * 86_400_000_000)), "us")
            rows.append((image_id, t, float(rng.normal())))
    return (
        pd.DataFrame(rows, columns=["image_id", "ts", "upd"])
        .drop_duplicates(["image_id", "ts"])
        .reset_index(drop=True)
    )
