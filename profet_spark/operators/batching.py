"""Image-training batch assembly (B1-B2): aspect-ratio bucketing +
fixed-size batch planning, and deterministic augmentation planning.

The two scheduling steps an image-generation / vision-pretraining
pipeline runs between curation (functions/image_descriptors.py) and the
data loader, over a table shaped like the task's input hint
``(image_id, bytes, w, h, fmt, caption, phash)``:

- B1 :func:`assign_aspect_buckets` / :func:`plan_aspect_batches` —
  SDXL-style aspect-ratio bucketing (Podell et al. 2023, public): each
  image goes to the nearest of a small fixed list of aspect ratios, and
  batches are assembled WITHIN a bucket so every batch shares one
  resize target. Nearest-ratio is computed in exact integer arithmetic
  (cross-multiplied distances scaled by an lcm, argmin via a single
  ``least()`` over per-bucket keys — no floats, no explode), so the
  assignment is bitwise engine-portable. Batch assembly is sharded:
  rows are ordered by a salted portable h32 within (bucket, shard) and
  cut into ``batch_size`` groups, giving bounded window partitions —
  there is NO global window at any scale, the same design rule as
  pack_chunks_sharded (operators/corpus.py).
- B2 :func:`plan_augmentations` — deterministic per-epoch augmentation
  parameters (crop origin + horizontal flip) derived from the salted
  h32 of (epoch, id): a pure projection after an epoch explode, zero
  shuffle, reproducible across runs/engines/cluster sizes, and
  auditable (the plan is a table, so a training run can be replayed
  exactly — the reproducibility analog of P1's stable splits).

Both emit only exact integers, so they hash-grade bitwise against the
DuckDB oracles (see __spark_entry__ ``b1_aspect_batches`` /
``b2_augment_plan``).

Reference parity: ProFET has no batching tier (single-process sklearn
matrices, [R] Model_trainer.py); these are task-mandated training-data
additions alongside P1-P6 (SURVEY.md §2 'NEW' tier).
"""

from __future__ import annotations

from math import gcd
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from profet_spark.functions import hashing as H

#: Default aspect-ratio targets (width:height), nearest-match order.
#: Index order is the tiebreak: on an exact distance tie the EARLIER
#: bucket wins, so square ties resolve to (1, 1).
DEFAULT_ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (3, 2), (2, 3), (2, 1),
    (1, 2),
)


def _lcm(vals: Sequence[int]) -> int:
    out = 1
    for v in vals:
        out = out * v // gcd(out, v)
    return out


def _checked_dim(col: str) -> F.Column:
    """Fail fast on NULL / non-positive dimensions: a silently-NULL
    bucket key would drop the row from every batch (same rationale as
    corpus._bucket_bp's NULL-id guard)."""
    c = F.col(col)
    return F.when(
        c.isNull() | (c <= 0),
        F.raise_error(F.lit(
            f"aspect bucket: NULL or non-positive {col} — run the image "
            f"curation gate (curate_images) first")).cast("bigint"),
    ).otherwise(c.cast("bigint"))


def _bucket_keys(w: F.Column, h: F.Column,
                 buckets: Sequence[tuple[int, int]]) -> list[F.Column]:
    """Per-bucket comparable distance keys, exact integers.

    The true distance of aspect w/h to target bw/bh is
    |w/h - bw/bh| = |w*bh - bw*h| / (h*bh). Across buckets the h factor
    is common, so comparing |w*bh_i - bw_i*h| * (L/bh_i) — L the lcm of
    the bh's — orders buckets exactly like the true distances. Each key
    is then ``* n + i`` so a single least() yields the argmin with the
    smallest-index tiebreak (key magnitude ~ w * 32 * L * n, far inside
    int64 for any real image dimension)."""
    n = len(buckets)
    lcm = _lcm([bh for _, bh in buckets])
    return [
        (F.abs(w * F.lit(bh) - F.lit(bw) * h) * F.lit(lcm // bh * n)
         + F.lit(i)).cast("bigint")
        for i, (bw, bh) in enumerate(buckets)
    ]


def assign_aspect_buckets(df: DataFrame, w_col: str = "w",
                          h_col: str = "h",
                          buckets: Sequence[tuple[int, int]]
                          = DEFAULT_ASPECT_BUCKETS,
                          out_col: str = "aspect_bucket") -> DataFrame:
    """B1a: nearest-aspect-ratio bucket index + label per image.

    Adds ``out_col`` (0-based index into ``buckets``) and
    ``{out_col}_label`` ('bw:bh'). One codegen'd projection — zero
    shuffle, zero Python; the assignment is a pure exact-int function of
    (w, h), identical in the DuckDB oracle
    (:func:`aspect_bucket_sql_duckdb`).
    """
    if len(buckets) < 2:
        raise ValueError("assign_aspect_buckets: need >= 2 buckets")
    for c in (out_col, f"{out_col}_label"):
        if c in df.columns:
            raise ValueError(
                f"assign_aspect_buckets: column {c!r} already exists on "
                "the input — rename it or pass a different out_col")
    w, h = _checked_dim(w_col), _checked_dim(h_col)
    idx = F.least(*_bucket_keys(w, h, buckets)) % len(buckets)
    out = df.withColumn(out_col, idx.cast("bigint"))
    label = None
    for i, (bw, bh) in enumerate(buckets):
        cond = F.col(out_col) == i
        arm = F.lit(f"{bw}:{bh}")
        label = F.when(cond, arm) if label is None else label.when(cond, arm)
    return out.withColumn(f"{out_col}_label", label)


def aspect_bucket_sql_duckdb(w_expr: str, h_expr: str,
                             buckets: Sequence[tuple[int, int]]
                             = DEFAULT_ASPECT_BUCKETS) -> str:
    """DuckDB twin of the :func:`assign_aspect_buckets` index (same
    lcm-scaled cross-multiplied keys, same least-index tiebreak)."""
    n = len(buckets)
    lcm = _lcm([bh for _, bh in buckets])
    keys = [
        f"(abs(({w_expr}) * {bh} - {bw} * ({h_expr}))"
        f" * {lcm // bh * n} + {i})"
        for i, (bw, bh) in enumerate(buckets)
    ]
    return f"(least({', '.join(keys)}) % {n})"


def order_hash(id_col: str, salt: str) -> F.Column:
    """Salted portable h32 of the id — the deterministic within-bucket
    shuffle order (and shard source) for :func:`plan_aspect_batches`."""
    return H.h32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))


def order_hash_sql_duckdb(id_expr: str, salt: str) -> str:
    """DuckDB twin of :func:`order_hash`."""
    return H.h32_sql_duckdb(f"'{salt}:' || CAST({id_expr} AS VARCHAR)")


def plan_aspect_batches(df: DataFrame, id_col: str = "image_id",
                        w_col: str = "w", h_col: str = "h",
                        batch_size: int = 64, n_shards: int = 64,
                        buckets: Sequence[tuple[int, int]]
                        = DEFAULT_ASPECT_BUCKETS,
                        salt: str = "batch",
                        drop_incomplete: bool = False,
                        out_col: str = "aspect_bucket") -> DataFrame:
    """B1: assemble fixed-size same-aspect training batches.

    Each row gets (``out_col``, ``shard``, ``batch_id``, ``batch_pos``,
    ``is_complete``): rows are ordered by the salted h32 of the id
    (tiebreak: the id itself, for hash collisions) WITHIN
    (bucket, shard) and cut into ``batch_size`` groups. ``batch_id`` is
    unique within its (bucket, shard) — training data loaders need
    groups of ``batch_size`` same-bucket images, not a global batch
    sequence, and per-shard numbering is what keeps this scale-free.
    ``is_complete`` marks batches with exactly ``batch_size`` members
    (at most one incomplete tail batch per (bucket, shard));
    ``drop_incomplete=True`` filters the tails.

    Scale: ONE hash exchange on (bucket, shard) — with ~9 buckets and
    ``n_shards`` user-sized to the cluster, window partitions hold
    ~rows/(buckets*n_shards) rows each, bounded by construction; there
    is no global or data-sized window (plan-asserted in
    tests/test_batching.py). ``is_complete`` derives from the same
    window's partition row count, so it adds NO second exchange. The
    plan is a pure function of (salt, id, w, h) — invariant to input
    partitioning (property-tested) and bitwise oracle-portable.
    """
    if batch_size < 1:
        raise ValueError("plan_aspect_batches: batch_size must be >= 1")
    if n_shards < 1:
        raise ValueError("plan_aspect_batches: n_shards must be >= 1")
    for c in ("shard", "batch_id", "batch_pos", "is_complete", "__bh"):
        if c in df.columns:
            raise ValueError(
                f"plan_aspect_batches: column {c!r} already exists on the "
                "input — rename it first")
    out = assign_aspect_buckets(df, w_col, h_col, buckets, out_col)
    out = out.withColumn("__bh", order_hash(id_col, salt))
    out = out.withColumn(
        "shard", (F.col("__bh") % n_shards).cast("bigint"))
    win = Window.partitionBy(out_col, "shard").orderBy("__bh", id_col)
    rn = F.row_number().over(win) - 1
    # count over the SAME partition keys: reuses the one exchange
    n_part = F.count("*").over(Window.partitionBy(out_col, "shard"))
    # exact integer division: (x - x % B) is exactly divisible, so the
    # double quotient is exact for any x < 2^53 (a float floor() of the
    # raw quotient could round k*B-1 up at large row numbers)
    pos = rn % batch_size
    batch_id = ((rn - pos) / batch_size).cast("bigint")
    n_full = ((n_part - n_part % batch_size) / batch_size).cast("bigint")
    out = (
        out.withColumn("batch_id", batch_id)
        .withColumn("batch_pos", pos.cast("bigint"))
        .withColumn("is_complete", batch_id < n_full)
        .drop("__bh")
    )
    if drop_incomplete:
        out = out.where(F.col("is_complete"))
    return out


def bucket_resize_targets(buckets: Sequence[tuple[int, int]]
                          = DEFAULT_ASPECT_BUCKETS,
                          pixel_budget: int = 1024 * 1024,
                          multiple: int = 64) -> tuple[tuple[int, int], ...]:
    """Per-bucket (target_w, target_h): the largest dimensions with the
    bucket's aspect ratio that (a) are multiples of ``multiple`` (conv
    stride / patch alignment) and (b) fit the ``pixel_budget`` (constant
    activation memory per batch — the SDXL multi-aspect convention).

    Pure driver-side constant generation (the float sqrt happens once
    here, never per row); the emitted table is exact ints.
    """
    if pixel_budget < multiple * multiple:
        raise ValueError("bucket_resize_targets: pixel_budget smaller "
                         "than one multiple x multiple tile")
    out = []
    for bw, bh in buckets:
        w = max(int((pixel_budget * bw / bh) ** 0.5 // multiple) * multiple,
                multiple)
        h = max(int((pixel_budget * bh / bw) ** 0.5 // multiple) * multiple,
                multiple)
        out.append((w, h))
    return tuple(out)


def with_resize_targets(df: DataFrame, bucket_col: str = "aspect_bucket",
                        buckets: Sequence[tuple[int, int]]
                        = DEFAULT_ASPECT_BUCKETS,
                        pixel_budget: int = 1024 * 1024,
                        multiple: int = 64) -> DataFrame:
    """B1b: attach the shared resize target (``target_w``, ``target_h``)
    for each row's aspect bucket — every image in a batch then resizes
    to ONE shape. A CASE over exact int literals: zero shuffle, zero
    Python; the actual resize is functions/imaging.py's job."""
    for c in ("target_w", "target_h"):
        if c in df.columns:
            raise ValueError(
                f"with_resize_targets: column {c!r} already exists on the "
                "input — rename it first")
    targets = bucket_resize_targets(buckets, pixel_budget, multiple)
    tw = th = None
    for i, (w, h) in enumerate(targets):
        cond = F.col(bucket_col) == i
        tw = F.when(cond, w) if tw is None else tw.when(cond, w)
        th = F.when(cond, h) if th is None else th.when(cond, h)
    return (df.withColumn("target_w", tw.cast("bigint"))
            .withColumn("target_h", th.cast("bigint")))


def plan_augmentations(df: DataFrame, id_col: str = "image_id",
                       w_col: str = "w", h_col: str = "h",
                       crop_w: int = 256, crop_h: int = 256,
                       epochs: int = 1, salt: str = "aug",
                       flip: bool = True) -> DataFrame:
    """B2: deterministic per-epoch augmentation plan — one output row
    per (input row, epoch) with ``epoch``, ``crop_x``, ``crop_y`` (the
    top-left crop origin, uniform over the valid range, clamped to 0
    when the image is smaller than the crop) and ``flip`` (0/1, only if
    ``flip=True``).

    Every parameter is ``h32(salt:param:epoch:id) % span`` — a pure
    function of (salt, epoch, id), so the augmentation stream is
    reproducible across runs, engines, partitionings, and cluster
    sizes, and two feature tables keyed by the same id see the same
    crops. Scale: an epoch explode (narrow, fan-out = ``epochs``) plus
    one codegen'd projection — zero shuffle, zero Python
    (plan-asserted). The decode-side application of the plan is
    functions/imaging.py's job; this operator only schedules.
    """
    if epochs < 1:
        raise ValueError("plan_augmentations: epochs must be >= 1")
    if crop_w < 1 or crop_h < 1:
        raise ValueError("plan_augmentations: crop dims must be >= 1")
    for c in ("epoch", "crop_x", "crop_y", "flip"):
        if c in df.columns:
            raise ValueError(
                f"plan_augmentations: column {c!r} already exists on the "
                "input — rename it first")
    out = df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.lit(epochs))))
    ids = F.col(id_col).cast("string")
    ep = F.col("epoch").cast("string")

    def param(tag: str, span: F.Column) -> F.Column:
        key = F.concat(F.lit(f"{salt}:{tag}:"), ep, F.lit(":"), ids)
        return (H.h32(key) % span).cast("bigint")

    span_x = F.greatest(_checked_dim(w_col) - crop_w + 1, F.lit(1))
    span_y = F.greatest(_checked_dim(h_col) - crop_h + 1, F.lit(1))
    out = (out.withColumn("crop_x", param("x", span_x))
           .withColumn("crop_y", param("y", span_y)))
    if flip:
        out = out.withColumn("flip", param("f", F.lit(2)))
    return out


def augment_param_sql_duckdb(tag: str, span_expr: str, id_expr: str,
                             epoch_expr: str, salt: str = "aug") -> str:
    """DuckDB twin of one :func:`plan_augmentations` parameter."""
    key = (f"'{salt}:{tag}:' || CAST({epoch_expr} AS VARCHAR) || ':' || "
           f"CAST({id_expr} AS VARCHAR)")
    return f"({H.h32_sql_duckdb(key)} % ({span_expr}))"


def epoch_serving_order(plan: DataFrame, epochs: int,
                        batch_cols: Sequence[str]
                        = ("aspect_bucket", "shard", "batch_id"),
                        salt: str = "serve",
                        n_partitions: int | None = None) -> DataFrame:
    """B3: deterministic per-epoch batch serving order — the loader-side
    shuffle. Training wants a DIFFERENT global batch permutation every
    epoch, identical on every rerun (bitwise-reproducible training) and
    on every worker (no coordinator broadcast of a permutation array).

    Input is a B1 plan (or any frame containing ``batch_cols``); one
    output row per (epoch, batch):

    ``(epoch, *batch_cols, serve_key, serve_pos)``

    - ``serve_key``: ``h32(salt:epoch:bucket:shard:batch)`` — a pure
      function of (salt, epoch, batch identity), so epoch permutations
      are independent draws yet fully reproducible;
    - ``serve_pos``: dense 0-based position of the batch within its
      epoch under ``(serve_key, *batch_cols)`` — the hash tiebroken by
      the batch identity, making the total order engine-portable even
      across h32 collisions.

    Scale: batches are ``rows/batch_size`` — still data-sized, so the
    position comes from :func:`operators.ordering.global_row_number`
    (range exchange + streaming Arrow scan + P x epochs offset window),
    NOT a global ``row_number`` window; the only other exchange is the
    batch-key distinct. The loader reads ``ORDER BY epoch, serve_pos``
    (or range-partitions by ``serve_pos`` for striped consumption).

    Reference parity: ProFET shuffles with sklearn's in-memory RNG
    state ([R] Model_trainer.py train_test_split / CV folds) — nothing
    distributed or replayable; this is the task-mandated training-data
    tier's reproducibility analog of B2's augmentation plan.
    """
    from profet_spark.operators.ordering import global_row_number

    if epochs < 1:
        raise ValueError("epoch_serving_order: epochs must be >= 1")
    batch_cols = list(batch_cols)
    missing = [c for c in batch_cols if c not in plan.columns]
    if missing:
        raise ValueError(
            f"epoch_serving_order: batch_cols {missing} not on the input "
            f"(has {plan.columns}) — pass the B1 plan_aspect_batches "
            "output or name your batch identity columns")
    for c in ("epoch", "serve_key", "serve_pos"):
        if c in plan.columns:
            raise ValueError(
                f"epoch_serving_order: column {c!r} already exists on the "
                "input — rename it first")
    batches = plan.select(*batch_cols).distinct()
    rep = (batches
           .withColumn("epoch",
                       F.explode(F.sequence(F.lit(1), F.lit(epochs))))
           .withColumn("epoch", F.col("epoch").cast("bigint")))
    key = F.concat_ws(
        ":", F.lit(salt), F.col("epoch").cast("string"),
        *[F.col(c).cast("string") for c in batch_cols])
    rep = rep.withColumn("serve_key", H.h32(key))
    out = global_row_number(
        rep, order_cols=["serve_key"] + batch_cols, group_cols=["epoch"],
        out_col="serve_pos", n_partitions=n_partitions)
    return out.select("epoch", *batch_cols, "serve_key", "serve_pos")


def serve_key_sql_duckdb(batch_cols: Sequence[str],
                         epoch_expr: str = "epoch",
                         salt: str = "serve") -> str:
    """DuckDB twin of B3's serve_key (same concat layout, same h32)."""
    parts = f"'{salt}' || ':' || CAST({epoch_expr} AS VARCHAR)"
    for c in batch_cols:
        parts += f" || ':' || CAST({c} AS VARCHAR)"
    return H.h32_sql_duckdb(parts)
