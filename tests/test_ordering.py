"""O6 global_row_number: dense distributed numbering, no global window."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from profet_spark.operators.ordering import global_row_number

N = 700


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "id": rng.permutation(N).astype("int64"),
        "grp": rng.integers(0, 4, N).astype("int64"),
        "key": rng.integers(0, 10**9, N).astype("int64"),
    })
    return spark.createDataFrame(pdf).repartition(7), pdf


def test_matches_pandas_rank_ungrouped(frame):
    df, pdf = frame
    got = global_row_number(df, ["key", "id"], out_col="pos").toPandas()
    want = pdf.sort_values(["key", "id"]).reset_index(drop=True)
    want["pos"] = range(len(want))
    merged = got.merge(want[["id", "pos"]], on="id", suffixes=("", "_w"))
    assert (merged.pos == merged.pos_w).all()
    # dense 0-based
    assert sorted(got.pos) == list(range(N))


def test_matches_pandas_rank_grouped(frame):
    df, pdf = frame
    got = global_row_number(df, ["key", "id"], group_cols=["grp"],
                            out_col="pos").toPandas()
    want = pdf.sort_values(["grp", "key", "id"]).copy()
    want["pos"] = want.groupby("grp").cumcount()
    merged = got.merge(want[["id", "pos"]], on="id", suffixes=("", "_w"))
    assert (merged.pos == merged.pos_w).all()
    # dense 0-based within every group
    for _, g in got.groupby("grp"):
        assert sorted(g.pos) == list(range(len(g)))


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_invariant_to_partition_count(frame, parts):
    df, pdf = frame
    got = (global_row_number(df.repartition(parts), ["key", "id"],
                             group_cols=["grp"], out_col="pos",
                             n_partitions=parts)
           .toPandas().sort_values("id").reset_index(drop=True))
    want = pdf.sort_values(["grp", "key", "id"]).copy()
    want["pos"] = want.groupby("grp").cumcount()
    merged = got.merge(want[["id", "pos"]], on="id", suffixes=("", "_w"))
    assert (merged.pos == merged.pos_w).all()


def test_carry_across_arrow_batches(spark):
    # one group spanning many Arrow batches: the O(1) carry must keep
    # counting, not restart per batch
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        pdf = pd.DataFrame({"id": range(300),
                            "grp": [0] * 150 + [1] * 150})
        df = spark.createDataFrame(pdf)
        got = global_row_number(df, ["id"], group_cols=["grp"],
                                out_col="pos", n_partitions=2).toPandas()
        want = pdf.copy()
        want["pos"] = want.groupby("grp").cumcount()
        merged = got.merge(want, on=["id", "grp"], suffixes=("", "_w"))
        assert (merged.pos == merged.pos_w).all()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_no_data_sized_window_one_range_exchange(frame):
    df, _ = frame
    # persist=False keeps the range exchange visible in the plan string
    # (persist hides it inside an InMemoryTableScan)
    out = global_row_number(df, ["key", "id"], group_cols=["grp"],
                            out_col="pos", persist=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only window runs over the P x |groups| offsets frame, which
    # sits on top of a HashAggregate of the scan output — assert the
    # window's child is the aggregate, not the data
    assert "rangepartitioning" in plan.lower()
    import re
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert len(specs) <= 1
    assert "_pid" in (specs[0] if specs else "_pid")


def test_validation(frame):
    df, _ = frame
    with pytest.raises(ValueError, match="order_cols"):
        global_row_number(df, [])
    with pytest.raises(ValueError, match="already exists"):
        global_row_number(df.withColumn("row_idx", F.lit(1)), ["key"])
    with pytest.raises(ValueError, match="not on"):
        global_row_number(df, ["nope"])
