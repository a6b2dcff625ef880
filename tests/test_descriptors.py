"""Golden-vector tests (SURVEY.md §5.2-1): the vectorized Spark descriptor
UDF must be allclose(rtol=1e-9, atol=1e-12) to the independent per-string
numpy oracle, on adversarial caption fixtures."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from profet_spark import oracle_numpy as oracle
from profet_spark.functions import text_descriptors as td

CASES = [
    "The quick brown fox jumps over the lazy dog",
    "",                                  # empty
    None,                                # null caption
    "a",                                 # single char
    "zzzzzzzzzzzzzzzzzzzzzzzz",          # all-one-class (CTD distribution edge)
    "ababababababababab",                # repeated-run transitions
    "1234 !!! ??? ~~~",                  # no letters at all after normalize
    "Mixed CASE with Punctuation!!! and numbers 123",
    "short",
    "x" * 500 + "y" * 300 + "z" * 200,   # long with blocks
    "ACDEFGHIKLMNPQRSTVWY",              # the 20-AA alphabet itself
    "The   many    spaces   collapse",
]


def test_batch_matches_oracle():
    got = td.compute_features_batch(pd.Series(CASES))
    for i, cap in enumerate(CASES):
        want = oracle.all_features(cap or "")
        for name, wv in want.items():
            gv = got.iloc[i][name]
            assert np.isclose(gv, wv, rtol=1e-9, atol=1e-12), (
                f"row {i} ({cap!r:.40}) feature {name}: spark={gv} oracle={wv}"
            )


def test_feature_names_stable():
    names = td.FEATURE_NAMES
    assert len(names) == len(set(names))
    assert names == oracle.feature_names()
    # contract counts: 28 comp + 64 k2 + 64 k3 + 147 ctd + 6 scalar
    # + 10 profile + 5 pse + 16 terminal
    assert len(names) == 28 + 64 + 64 + 147 + 6 + 10 + 5 + 16


def test_spark_udf_roundtrip(spark):
    pdf = pd.DataFrame({"image_id": [f"i{k}" for k in range(len(CASES))],
                        "caption": [c or "" for c in CASES]})
    df = spark.createDataFrame(pdf)
    out = td.add_caption_features(df, flatten=True).toPandas().set_index("image_id")
    for k, cap in enumerate(CASES):
        want = oracle.all_features(cap or "")
        row = out.loc[f"i{k}"]
        for name, wv in want.items():
            assert np.isclose(row[name], wv, rtol=1e-9, atol=1e-12), (
                f"{name} at row {k}: {row[name]} vs {wv}"
            )


def test_udf_on_documents(spark, sf_dir):
    """Real data smoke: full descriptor struct over documents.text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = td.add_caption_features(docs.withColumnRenamed("text", "caption"), flatten=True)
    pdf = out.select("doc_id", "length", "entropy", "gravy", "ctd_hydrophobicity_c1").toPandas()
    assert len(pdf) == docs.count()
    assert (pdf["length"] >= 0).all()
    assert pdf["entropy"].between(0, np.log2(26)).all()


def test_packed_path_equals_struct_path(spark):
    """add_caption_features_packed (mapInArrow, one array<double>) must be
    bitwise identical to the struct pandas_udf path, including edge cases
    (nulls, empties, non-A-Z, unicode)."""
    rows = [(f"i{k}", c) for k, c in enumerate(CASES)]
    pdf = pd.DataFrame({"image_id": [r[0] for r in rows],
                        "caption": [r[1] or "" for r in rows]})
    df = spark.createDataFrame(pdf)
    a = td.add_caption_features(df, flatten=True).orderBy("image_id").toPandas()
    b = td.add_caption_features_packed(df).orderBy("image_id").toPandas()
    mat_a = a[td.FEATURE_NAMES].to_numpy()
    mat_b = np.vstack(b["features"].to_numpy())
    assert np.array_equal(mat_a, mat_b)
    assert "caption" not in b.columns  # drop_caption default


def test_packed_unicode_batch(spark):
    """Non-ASCII captions route through the fallback normalizer with the
    same [^A-Z]-removal semantics."""
    pdf = pd.DataFrame({"image_id": ["u1", "u2"],
                        "caption": ["héllo wörld ABC", "straße groß XYZ"]})
    df = spark.createDataFrame(pdf)
    a = td.add_caption_features(df, flatten=True).orderBy("image_id").toPandas()
    b = td.add_caption_features_packed(df).orderBy("image_id").toPandas()
    assert np.array_equal(a[td.FEATURE_NAMES].to_numpy(),
                          np.vstack(b["features"].to_numpy()))
    from profet_spark import oracle_numpy as oracle
    want = oracle.all_features("héllo wörld ABC")  # ß row checks upper()-expansion parity via path equality above
    got = dict(zip(td.FEATURE_NAMES, np.vstack(b["features"].to_numpy())[0]))
    for name, wv in want.items():
        assert np.isclose(got[name], wv, rtol=1e-9, atol=1e-12), name


def test_fuzz_random_strings_match_oracle():
    """Seeded fuzz: 300 adversarial strings (unicode, emoji, control chars,
    long class runs, high-codepoint letters) through the batch kernel must
    match the numpy oracle bit-for-bit within tolerance."""
    rng = np.random.default_rng(20260817)
    pools = [
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ 0123456789"),
        list("äöüßéèñçøåÆŒ 汉字 かな 한글 🙂🚀 \t\n\x00\x1b"),
        list("zzzzzzkkkkkkqqqqqq "),
        list("ACDEFGHIKLMNPQRSTVWY"),
    ]
    cases = []
    for i in range(300):
        pool = pools[i % len(pools)]
        n = int(rng.integers(0, 200))
        cases.append("".join(rng.choice(pool) for _ in range(n)))
    got = td.compute_features_batch(pd.Series(cases))
    for i, cap in enumerate(cases):
        want = oracle.all_features(cap)
        for name, wv in want.items():
            gv = got.iloc[i][name]
            assert np.isclose(gv, wv, rtol=1e-9, atol=1e-12), (
                f"fuzz row {i} ({cap!r:.40}) feature {name}: {gv} vs {wv}")


def test_pair_feature_chunking_is_invariant():
    """_pair_features chunks the 676-key bincount every 256 rows; a batch
    past the boundary must equal the unchunked global scatter exactly
    (counts are integers — any difference is a chunk-boundary bug).
    The brute reference runs the float64 GEMM, so this also pins the
    float32 fast path (all rows < 2^24 chars) as bitwise-exact."""
    rng = np.random.default_rng(41)
    caps = ["".join(rng.choice(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"), n))
            for n in rng.integers(0, 60, 4100)]
    codes, row, lens, starts = td._flatten(pd.Series(caps))
    letter = codes - np.uint8(65)
    pv = td._pairs(row)
    chunked = td._pair_features(letter, row, pv, 4100, lens)
    brute_keys = (row[:-1].astype(np.int64) * 676
                  + letter[:-1].astype(np.int64) * 26 + letter[1:])
    brute = (np.bincount(brute_keys[pv], minlength=4100 * 676)
             .reshape(4100, 676).astype(np.float64) @ td._M_PAIR)
    np.testing.assert_array_equal(chunked, brute)


def test_pair_feature_f32_equals_f64_path():
    """The float32-GEMM fast path and the float64 fallback must agree
    BITWISE on the same batch — both compute exact integer counts, so any
    difference is a lost-precision bug (e.g. a count or partial sum that
    escaped the 2^24 exactness envelope)."""
    rng = np.random.default_rng(43)
    caps = ["".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), n))
            for n in rng.integers(0, 300, 512)]
    codes, row, lens, starts = td._flatten(pd.Series(caps))
    letter = codes - np.uint8(65)
    pv = td._pairs(row)
    fast = td._pair_features(letter, row, pv, 512, lens)
    # force the fallback by faking one huge row length (selection only —
    # the counts themselves are identical)
    lens_big = lens.copy()
    lens_big[0] = 1 << 24
    slow = td._pair_features(letter, row, pv, 512, lens_big)
    np.testing.assert_array_equal(fast, slow)


def test_ctd_distribution_argsort_matches_flatnonzero_order():
    """The stable uint8 argsort the distribution block uses must reproduce
    flatnonzero(cls == c) per class exactly (stable sort groups positions
    by class, ascending within each) — the property the rank gathers
    depend on."""
    rng = np.random.default_rng(42)
    caps = ["".join(rng.choice(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"), n))
            for n in rng.integers(1, 80, 500)]
    codes, _, _, _ = td._flatten(pd.Series(caps))
    for prop, lut8 in td._CTD8.items():
        cls8 = lut8[codes]
        order = np.argsort(cls8, kind="stable")
        counts = np.bincount(cls8, minlength=4)
        b1, b2 = counts[1], counts[1] + counts[2]
        cls64 = td._CTD[prop][codes]
        np.testing.assert_array_equal(order[:b1], np.flatnonzero(cls64 == 1))
        np.testing.assert_array_equal(order[b1:b2], np.flatnonzero(cls64 == 2))
        np.testing.assert_array_equal(order[b2:], np.flatnonzero(cls64 == 3))


def test_grantham_matrix_reproduces_published_distances():
    """A14 fidelity pin: the Grantham matrix is RECONSTRUCTED from the
    1974 formula + property table (alphabets.py), not copied — so the
    data entry must reproduce the paper's published integer distances
    (rho is the published 3-decimal rounding, hence the ±1 band) and the
    190-pair mean must sit at the paper's normalization target of 100."""
    import itertools

    from profet_spark.functions.alphabets import (grantham_d2_scaled,
                                                  grantham_distance)

    published = {
        ("L", "I"): 5, ("G", "W"): 184, ("F", "L"): 22, ("R", "L"): 102,
        ("S", "L"): 145, ("C", "W"): 215, ("Y", "F"): 22, ("A", "G"): 60,
        ("D", "E"): 45, ("M", "L"): 15, ("K", "R"): 26, ("P", "S"): 74,
        ("V", "I"): 29, ("T", "S"): 58, ("H", "Q"): 24, ("N", "D"): 23,
    }
    for (a, b), want in published.items():
        got = grantham_distance(a, b)
        assert abs(got - want) <= 1.0, (a, b, got, want)
        # symmetry + identity of the exact-int kernel
        assert grantham_d2_scaled(a, b) == grantham_d2_scaled(b, a)
        assert grantham_d2_scaled(a, a) == 0
    aas = "ARNDCQEGHILKMFPSTWYV"
    mean = np.mean([grantham_distance(a, b)
                    for a, b in itertools.combinations(aas, 2)])
    assert abs(mean - 100.0) < 0.5, mean


def test_grantham_qso_normalizer_matches_w_point_one():
    """Round-4 review regression pin: the integer QSO-G normalizer must
    implement w = 0.1 over REAL Grantham distances. qso_gk in the graded
    query is tau_raw_k / (C + sum(tau_raw)) with C = round(1e8/(w*rho^2))
    = 388678; that must equal the textbook w*tau_real/(1 + w*sum(tau_real))
    up to C's rounding (an earlier constant of 3886782 silently encoded
    w = 0.01 on BOTH engines, so hash-grading could not catch it)."""
    from profet_spark.functions.alphabets import (GRANTHAM_RHO,
                                                  grantham_d2_scaled)

    C = 388678
    assert C == round(1e8 / (0.1 * GRANTHAM_RHO ** 2))
    seq = "ACDEFGHIKLM"
    taus_raw = []
    for d in (1, 2, 3):
        taus_raw.append(sum(grantham_d2_scaled(seq[i], seq[i + d])
                            for i in range(len(seq) - d)))
    scale = GRANTHAM_RHO ** 2 / 1e8
    taus_real = [t * scale for t in taus_raw]
    for k in range(3):
        int_form = taus_raw[k] / (C + sum(taus_raw))
        true_form = 0.1 * taus_real[k] / (1.0 + 0.1 * sum(taus_real))
        assert abs(int_form - true_form) <= 2e-6 * abs(true_form), (
            k, int_form, true_form)


def test_sql_registry_matches_dataframe_paths(spark):
    """register_sql_functions exposes the SAME kernel through spark.sql:
    the array UDF equals the packed DataFrame path element-for-element and
    the struct UDF supports field access + Catalyst struct pruning."""
    from profet_spark.functions import sql_registry, text_descriptors as td

    names = sql_registry.register_sql_functions(spark)
    assert names == ["profet_features", "profet_features_struct",
                     "profet_image_stats"]
    pdf = pd.DataFrame({
        "image_id": ["a", "b", "c", "d"],
        "caption": ["MALWMRLLPL", "", "the CAT sat 42!", "GAVLIPFMW" * 7],
    })
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("sql_registry_snaps")

    got = spark.sql(
        "SELECT image_id, profet_features(caption) AS f,"
        "       profet_features_struct(caption).entropy AS ent"
        " FROM sql_registry_snaps ORDER BY image_id").toPandas()
    want = (td.add_caption_features_packed(df, drop_caption=False)
            .select("image_id", "features", "caption")
            .toPandas().sort_values("image_id").reset_index(drop=True))

    ent_idx = td.feature_index("entropy")
    for i in range(len(pdf)):
        gf = np.asarray(got["f"][i], dtype=np.float64)
        wf = np.asarray(want["features"][i], dtype=np.float64)
        assert gf.shape == (len(td.FEATURE_NAMES),)
        assert np.array_equal(gf, wf), i  # same kernel => bitwise equal
        assert got["ent"][i] == wf[ent_idx]

    # re-registration is idempotent (replaces, no error)
    assert sql_registry.register_sql_functions(spark) == names


def test_sql_registry_image_stats_matches_kernel(spark):
    """profet_image_stats through spark.sql equals compute_image_stats
    per row, including the decode_ok=false path for corrupt payloads."""
    from profet_spark import imaging
    from profet_spark.functions import image_descriptors as imgd
    from profet_spark.functions import sql_registry

    sql_registry.register_sql_functions(spark)
    rng = np.random.default_rng(7)
    good = imaging.encode_ppm(rng.integers(0, 256, (8, 6, 3), dtype=np.uint8))
    rows = [("a", bytearray(good), "ppm"), ("b", bytearray(b"not an image"), "ppm")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    df.createOrReplaceTempView("sql_registry_imgs")

    got = spark.sql(
        "SELECT image_id, profet_image_stats(bytes, fmt) AS s"
        " FROM sql_registry_imgs ORDER BY image_id").collect()
    for r, (_, data, fmt) in zip(got, rows):
        want = imgd.compute_image_stats(bytes(data), fmt)
        s = r.s.asDict()
        assert s == want, r.image_id
    assert got[0].s.decode_ok is True and got[1].s.decode_ok is False


def test_curate_images_two_tier_gate(spark):
    """curate_images: metadata rejects carry NULL pixel stats (never
    decoded), pixel rejects carry the first-failing reason, keepers pass
    both tiers; drop mode preserves the original columns incl. bytes."""
    from profet_spark import imaging
    from profet_spark.functions import image_descriptors as imgd

    rng = np.random.default_rng(11)

    def img(w, h, const=None):
        if const is None:
            arr = rng.integers(20, 230, (h, w, 3), dtype=np.uint8)
        else:
            arr = np.full((h, w, 3), const, dtype=np.uint8)
        return bytearray(imaging.encode_ppm(arr))

    rows = [
        ("keep", img(64, 64), 64, 64, "ppm"),
        ("small", img(8, 8), 8, 8, "ppm"),
        ("stretch", img(300, 64), 300, 64, "ppm"),
        ("badfmt", img(64, 64), 64, 64, "jpg"),
        ("corrupt", bytearray(b"junk"), 64, 64, "ppm"),
        ("flat", img(64, 64, const=128), 64, 64, "ppm"),
        ("dark", img(64, 64, const=1), 64, 64, "ppm"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    got = {r["image_id"]: r for r in imgd.curate_images(df).collect()}

    assert got["keep"]["keep_image"] and got["keep"]["reject_reason"] is None
    assert got["small"]["reject_reason"] == "meta_small"
    assert got["stretch"]["reject_reason"] == "meta_aspect"
    assert got["badfmt"]["reject_reason"] == "meta_fmt"
    # tier-1 rejects were never decoded: NULL stats, not zero-stats
    for rid in ("small", "stretch", "badfmt"):
        assert got[rid]["lum_mean"] is None and not got[rid]["meta_ok"]
    assert got["corrupt"]["reject_reason"] == "decode"
    assert got["flat"]["reject_reason"] == "flat"
    assert got["flat"]["lum_var"] == 0.0          # decoded, stats present
    assert got["dark"]["reject_reason"] == "lum_bounds"
    # flag mode never emits the binary column
    assert "bytes" not in imgd.curate_images(df).columns

    kept = imgd.curate_images(df, mode="drop")
    assert kept.columns == ["image_id", "bytes", "w", "h", "fmt"]
    assert [r["image_id"] for r in kept.collect()] == ["keep"]

    with pytest.raises(ValueError, match="mode"):
        imgd.curate_images(df, mode="audit")
    with pytest.raises(ValueError, match="allowlist"):
        imgd.curate_images(df, fmts=())


def test_curate_images_rejected_branch_prunes_bytes(spark, tmp_path):
    """The tier-1 reject branch's parquet scan must not read the binary
    column (column pruning keeps the 10^12-scale property honest)."""
    from profet_spark import imaging
    from profet_spark.functions import image_descriptors as imgd

    rng = np.random.default_rng(12)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    pdf = pd.DataFrame({
        "image_id": ["a", "b"],
        "bytes": [bytearray(imaging.encode_ppm(arr))] * 2,
        "w": [8, 64], "h": [8, 64], "fmt": ["ppm", "ppm"],
    })
    path = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    out = imgd.curate_images(spark.read.parquet(path), min_w=16, min_h=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two scans: the decode branch reads bytes, the reject branch must not
    schemas = [seg for seg in plan.split("ReadSchema: ")[1:]]
    assert len(schemas) >= 2
    assert any("bytes" not in seg.split("\n")[0] for seg in schemas)
