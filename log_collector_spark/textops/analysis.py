"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting.

All native Catalyst expressions (whole-stage codegen, no Python in the hot
path); every scoring output is an integer/boolean/string so the DuckDB oracle
hashes identically. At 100 TB these run as a single narrow projection over
the documents scan — no shuffle at all until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log_collector_spark.textops import common as C

# "BPE-ish" lexer: letter runs, digit runs, single other-symbols — the shape
# of a byte-pair pre-tokenizer's coarse split (public GPT-2 style pattern,
# simplified to stay identical across regex engines).
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny deterministic stopword lists for the n-gram language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "du", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "que", "por", "con"],
}
CJK_REGEX = r"[一-鿿]"
# deterministic tie-break: priority order when scores are equal
LANG_ORDER = ["en", "de", "fr", "es"]


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(C.tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish lexemes (letters run / digits run / symbol)."""
    return F.regexp_count(text, F.lit(BPE_ISH)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality features + a rule-based keep/drop flag.

    Mirrors the usual pretraining quality filters (length bounds, symbol
    ratio, stopword presence, word-length sanity) with pure integer
    comparisons so the oracle matches exactly.
    """
    text = F.col(text_col)
    toks = C.tokens(text)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_alpha = F.regexp_count(text, F.lit(r"[A-Za-z]")).cast("long")
    n_digit = F.regexp_count(text, F.lit(r"[0-9]")).cast("long")
    n_punct = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")).cast("long")
    n_stop = F.size(F.filter(
        toks, lambda t: F.array_contains(
            F.lit(LANG_STOPWORDS["en"]).cast("array<string>"), F.lower(t)))
    ).cast("long")
    # keep: 10..10000 chars, >=5 tokens, alpha majority (2*alpha > chars),
    # punct <= 20% of chars, mean word length 2..20 (integer cross-multiply)
    keep = (
        (n_chars >= 10) & (n_chars <= 10000) & (n_tokens >= 5)
        & (n_alpha * 2 > n_chars)
        & (n_punct * 5 <= n_chars)
        & (n_chars >= n_tokens * 2) & (n_chars <= n_tokens * 21)
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        bpe_ish_token_count(text).alias("n_bpe_tokens"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        keep.alias("quality_keep"),
    )


def sql_quality_features(table: str = "documents") -> str:
    tok = C.sql_tokens("text")
    stop = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len({tok}) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS BIGINT) AS n_bpe_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
                   CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
                   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
                   CAST(len(list_filter({tok}, t -> list_contains([{stop}], lower(t)))) AS BIGINT) AS n_stopwords
            FROM {table}
        )
        SELECT *, (n_chars >= 10 AND n_chars <= 10000 AND n_tokens >= 5
                   AND n_alpha * 2 > n_chars
                   AND n_punct * 5 <= n_chars
                   AND n_chars >= n_tokens * 2 AND n_chars <= n_tokens * 21)
                  AS quality_keep
        FROM base
    """


def lang_scores(text: Column) -> list[Column]:
    toks = C.tokens(F.lower(text))

    def _counter(words: list[str]):
        lst = F.lit(words).cast("array<string>")
        return lambda t: F.array_contains(lst, t)

    return [
        F.size(F.filter(toks, _counter(LANG_STOPWORDS[lang]))).cast("long")
         .alias(f"score_{lang}")
        for lang in LANG_ORDER
    ]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language heuristic.

    CJK characters present → ``zh``; otherwise the stopword-hit argmax over
    the per-language lists (ties broken by LANG_ORDER); no hits → ``und``.
    """
    text = F.col(text_col)
    scored = df.select("doc_id", "lang", *lang_scores(text),
                       (F.regexp_count(text, F.lit(CJK_REGEX)) > 0).alias("has_cjk"))
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties → apply last
        sc = F.col(f"score_{lang}")
        cond = sc >= F.greatest(best_score, F.lit(1))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, sc).otherwise(best_score)
    pred = F.when(F.col("has_cjk"), F.lit("zh")).otherwise(best)
    return scored.select("doc_id", "lang",
                         pred.alias("pred_lang"),
                         *[F.col(f"score_{lang}") for lang in LANG_ORDER])


def sql_lang_id(table: str = "documents") -> str:
    tok = C.sql_tokens("lower(text)")
    score_cols = ", ".join(
        "CAST(len(list_filter({tok}, t -> list_contains([{lst}], t))) AS BIGINT)"
        " AS score_{lang}".format(
            tok=tok,
            lst=", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]),
            lang=lang)
        for lang in LANG_ORDER)
    # argmax with >= going right-to-left == earlier language wins ties
    pred = "'und'"
    best = "CAST(0 AS BIGINT)"
    for lang in reversed(LANG_ORDER):
        pred = (f"CASE WHEN score_{lang} >= greatest({best}, 1) "
                f"THEN '{lang}' ELSE {pred} END")
        best = f"greatest({best}, score_{lang})"
    return f"""
        WITH scored AS (
            SELECT doc_id, lang, {score_cols},
                   len(regexp_extract_all(text, '{CJK_REGEX}')) > 0 AS has_cjk
            FROM {table}
        )
        SELECT doc_id, lang,
               CASE WHEN has_cjk THEN 'zh' ELSE {pred} END AS pred_lang,
               {', '.join('score_' + lang for lang in LANG_ORDER)}
        FROM scored
    """


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact-dup key) + 60-bit integer fingerprint (cheap join key)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        C.h60(norm).alias("fp_h60"),
    )


def sql_fingerprint(table: str = "documents") -> str:
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
        SELECT doc_id, md5({norm}) AS fp_md5, {C.sql_h60(norm)} AS fp_h60
        FROM {table}
    """


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

# Salting the id keeps split membership independent of any other h60 use of
# the same key (dedup buckets, fingerprints) — without it, e.g. a modulo
# sample of fp_h60 would correlate with the split label.
SPLIT_SALT = "split:v1|"
SPLIT_BUCKETS = 100


def split_assign(df: DataFrame, id_col: str = "doc_id",
                 weights: tuple[int, int, int] = (80, 10, 10),
                 salt: str = SPLIT_SALT) -> DataFrame:
    """Assign each row to train/val/test by salted hash of its id.

    The label is a pure function of (salt, id): a narrow shuffle-free
    projection that is *stable under corpus growth* — appending documents
    never reassigns existing ones, re-runs are reproducible with no stored
    state, and workers need no coordination. That (not randomness quality)
    is why hash splits replace ``df.randomSplit`` at 100-TB scale:
    randomSplit's per-task RNG reassigns rows whenever partitioning
    changes. Integer percent weights over 100 hash buckets keep the
    assignment exact and oracle-checkable (reference has no analog; this is
    an engine extension for training-data pipelines).
    """
    w_train, w_val, w_test = weights
    if w_train + w_val + w_test != SPLIT_BUCKETS:
        raise ValueError(f"weights must sum to {SPLIT_BUCKETS}: {weights}")
    # explicit string cast: md5 hashes the decimal digits in both engines
    # (DuckDB's `'…' || bigint` varchar-casts the same way)
    bucket = C.h60(F.concat(F.lit(salt),
                            F.col(id_col).cast("string"))) % SPLIT_BUCKETS
    label = (F.when(bucket < w_train, "train")
              .when(bucket < w_train + w_val, "val")
              .otherwise("test"))
    return df.withColumn("split_bucket", bucket).withColumn("split", label)


def sql_split_assign(table: str = "documents", id_col: str = "doc_id",
                     weights: tuple[int, int, int] = (80, 10, 10),
                     salt: str = SPLIT_SALT) -> str:
    w_train, w_val, w_test = weights
    assert w_train + w_val + w_test == SPLIT_BUCKETS
    salted = f"'{salt}' || {id_col}"
    bucket = f"{C.sql_h60(salted)} % {SPLIT_BUCKETS}"
    return f"""
        SELECT {id_col}, {bucket} AS split_bucket,
               CASE WHEN {bucket} < {w_train} THEN 'train'
                    WHEN {bucket} < {w_train + w_val} THEN 'val'
                    ELSE 'test' END AS split
        FROM {table}
    """


def domain_cap(df: DataFrame, group_col: str = "source",
               id_col: str = "doc_id", cap: int = 50,
               salt: str = SPLIT_SALT) -> DataFrame:
    """Cap documents per domain by deterministic hash rank (domain mixing).

    Training corpora cap over-represented domains; taking the first ``cap``
    docs by *salted-hash* order makes the sample (a) uniform within the
    domain, (b) reproducible with no RNG state, and (c) downward-stable —
    growing the corpus can only push docs OUT of the kept set, never
    shuffle the survivors' relative order. One shuffle on ``group_col``;
    at 100 TB a skewed domain bounds the partition at ~cap survivors only
    after the sort, so pair this with AQE skew splitting (the rank is per
    group, not global — no single-partition window).
    """
    from pyspark.sql import Window
    h = C.h60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("rk", F.row_number().over(w).cast("long"))
              .withColumn("kept", F.col("rk") <= cap))


def sql_domain_cap(table: str = "documents", group_col: str = "source",
                   id_col: str = "doc_id", cap: int = 50,
                   salt: str = SPLIT_SALT) -> str:
    h = C.sql_h60(f"'{salt}' || {id_col}")
    return f"""
        SELECT {id_col}, {group_col},
               CAST(ROW_NUMBER() OVER (PARTITION BY {group_col}
                                       ORDER BY {h}, {id_col}) AS BIGINT)
                   AS rk,
               rk <= {cap} AS kept
        FROM {table}
    """


# ---------------------------------------------------------------------------
# Within-document repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

REP_K = 2  # duplicate/top n-gram fractions use word bigrams


def repetition_signals(df: DataFrame, text_col: str = "text",
                       k: int = REP_K) -> DataFrame:
    """Gopher-style within-doc repetition: duplicate-bigram and top-bigram
    permille per document (machine-generated / boilerplate-heavy docs score
    high and get filtered before training).

    Two-level aggregate — partial map-side combine on (doc_id, shingle),
    then a per-doc rollup — so the corpus shuffles once on (doc_id, shingle)
    and once on doc_id, both key-local; no join back to the base table
    (``explode_outer`` keeps sub-k-token docs as a zero row). Integer
    permille only (see ``common.permille``) so the DuckDB oracle hashes
    identically."""
    toks = C.tokens(F.col(text_col))
    base = df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.explode_outer(C.shingles(toks, k)).alias("sh"))
    per = base.groupBy("doc_id", "n_tokens", "sh").agg(
        F.count("sh").alias("c"))
    total = F.sum("c").cast("long")
    return (per.groupBy("doc_id", "n_tokens")
            .agg(total.alias("total_bigrams"),
                 F.max("c").cast("long").alias("top_c"),
                 F.count(F.when(F.col("c") > 0, True)).alias("distinct_sh"))
            .select(
                "doc_id", "n_tokens", "total_bigrams",
                C.permille(F.col("total_bigrams") - F.col("distinct_sh"),
                           F.col("total_bigrams"))
                 .alias("dup_bigram_permille"),
                C.permille(F.col("top_c"), F.col("total_bigrams"))
                 .alias("top_bigram_permille")))


def sql_repetition_signals(table: str = "documents", k: int = REP_K) -> str:
    tok = C.sql_tokens("text")
    shs = C.sql_shingles("tok", k)
    return f"""
        WITH base AS (
            SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
                   {shs} AS shs
            FROM (SELECT doc_id, {tok} AS tok FROM {table})
        ), per AS (
            SELECT doc_id, sh, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(shs) AS sh FROM base)
            GROUP BY doc_id, sh
        ), agg AS (
            SELECT doc_id, SUM(c) AS total, MAX(c) AS top,
                   COUNT(*) AS d
            FROM per GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens,
               CAST(COALESCE(a.total, 0) AS BIGINT) AS total_bigrams,
               {C.sql_permille("a.total - a.d", "a.total")}
                   AS dup_bigram_permille,
               {C.sql_permille("a.top", "a.total")} AS top_bigram_permille
        FROM base b LEFT JOIN agg a USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Per-domain vocabulary statistics
# ---------------------------------------------------------------------------


def vocab_stats(df: DataFrame, group_col: str = "source",
                text_col: str = "text") -> DataFrame:
    """Per-domain corpus stats: doc count, token count, vocabulary size and
    type-token ratio (permille). A domain whose TTR collapses is template
    spam — the corpus-level counterpart of :func:`repetition_signals`.

    One explode + one hash aggregate on ``group_col``; the distinct counts
    partially aggregate map-side, so the shuffle carries (group, token)
    partials, never rows. No join."""
    ex = df.select(
        group_col, "doc_id",
        F.explode_outer(C.tokens(F.col(text_col))).alias("tok"))
    return (ex.groupBy(group_col)
            .agg(F.count_distinct("doc_id").alias("n_docs"),
                 F.count("tok").alias("total_tokens"),
                 F.count_distinct("tok").alias("distinct_tokens"))
            .select(group_col, "n_docs", "total_tokens", "distinct_tokens",
                    C.permille(F.col("distinct_tokens"),
                               F.col("total_tokens")).alias("ttr_permille")))


def sql_vocab_stats(table: str = "documents", group_col: str = "source") -> str:
    tok = C.sql_tokens("text")
    return f"""
        WITH ex AS (
            SELECT {group_col}, doc_id,
                   unnest(CASE WHEN len(tok) = 0
                               THEN [CAST(NULL AS VARCHAR)] ELSE tok END)
                       AS tok
            FROM (SELECT {group_col}, doc_id, {tok} AS tok FROM {table})
        )
        SELECT {group_col},
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(tok) AS BIGINT) AS total_tokens,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS distinct_tokens,
               {C.sql_permille("COUNT(DISTINCT tok)", "COUNT(tok)")}
                   AS ttr_permille
        FROM ex GROUP BY {group_col}
    """


# ---------------------------------------------------------------------------
# PII scan (regex classes over a free-text column)
# ---------------------------------------------------------------------------

# Patterns constrained to the syntax intersection of java.util.regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround, ASCII classes only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "ipv4": r"(?:[0-9][0-9]?[0-9]?\.){3}[0-9][0-9]?[0-9]?",
    "digit_run": r"[0-9][0-9]+",
}


def pii_scan(df: DataFrame, group_col: str = "event_type",
             text_col: str = "props") -> DataFrame:
    """Per-group PII-class match counts (emails / IPv4 / digit runs) — the
    scrub-before-training scan. Pure Catalyst ``regexp_count`` projection
    (whole-stage codegen over the scan) feeding ONE hash aggregate; at
    100 TB this is a single narrow pass, no Python, one tiny shuffle."""
    cnts = {n: F.regexp_count(F.col(text_col), F.lit(p))
            for n, p in PII_PATTERNS.items()}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for n in PII_PATTERNS:
        aggs.append(F.sum(cnts[n]).cast("long").alias(f"{n}_matches"))
        aggs.append(F.count(F.when(cnts[n] > 0, True)).cast("long")
                     .alias(f"{n}_rows"))
    return df.groupBy(group_col).agg(*aggs)


def sql_pii_scan(table: str = "events", group_col: str = "event_type",
                 text_col: str = "props") -> str:
    cols = []
    for n, p in PII_PATTERNS.items():
        c = f"len(regexp_extract_all({text_col}, '{p}'))"
        cols.append(f"CAST(SUM({c}) AS BIGINT) AS {n}_matches")
        cols.append(
            f"CAST(COUNT(CASE WHEN {c} > 0 THEN 1 END) AS BIGINT)"
            f" AS {n}_rows")
    sel = ",\n               ".join(cols)
    return f"""
        SELECT {group_col},
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {sel}
        FROM {table} GROUP BY {group_col}
    """


# ---------------------------------------------------------------------------
# KMV distinct sketch (deterministic approximate count-distinct)
# ---------------------------------------------------------------------------

KMV_K = 64  # sketch size; relative error ~ 1/sqrt(k-2) ~ 13%


def kmv_distinct(df: DataFrame, group_col: str = "source",
                 text_col: str = "text", k: int = KMV_K) -> DataFrame:
    """Per-group distinct-token estimate via a k-minimum-values sketch over
    the deterministic 60-bit hash: est = (k-1) * 2^60 / h_k where h_k is the
    k-th smallest distinct hash (exact count when the group has < k values).

    Unlike HLL (`approx_count_distinct`), KMV on ``h60`` is cross-engine
    deterministic, so it oracle-checks. The sketch is mergeable — union two
    groups' k-min sets and re-take the k smallest — which is what makes it
    the 100-TB shape: per-partition top-k heaps, then a k-value-per-group
    merge; the shuffle carries k longs per group, never the token set. This
    sandbox form computes the exact distinct count alongside (for the
    err_permille column), which dominates the cost — drop ``n_exact`` at
    scale and only the sketch shuffle remains.

    The estimate divides in DOUBLE ((k-1)*2^60 overflows BIGINT for k > 9;
    the numerator is exactly representable, int64→double rounding of h_k is
    IEEE round-to-nearest in both engines, division is IEEE — so the floor
    is identical bit-for-bit)."""
    hashes = (df.select(group_col,
                        F.explode(C.tokens(F.col(text_col))).alias("tok"))
                .select(group_col, C.h60(F.col("tok")).alias("h"))
                .distinct())
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    kth = (ranked.filter(F.col("rn") == k)
                 .select(group_col, F.col("h").alias("h_k")))
    exact = (hashes.groupBy(group_col)
                   .agg(F.count(F.lit(1)).alias("n_exact")))
    num = float((k - 1) * (1 << 60))
    est = F.when(F.col("h_k").isNotNull(),
                 F.floor(F.lit(num) / F.col("h_k").cast("double")))
    return (exact.join(kth, group_col, "left")
            .select(group_col, "n_exact",
                    F.coalesce("h_k", F.lit(0)).alias("h_k"),
                    F.coalesce(est, F.col("n_exact")).cast("long")
                     .alias("n_est"))
            .withColumn(
                "err_permille",
                C.permille(F.abs(F.col("n_est") - F.col("n_exact")),
                           F.col("n_exact"))))


def sql_kmv_distinct(table: str = "documents", group_col: str = "source",
                     k: int = KMV_K) -> str:
    tok = C.sql_tokens("text")
    h = C.sql_h60("tok")
    num = (k - 1) * (1 << 60)
    return f"""
        WITH hashes AS (
            SELECT DISTINCT {group_col}, {h} AS h
            FROM (SELECT {group_col}, unnest({tok}) AS tok FROM {table})
        ), ranked AS (
            SELECT {group_col}, h,
                   ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY h)
                       AS rn
            FROM hashes
        ), kth AS (
            SELECT {group_col}, h AS h_k FROM ranked WHERE rn = {k}
        ), exact AS (
            SELECT {group_col}, COUNT(*) AS n_exact
            FROM ranked GROUP BY {group_col}
        )
        SELECT e.{group_col},
               CAST(e.n_exact AS BIGINT) AS n_exact,
               CAST(COALESCE(t.h_k, 0) AS BIGINT) AS h_k,
               CAST(COALESCE(FLOOR({num} / CAST(t.h_k AS DOUBLE)),
                             e.n_exact) AS BIGINT) AS n_est,
               {C.sql_permille(
                   "ABS(CAST(COALESCE(FLOOR(" + str(num)
                   + " / CAST(t.h_k AS DOUBLE)), e.n_exact) AS BIGINT)"
                   " - e.n_exact)", "e.n_exact")} AS err_permille
        FROM exact e LEFT JOIN kth t USING ({group_col})
    """


# ---------------------------------------------------------------------------
# Per-group top-k terms
# ---------------------------------------------------------------------------

TOP_TERMS_K = 5


def top_terms_per_source(df: DataFrame, group_col: str = "source",
                         text_col: str = "text",
                         k: int = TOP_TERMS_K) -> DataFrame:
    """Top-k tokens per group by count (ties broken lexicographically).

    One (group, token) hash aggregate with map-side partial combine — the
    shuffle carries count partials, never rows — then a rank window
    partitioned by group. The window sorts each group's vocabulary;
    vocabulary (not corpus) sized, and at 100 TB a `HAVING count >= t`
    pre-filter bounds it further without changing the top-k set (any t below
    the k-th count)."""
    counts = (df.select(group_col,
                        F.explode(C.tokens(F.col(text_col))).alias("token"))
                .groupBy(group_col, "token")
                .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(),
                                              F.col("token"))
    return (counts.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k))


def sql_top_terms_per_source(table: str = "documents",
                             group_col: str = "source",
                             k: int = TOP_TERMS_K) -> str:
    tok = C.sql_tokens("text")
    return f"""
        WITH counts AS (
            SELECT {group_col}, tok AS token, COUNT(*) AS n
            FROM (SELECT {group_col}, unnest({tok}) AS tok FROM {table})
            GROUP BY {group_col}, tok
        )
        SELECT {group_col}, token, CAST(n AS BIGINT) AS n,
               CAST(ROW_NUMBER() OVER (PARTITION BY {group_col}
                    ORDER BY n DESC, token) AS BIGINT) AS rank
        FROM counts
        QUALIFY rank <= {k}
    """


# ---------------------------------------------------------------------------
# Token-rarity quality signal (corpus-frequency-based gibberish screen)
# ---------------------------------------------------------------------------

RARE_MAX_COUNT = 2  # a token occurring <= this many times corpus-wide is rare


def token_rarity(df: DataFrame, text_col: str = "text",
                 rare_max: int = RARE_MAX_COUNT) -> DataFrame:
    """Per-document rare-token fraction: tokens whose CORPUS-WIDE count is
    <= ``rare_max`` are rare; a document dominated by them is gibberish /
    OCR noise / mangled encoding (the corpus-level complement of the
    within-doc :func:`repetition_signals`).

    Shape: one (token) hash aggregate builds the vocabulary counts
    (map-side partials — the shuffle carries (token, count), never rows),
    then the exploded doc-tokens join the vocabulary on token and roll up
    per doc. The vocabulary is corpus-frequency sized (Zipf: far smaller
    than the corpus) — broadcast it when it fits, bucket both sides on
    token when it doesn't. Empty docs survive with zero counts
    (explode_outer + null-token guard)."""
    ex = df.select("doc_id",
                   F.explode_outer(C.tokens(F.col(text_col))).alias("tok"))
    vocab = (ex.filter(F.col("tok").isNotNull())
               .groupBy("tok").agg(F.count(F.lit(1)).alias("corpus_n")))
    joined = ex.join(vocab, "tok", "left")
    return (joined.groupBy("doc_id")
            .agg(F.count("tok").alias("n_tokens"),
                 F.count(F.when(F.col("corpus_n") <= rare_max, True))
                  .alias("n_rare"))
            .select("doc_id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("n_rare").cast("long").alias("n_rare"),
                    C.permille(F.col("n_rare"), F.col("n_tokens"))
                     .alias("rare_permille")))


def sql_token_rarity(table: str = "documents",
                     rare_max: int = RARE_MAX_COUNT) -> str:
    tok = C.sql_tokens("text")
    return f"""
        WITH ex AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(tok) = 0
                               THEN [CAST(NULL AS VARCHAR)] ELSE tok END)
                       AS tok
            FROM (SELECT doc_id, {tok} AS tok FROM {table})
        ), vocab AS (
            SELECT tok, COUNT(*) AS corpus_n
            FROM ex WHERE tok IS NOT NULL GROUP BY tok
        )
        SELECT e.doc_id,
               CAST(COUNT(e.tok) AS BIGINT) AS n_tokens,
               CAST(COUNT(CASE WHEN v.corpus_n <= {rare_max} THEN 1 END)
                    AS BIGINT) AS n_rare,
               {C.sql_permille(
                   "COUNT(CASE WHEN v.corpus_n <= " + str(rare_max)
                   + " THEN 1 END)", "COUNT(e.tok)")} AS rare_permille
        FROM ex e LEFT JOIN vocab v USING (tok)
        GROUP BY e.doc_id
    """
