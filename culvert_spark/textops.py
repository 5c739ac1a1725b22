"""North-star text / dedup / similarity operators over ``documents`` and
``embeddings`` (SURVEY.md §2 Tier B "build menu"; the reference engine has no
text surface at all — these are the LLM-data-pipeline operators the engine
adds on top of reference parity).

Design rules (same as queries.py): everything is a deterministic pure
function of the input, expressed with JVM-side built-in functions (no Python
UDFs in any hot path), with a DuckDB oracle that performs the *same*
computation. Hash functions are md5-based because md5 is bit-identical across
Spark and DuckDB; float reductions use a fixed left-to-right summation order
(Spark ``aggregate`` fold == SQL left-associative ``+`` chain) so doubles are
bit-identical too.

Scale notes (100 TB):
- MinHash/LSH and SimHash hash a *vocabulary* dimension table (distinct
  tokens), then broadcast-join it back — token hashing cost is O(|vocab|),
  not O(corpus).
- Pairwise ops (jaccard, near-dup) are always bucketed (same (lang, source)
  bucket / same LSH band / same hyperplane bucket) so the candidate set is
  bounded; nothing materializes the full n² pair space except the
  explicitly-labelled brute-force baseline.
- All shuffles key on doc_id / token / band — no skewed single-key shuffles.
"""

from __future__ import annotations

import hashlib
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from culvert_spark.queries import QUERIES, ORACLE, cexpr, register, spread, t  # noqa: F401

# ---------------------------------------------------------------------------
# Shared expression generators (Spark SQL dialect vs DuckDB dialect)
# ---------------------------------------------------------------------------

#: 60-bit integer from the first 15 hex chars of an ALREADY-COMPUTED md5
#: hex string (e.g. a HOF lambda variable or a lateral column alias) —
#: factored so callers compute md5 once and the polynomial reads the
#: bound name 15 times, instead of inlining 15 md5 calls.
def _hex60_of_hash_spark(h: str) -> str:
    terms = [
        f"shiftleft(cast(instr('0123456789abcdef', "
        f"substring({h}, {p + 1}, 1)) as bigint) - 1, {4 * p})"
        for p in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def _hex60_of_hash_duck(h: str) -> str:
    terms = [
        f"((instr('0123456789abcdef', substr({h}, {p + 1}, 1)) - 1)"
        f"::BIGINT << {4 * p})"
        for p in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


# 60-bit integer from the first 15 hex chars of md5(expr) — DuckDB has no
# conv(), so both sides evaluate the same digit polynomial. Delegates to
# the _hex60_of_hash_* builders above; the generated SQL text is
# byte-identical to the pre-round-8 inline form, so every registered
# oracle using these is unchanged.
def _hex60_spark(expr: str) -> str:
    return _hex60_of_hash_spark(f"md5({expr})")


def _hex60_duck(expr: str) -> str:
    return _hex60_of_hash_duck(f"md5({expr})")


# Dot product of two 64-dim float vectors in double, fixed left-to-right
# order. `a`/`b` are table aliases; Spark arrays are 0-based, DuckDB 1-based.
DIM = 64


def _dot_spark(a: str, b: str) -> str:
    terms = [
        f"cast({a}[{i}] as double) * cast({b}[{i}] as double)" for i in range(DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _dot_duck(a: str, b: str) -> str:
    terms = [
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)"
        for i in range(DIM)
    ]
    return "(" + " + ".join(terms) + ")"


TOK_SPARK = r"split(text, '\\s+')"
TOK_DUCK = r"regexp_split_to_array(text, '\s+')"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "t_text_stats",
    f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
           CAST(SUM(len({TOK_DUCK})) AS BIGINT) AS total_tokens,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def t_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language (token counts are whitespace-split,
    all integer-exact)."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), r"\s+"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
            F.sum(n_tokens).alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@register(
    "t_quality_scores",
    f"""
    WITH q AS (
      SELECT doc_id,
             length(text) AS len_chars,
             len({TOK_DUCK}) AS n_tokens,
             len(filter({TOK_DUCK}, x -> x = 'a' OR x = 'the')) AS n_stop
      FROM documents)
    SELECT doc_id, len_chars, n_tokens,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           ROUND(CAST(len_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
           ROUND(CAST(len_chars - 10 * n_stop AS DOUBLE) / n_tokens, 6) AS quality_score
    FROM q
    ORDER BY doc_id
    """,
)
def t_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: length, stopword ratio, avg token
    length, and a combined score — all rational arithmetic on exact integers
    (deterministic in double)."""
    d = t(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.expr(r"size(split(text, '\\s+'))").alias("n_tokens"),
        F.expr(
            r"size(filter(split(text, '\\s+'), x -> x = 'a' OR x = 'the'))"
        ).alias("n_stop"),
    )
    return q.select(
        "doc_id",
        "len_chars",
        "n_tokens",
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 6).alias(
            "stop_ratio"
        ),
        F.round(
            F.col("len_chars").cast("double") / F.col("n_tokens"), 6
        ).alias("avg_token_len"),
        F.round(
            (F.col("len_chars") - 10 * F.col("n_stop")).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("quality_score"),
    ).orderBy("doc_id")


@register(
    "t_token_top20",
    f"""
    SELECT u.tok AS token, COUNT(*) AS n
    FROM documents, UNNEST({TOK_DUCK}) AS u(tok)
    GROUP BY u.tok
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def t_token_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency top-20 (explode → count → total-order top-k).
    At scale this is the classic word-count: map-side partial aggregation
    keeps the shuffle at |vocab|, not |corpus|."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "t_bpe_token_estimate",
    f"""
    SELECT lang,
           CAST(SUM(len({TOK_DUCK})) AS BIGINT) AS ws_tokens,
           CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_est_tokens,
           ROUND(CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS DOUBLE)
                 / SUM(len({TOK_DUCK})), 6) AS bpe_per_word
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def t_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and the chars/4 BPE-ish
    estimator used for LLM budget planning."""
    d = t(spark, sf_dir, "documents")
    ws = F.expr(r"size(split(text, '\\s+'))")
    bpe = F.ceil(F.length("text") / 4.0).cast("bigint")
    return (
        d.groupBy("lang")
        .agg(
            F.sum(ws).alias("ws_tokens"),
            F.sum(bpe).alias("bpe_est_tokens"),
            F.round(
                F.sum(bpe).cast("double") / F.sum(ws), 6
            ).alias("bpe_per_word"),
        )
        .orderBy("lang")
    )


_KW = {
    "de": ("hash", "row", "batch"),
    "en": ("table", "order", "group"),
    "es": ("slow", "merge", "vector"),
    "fr": ("scan", "data", "small"),
    "zh": ("join", "window", "line"),
}
_LANGS = sorted(_KW)


@register(
    "t_lang_id",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             {', '.join(
        "len(filter(" + TOK_DUCK + ", x -> x IN ("
        + ", ".join("'" + w + "'" for w in _KW[lg]) + f"))) AS s_{lg}"
        for lg in _LANGS
    )}
      FROM documents)
    SELECT doc_id, lang,
           CASE
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END AS pred_lang,
           (lang = CASE
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END) AS correct
    FROM s
    ORDER BY doc_id
    """,
)
def t_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-profile language identification: per-language keyword-hit
    scores, argmax with deterministic tie-break (lexicographic language
    order). One scan, no shuffle except the final sort."""
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        *[
            F.expr(
                r"size(filter(split(text, '\\s+'), x -> x IN ("
                + ", ".join(f"'{w}'" for w in _KW[lg])
                + ")))"
            ).alias(f"s_{lg}")
            for lg in _LANGS
        ],
    )
    pred = (
        F.when(
            (F.col("s_de") >= F.col("s_en"))
            & (F.col("s_de") >= F.col("s_es"))
            & (F.col("s_de") >= F.col("s_fr"))
            & (F.col("s_de") >= F.col("s_zh")),
            F.lit("de"),
        )
        .when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_zh")),
            F.lit("en"),
        )
        .when(
            (F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") >= F.col("s_zh")),
            F.lit("es"),
        )
        .when(F.col("s_fr") >= F.col("s_zh"), F.lit("fr"))
        .otherwise(F.lit("zh"))
    )
    return (
        scored.withColumn("pred_lang", pred)
        .withColumn("correct", F.col("lang") == F.col("pred_lang"))
        .select("doc_id", "lang", "pred_lang", "correct")
        .orderBy("doc_id")
    )


@register(
    "t_tfidf_top3",
    f"""
    WITH toks AS (
      SELECT doc_id, u.tok
      FROM documents, UNNEST({TOK_DUCK}) AS u(tok)
      WHERE doc_id < 40),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    df_t AS (SELECT tok, COUNT(DISTINCT doc_id) AS dft FROM toks GROUP BY tok),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(tf.tf * ln(CAST(n_docs AS DOUBLE) / dft), 6) AS tfidf
      FROM tf JOIN df_t ON tf.tok = df_t.tok, n)
    SELECT doc_id, tok, tfidf, rnk
    FROM (SELECT doc_id, tok, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, tok) AS rnk
          FROM scored)
    WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
)
def t_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency x ln(N/doc-frequency), top-3 terms per doc
    (restricted to doc_id < 40 to keep the oracle output small). The df_t
    side is |vocab|-sized and broadcast; rounding to 6 absorbs libm ulp
    differences between engines."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.groupBy("tok").agg(
        F.count_distinct(F.col("doc_id")).alias("dft")
    )
    n = toks.agg(F.count_distinct(F.col("doc_id")).alias("n_docs"))
    scored = (
        tf.join(broadcast(df_t), "tok")
        .crossJoin(broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("dft")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


_BM25_TERMS = ("hash", "join", "vector")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "t_bm25_topk",
    f"""
    WITH lens AS (
      SELECT doc_id, len({TOK_DUCK}) AS dl FROM documents),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
      FROM lens),
    toks AS (
      SELECT doc_id, u.tok
      FROM documents, UNNEST({TOK_DUCK}) AS u(tok)
      WHERE u.tok IN ('hash', 'join', 'vector')),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    per_term AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                     + {_BM25_B} * dl / avgdl)),
               10) AS DECIMAL(28,10)) AS ts
      FROM tf
      JOIN dft ON tf.tok = dft.tok
      JOIN lens ON tf.doc_id = lens.doc_id, stats),
    scored AS (
      SELECT doc_id, ROUND(CAST(SUM(ts) AS DOUBLE), 6) AS bm25,
             CAST(COUNT(*) AS INT) AS n_terms_hit
      FROM per_term GROUP BY doc_id)
    SELECT doc_id, bm25, n_terms_hit, rnk
    FROM (SELECT doc_id, bm25, n_terms_hit,
                 ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= 20
    ORDER BY rnk
    """,
)
def t_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson/Sparck-Jones, the Lucene
    ``ln(1+(N-df+0.5)/(df+0.5))`` IDF form, k1=1.2 b=0.75): top-20
    documents for a fixed 3-term query — the relevance-scoring primitive
    a training-data pipeline uses to mine topical subsets or to rank
    candidate documents against a quality probe query.

    Determinism: each doc-term partial score is rounded to 10 places and
    summed as DECIMAL(28,10) (order-free exact addition across the ≤3
    terms), then the doc score rounds to 6 — the house pattern for
    cross-engine float parity under any partitioning.

    Scale shape: the explode is filtered to the query terms immediately
    (Catalyst pushes ``tok IN (...)`` into the Generate's output filter),
    so the per-term table is O(matching postings), not O(corpus tokens);
    doc lengths are a narrow map; df and the (N, avgdl) scalars broadcast.
    Per-query cost at 100 TB is one filtered scan — the batch equivalent
    of an inverted-index postings walk."""
    d = t(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id", F.size(F.expr(TOK_SPARK)).alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    toks = d.select(
        "doc_id", F.explode(F.expr(TOK_SPARK)).alias("tok")
    ).filter(F.col("tok").isin(*_BM25_TERMS))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dft = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    k1, b = _BM25_K1, _BM25_B
    term_score = F.round(
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        ),
        10,
    ).cast("decimal(28,10)")
    per_term = (
        tf.join(broadcast(dft), "tok")
        .join(lens, "doc_id")
        .crossJoin(broadcast(stats))
        .select("doc_id", term_score.alias("ts"))
    )
    scored = per_term.groupBy("doc_id").agg(
        F.round(F.sum("ts").cast("double"), 6).alias("bm25"),
        F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "bm25", "n_terms_hit", "rnk")
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# Fingerprinting & exact dedup
# ---------------------------------------------------------------------------


@register(
    "t_doc_fingerprint",
    """
    SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 8) AS fp8
    FROM documents
    ORDER BY doc_id
    LIMIT 50
    """,
)
def t_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting (md5 of full text) — the primitive under
    exact dedup at scale (hash once, compare 16 bytes)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(F.col("text").cast("binary")).alias("fp"),
            F.substring(F.md5(F.col("text").cast("binary")), 1, 8).alias("fp8"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


@register(
    "t_exact_dedup_stats",
    """
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
    FROM documents
    """,
)
def t_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate accounting via content hash (the groupBy-hash dedup;
    distinct on the 16-byte hash, never on the full text — at 100 TB you
    shuffle hashes, not documents)."""
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(fp).alias("n_distinct"),
        (F.count(F.lit(1)) - F.count_distinct(fp)).alias("n_exact_dups"),
    )


@register(
    "t_exact_dedup_groups",
    """
    SELECT lang, n_chars, MIN(doc_id) AS rep_doc_id, COUNT(*) AS group_size
    FROM documents
    GROUP BY lang, n_chars
    HAVING COUNT(*) > 1
    ORDER BY lang, n_chars
    """,
)
def t_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based dedup with a deterministic representative (min doc_id per
    group) — the canonical 'keep one row per key' pattern (dropDuplicates
    picks an arbitrary row; this doesn't)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "n_chars")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
        .orderBy("lang", "n_chars")
    )


@register(
    "t_train_test_split",
    """
    WITH tagged AS (
      SELECT lang,
             CASE
               WHEN instr('0123456789abcdef',
                          substr(md5(doc_id::VARCHAR || '|split42'), 1, 1)) - 1 < 13
                 THEN 'train'
               WHEN instr('0123456789abcdef',
                          substr(md5(doc_id::VARCHAR || '|split42'), 1, 1)) - 1 < 14
                 THEN 'valid'
               ELSE 'test'
             END AS split
      FROM documents)
    SELECT lang, split, COUNT(*) AS n
    FROM tagged
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def t_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (~81/6/13%) from the first
    hex digit of md5(doc_id || salt) — the split every row lands in is a
    pure function of its id, so it is stable across runs, engines, and
    repartitioning (rand()-based sampleBy is none of those). The salt keys
    the split version."""
    d = t(spark, sf_dir, "documents")
    digit = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit("|split42"))
                    .cast("binary")
                ),
                1,
                1,
            ),
        )
        - 1
    )
    split = (
        F.when(digit < 13, "train").when(digit < 14, "valid").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "split")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard / MinHash LSH / SimHash near-dup
# ---------------------------------------------------------------------------

_SHINGLES_DUCK = f"""
      SELECT doc_id, lang, source, u.sh
      FROM (SELECT doc_id, lang, source,
                   list_distinct(CASE WHEN len({TOK_DUCK}) >= 3 THEN
                     list_transform(generate_series(1, len({TOK_DUCK}) - 2),
                       i -> {TOK_DUCK}[i] || ' ' || {TOK_DUCK}[i+1] || ' ' || {TOK_DUCK}[i+2])
                     ELSE [] END) AS shs
            FROM documents),
           UNNEST(shs) AS u(sh)
"""

# Operates on a precomputed `toks` array column — tokenize ONCE per doc,
# then O(1) array indexing per shingle (tokenizing inside the lambda would
# re-split the full text per element: quadratic per document).
_SHINGLES_SPARK = r"""
    array_distinct(
      CASE WHEN size(toks) >= 3 THEN
        transform(sequence(0, size(toks) - 3),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
      ELSE array() END)
"""


def _with_shingles(d: DataFrame, *keep: str) -> DataFrame:
    """doc_id (+ keep cols) with exploded distinct word-3-gram shingles."""
    return (
        spread(d.select("doc_id", *keep, "text"))
        .withColumn("toks", F.split(F.col("text"), r"\s+"))
        .select("doc_id", *keep, F.explode(F.expr(_SHINGLES_SPARK)).alias("sh"))
    )


@register(
    "t_ngram_jaccard_pairs",
    f"""
    WITH sh AS ({_SHINGLES_DUCK}),
    counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b
        ON a.sh = b.sh AND a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, n_common,
           ROUND(CAST(n_common AS DOUBLE)
                 / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    ORDER BY doc_a, doc_b
    """,
)
def t_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard similarity between documents of the same
    (lang, source) bucket. The join key is the *shingle* (plus bucket), so
    candidate pairs are generated only where an actual shingle collision
    exists — never the full n² pair space."""
    d = t(spark, sf_dir, "documents")
    sh = _with_shingles(d, "lang", "source")
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a")
    )
    cb = counts.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b")
    )
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


_N_HASHES = 12
_BAND_SIZE = 3  # 4 bands of 3 minhashes


@register(
    "t_minhash_lsh_pairs",
    f"""
    WITH sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES_DUCK})),
    hx AS (
      SELECT doc_id, h.i,
             MIN(md5(h.i::VARCHAR || '|' || sh)) AS mh
      FROM sh, (SELECT UNNEST(generate_series(0, {_N_HASHES - 1})) AS i) h
      GROUP BY doc_id, h.i),
    sig AS (
      SELECT doc_id, list(mh ORDER BY i) AS mhs FROM hx GROUP BY doc_id),
    bands AS (
      SELECT doc_id, i // {_BAND_SIZE} AS band,
             md5(string_agg(mh, ',' ORDER BY i)) AS bsig
      FROM hx GROUP BY doc_id, i // {_BAND_SIZE}),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS shared_bands
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT c.doc_a, c.doc_b, c.shared_bands,
           ROUND(CAST(len(list_filter(range({_N_HASHES}),
                     k -> sa.mhs[k + 1] = sb.mhs[k + 1])) AS DOUBLE)
                 / {_N_HASHES}, 6) AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    ORDER BY c.doc_a, c.doc_b
    """,
)
def t_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate candidates over word-3-gram shingle sets:
    12 md5-derived min-hashes per doc, banded 4x3; docs sharing any band
    signature become candidate pairs; est_jaccard = fraction of equal
    minhashes.

    Scale path (shingle → minhash → band → bucket-join):
    - Shingles (not raw tokens) keep unrelated docs' Jaccard near zero, so
      band collisions track *real* near-duplicates instead of shared
      vocabulary — candidate count stays O(dups), never O(n²).
    - All 12 minhashes come from ONE grouped aggregation over the exploded
      shingle table (12 min() columns), so the shuffle is |shingles|, not
      12x|shingles|.
    - The candidate join keys on (band, signature) — an equi-join on a
      16-byte key; est_jaccard compares the two 12-slot signature arrays
      directly (no second explode).
    - Mega-bucket guard: buckets holding more than ``_BUCKET_CAP`` docs are
      dropped before the pair join (see the constant's docstring), so one
      corpus-wide boilerplate signature can never make a reduce task
      quadratic. The shipped SFs never trigger the cap, so the (uncapped)
      DuckDB oracle remains an exact twin."""
    _, cand = _minhash_sigs_and_cands(spark, sf_dir)
    # SQL-string expression: one py4j round trip instead of ~30 (driver-
    # side construction runs inside the bench's timed region — guide §5).
    # Round 14: cexpr'd (selectExpr re-parsed per build) and the plain
    # column names passed as memoized Columns.
    n_eq = (
        "size(filter(zip_with(mhs_a, mhs_b, (x, y) -> x = y), v -> v))"
    )
    return cand.select(
        cexpr("doc_a"),
        cexpr("doc_b"),
        cexpr("shared_bands"),
        cexpr(
            f"round(cast({n_eq} as double) / {_N_HASHES}, 6) AS est_jaccard"
        ),
    ).orderBy(cexpr("doc_a"), cexpr("doc_b"))


def _reliable_ckpt(spark: SparkSession):
    """Return a ``DataFrame -> DataFrame`` reliable-checkpoint function.

    Sets the SparkContext checkpoint dir on first use: from
    ``CULVERT_CHECKPOINT_DIR`` when given (on a cluster this should be a
    durable shared filesystem — HDFS/object store — so checkpointed state
    survives executor loss), else a process-temp directory (local-mode
    default). ``df.checkpoint()`` then materializes to files and cuts
    lineage — unlike ``localCheckpoint``, whose executor-resident blocks
    die with the executor."""
    import os as _os
    import tempfile as _tempfile

    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(
            _os.environ.get(
                "CULVERT_CHECKPOINT_DIR",
                _tempfile.mkdtemp(prefix="culvert_ckpt_"),
            )
        )
    return lambda df: df.checkpoint()


#: Mega-bucket cap: max docs allowed in one (band, bsig) LSH bucket before
#: the bucket is dropped from candidate generation.  A boilerplate cluster
#: shared by 10⁷ docs would otherwise make a single bucket quadratic
#: (10¹⁴ candidate pairs from one reduce task).  Buckets at or under the
#: cap are verified exactly downstream, so for any corpus whose real
#: duplicate clusters are smaller than the cap the output is IDENTICAL to
#: the uncapped pipeline — the shipped test SFs never come close, which is
#: why the DuckDB oracle (which has no cap) still hash-matches.  At 100 TB
#: a dropped bucket means "this boilerplate is so common that pairwise
#: dedup is the wrong tool" — route those docs to exact-hash dedup
#: (t_exact_dedup_groups) instead of enumerating O(cap²) pairs.
_BUCKET_CAP = 1000


def _minhash_sigs_and_cands(
    spark: SparkSession, sf_dir: str, bucket_cap: int = _BUCKET_CAP
):
    """Shared MinHash pipeline over the documents table:
    (signatures, LSH candidate pairs)."""
    return _minhash_from_docs(t(spark, sf_dir, "documents"), bucket_cap)


def _minhash_from_docs(d: DataFrame, bucket_cap: int = _BUCKET_CAP):
    """MinHash pipeline from any docs DataFrame (doc_id, text, ...):
    (signatures, LSH candidate pairs), with the (band, bsig) mega-bucket
    cap applied before any pair exists.

    The signature table is referenced three times downstream (candidate
    build + doc_a/doc_b joins); its aggregation exchange is identical in
    every reference, so Spark's ReuseExchange/AQE stage reuse serves all
    three from one shuffle write — measured faster than an explicit
    persist (which serializes the pipeline behind a cache-materialization
    barrier and pays the memory-store write).

    Candidates come from bucket assembly, not a self-join: group the
    (band, bsig) table once, ``collect_list`` the member docs (bounded by
    ``bucket_cap`` — the size filter IS the mega-bucket guard, applied to
    the array before any pair is enumerated), and explode each bucket's
    a<b pairs. One shuffle on the bucket key, pair volume bounded by
    cap² per bucket by construction."""
    # Expressions are built as SQL strings (string formatting is free;
    # each F.expr is ONE py4j round trip) instead of nested Column calls
    # (one round trip PER operator): query construction runs inside the
    # bench's timed region, and this function was its single heaviest
    # site — ~1600 py4j round trips, ~300 ms per build (guide §5, the
    # driver should do almost no work). Expression-identical: the SQL
    # parser yields the same Catalyst operators the Column DSL did
    # (verified by normalized optimized-plan diff + oracle hash).
    sh = _with_shingles(d)
    mh_cols = [
        cexpr(f"min(md5(cast(concat('{i}|', sh) as binary))) AS mh_{i}")
        for i in range(_N_HASHES)
    ]
    mhs_all = ", ".join(f"mh_{i}" for i in range(_N_HASHES))
    sig = (
        sh.groupBy(cexpr("doc_id"))
        .agg(*mh_cols)
        .withColumn("mhs", cexpr(f"array({mhs_all})"))
    )
    n_bands = _N_HASHES // _BAND_SIZE
    band_sigs = "array(%s)" % ", ".join(
        "md5(cast(concat_ws(',', %s) as binary))"
        % ", ".join(
            f"mh_{j}" for j in range(i * _BAND_SIZE, (i + 1) * _BAND_SIZE)
        )
        for i in range(n_bands)
    )
    # Bucket members carry their full signature array through the ONE
    # LSH shuffle, so candidate pairs emerge with (mhs_a, mhs_b) attached
    # and est_jaccard needs NO signature joins afterwards — the same
    # carry-the-signature layout Spark ML's MinHashLSH uses. first() is
    # exact: every row of a pair group carries the same signatures.
    bands = sig.select(
        cexpr("struct(doc_id, mhs) AS dm"),
        cexpr(f"posexplode({band_sigs}) AS (band, bsig)"),
    )
    buckets = (
        bands.groupBy(cexpr("band"), cexpr("bsig"))
        .agg(cexpr("sort_array(collect_list(dm)) AS ds"))
        .where(cexpr(f"size(ds) >= 2 AND size(ds) <= {bucket_cap}"))
    )
    pairs = buckets.select(
        cexpr(
            "explode(flatten(transform(ds, (p, i) ->"
            " transform(slice(ds, i + 2, size(ds)),"
            " q -> named_struct('a', p, 'b', q))))) AS pr"
        )
    )
    cand = pairs.groupBy(
        cexpr("pr.a.doc_id AS doc_a"), cexpr("pr.b.doc_id AS doc_b")
    ).agg(
        cexpr("count(1) AS shared_bands"),
        cexpr("first(pr.a.mhs) AS mhs_a"),
        cexpr("first(pr.b.mhs) AS mhs_b"),
    )
    return sig, cand


# DuckDB twin of _minhash_sigs_and_cands' candidate pairs. RECURSIVE is
# declared up front so consumers may append recursive CTEs.
_CAND_DUCK = f"""
      WITH RECURSIVE sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES_DUCK})),
      hx AS (
        SELECT doc_id, h.i,
               MIN(md5(h.i::VARCHAR || '|' || sh)) AS mh
        FROM sh, (SELECT UNNEST(generate_series(0, {_N_HASHES - 1})) AS i) h
        GROUP BY doc_id, h.i),
      bands AS (
        SELECT doc_id, i // {_BAND_SIZE} AS band,
               md5(string_agg(mh, ',' ORDER BY i)) AS bsig
        FROM hx GROUP BY doc_id, i // {_BAND_SIZE}),
      cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
"""


@register(
    "t_dedup_clusters",
    f"""
    {_CAND_DUCK},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, lbl) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc_id),
    comp AS (SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id)
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           (c.doc_id = c.cluster_id) AS is_canonical
    FROM comp c
    JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM comp GROUP BY cluster_id) s USING (cluster_id)
    ORDER BY c.cluster_id, c.doc_id
    """,
)
def t_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the MinHash-LSH
    candidate graph via iterative min-label propagation, with the smallest
    doc_id as the canonical representative — the step that turns a pair
    list into actual keep/drop dedup decisions.

    Iterative via :func:`min_label_components_doubling` (round-8 swap,
    closing round 7's one flagged scale edge): POINTER DOUBLING — each
    round a node takes the least of (its label, its label's label, its
    neighbors' min label), so convergence is O(log diameter); the
    15-round cap covers any component diameter up to 8192 and the helper
    RAISES instead of returning partially-propagated labels if the
    fixpoint is not reached. The plain neighbor-min loop this replaces
    needed a round PER HOP and silently split any candidate chain with
    diameter > 15 (template-drift boilerplate builds exactly that at
    corpus scale). The oracle is a DuckDB
    recursive CTE computing min-reachable-label per node, which is the same
    fixpoint. Each round shuffles only the candidate-graph nodes (O(dups),
    not O(corpus)); lineage is truncated with RELIABLE checkpoints
    (written to ``CULVERT_CHECKPOINT_DIR``, default a session temp dir) so
    plans don't grow with iterations AND the materialized state survives
    executor loss — ``localCheckpoint`` keeps blocks in executor storage,
    which on a real cluster turns one lost executor into a failed job."""
    ckpt = _reliable_ckpt(spark)
    _, cand = _minhash_sigs_and_cands(spark, sf_dir)
    edges = ckpt(
        cand.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            cand.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )
    comp = min_label_components_doubling(edges, ckpt)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


_SIMHASH_BITS = 60


@register(
    "t_simhash_fingerprint",
    f"""
    WITH toks AS (
      SELECT doc_id, u.tok
      FROM documents, UNNEST({TOK_DUCK}) AS u(tok)),
    vocab AS (
      SELECT tok, {_hex60_duck('tok')} AS h FROM (SELECT DISTINCT tok FROM toks)),
    bits AS (
      SELECT t.doc_id, b.j,
             SUM(CASE WHEN (v.h >> b.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM toks t
      JOIN vocab v ON v.tok = t.tok,
           (SELECT UNNEST(generate_series(0, {_SIMHASH_BITS - 1})) AS j) b
      GROUP BY t.doc_id, b.j)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def t_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (60-bit) document fingerprints, frequency-weighted: each
    token occurrence votes ±1 per bit of its 60-bit md5-derived hash; the
    sign vector is the fingerprint. Near-dups are then hamming-close.

    Scale path: token→hash is computed once on the *vocabulary* (distinct
    tokens) and broadcast-joined back — the expensive hex polynomial runs
    O(|vocab|) times, not O(corpus x 60)."""
    d = t(spark, sf_dir, "documents")
    toks = spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    )
    vocab = toks.select("tok").distinct().withColumn(
        "h", F.expr(_hex60_spark("tok"))
    )
    jdx = spark.range(_SIMHASH_BITS).select(F.col("id").cast("int").alias("j"))
    bits = (
        toks.join(broadcast(vocab), "tok")
        .crossJoin(broadcast(jdx))
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.when(F.expr("(h >> j) & 1 = 1"), 1).otherwise(-1)
            ).alias("s")
        )
    )
    return (
        bits.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), j)")
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------


#: Shared rank oracle for BOTH exact cosine top-3 rows (the JVM
#: expression-chain s_cosine_topk and the Arrow/numpy
#: v_cosine_topk_pandas): the two engines' float summation orders
#: differ only at the ulp level, far inside this corpus's rank
#: margins, and the (cos DESC, neighbor_id) tiebreak makes exact ties
#: engine-independent — so the float-free (query_id, neighbor_id,
#: rank) projection is one contract both implementations must meet.
#: Hoisted verbatim from the round-1 s_cosine_topk registration
#: (byte-identity pinned by tests/test_vectorops.py) so the upgraded
#: vectorized row reuses it instead of restating it.
_COSINE_TOPK_RANK_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    q AS (SELECT vec_id, embedding FROM e WHERE vec_id % 50 = 0
          ORDER BY vec_id LIMIT 1024),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_dot_duck('q.embedding', 'e.embedding')}
             / (sqrt({_dot_duck('q.embedding', 'q.embedding')})
                * sqrt({_dot_duck('e.embedding', 'e.embedding')})) AS cos
      FROM q JOIN e ON e.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, rank
    FROM (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 3
    ORDER BY query_id, rank
    """


@register("s_cosine_topk", _COSINE_TOPK_RANK_ORACLE)
def s_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 neighbors for a bounded query subset
    (vec_id % 50 = 0, deterministically capped at 1024 queries — the cap
    keeps the broadcast side O(bound) instead of O(n/50), so the plan
    survives a corpus 100× larger; at test SFs the cap is not reached and
    the query set is identical to the uncapped definition) — the exact
    ANN baseline. The query set is broadcast against the full vector
    table; the dot product is a fixed-order JVM-side expression chain (no
    UDF). Output is rank-only so float ulps can't affect the hash.

    At 100 TB the same plan holds: broadcast queries x partitioned vectors,
    then a per-query top-k via row_number. For large query sets, switch to
    the LSH-bucketed variant (s_ann_lsh_top1)."""
    e = (
        spread(t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
        # Norm computed ONCE per vector row (not per candidate pair) — at
        # scale this turns 3 x 64-term chains per pair into 1.
        .withColumn(
            "nrm", F.sqrt(cexpr(_dot_spark("embedding", "embedding")))
        )
    )
    q = (
        e.filter(F.col("vec_id") % 50 == 0)
        .orderBy("vec_id")
        .limit(1024)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    pairs = broadcast(q).join(e, F.col("vec_id") != F.col("query_id"))
    dot = cexpr(_dot_spark("qv", "embedding"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


@register(
    "s_embedding_near_dup",
    f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_dot_duck('a.embedding', 'b.embedding')}
                 / (sqrt({_dot_duck('a.embedding', 'a.embedding')})
                    * sqrt({_dot_duck('b.embedding', 'b.embedding')})), 4) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_dot_duck('a.embedding', 'b.embedding')}
          / (sqrt({_dot_duck('a.embedding', 'a.embedding')})
             * sqrt({_dot_duck('b.embedding', 'b.embedding')})) >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def s_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4, tuned to the
    synthetic corpus where max pairwise cos ≈ 0.51). Labelled brute-force
    baseline: all-pairs with a<b — O(n²), correctness yardstick ONLY; keep
    it out of any large-SF benchmark. The scale path with the same output
    contract is s_near_dup_lsh_verified (multi-band LSH candidates + exact
    cosine verify, recall pinned by pytest)."""
    e = spread(t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    # Norms are per-ROW: compute them ONCE per side in a dedicated
    # pre-join Project (O(n), and codegen splits a Project's unrolled
    # sums into JIT-able submethods). Leaving all three 64-term dots in
    # the post-join cos meant the `cos >= 0.4` filter — which references
    # both sides — was pushed into the BroadcastNestedLoopJoin CONDITION,
    # where codegen cannot split: the generated bnlj_doConsume blew the
    # JVM's 64 KB method limit (hard Janino failure → whole stage
    # silently interpreted). One dot in the pair stage compiles clean
    # (same shape as s_near_dup_lsh_verified's verify join, gated under
    # spark.sql.codegen.fallback=false).
    e = e.withColumn("nrm", F.sqrt(cexpr(_dot_spark("embedding", "embedding"))))
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dot = cexpr(_dot_spark("va", "vb"))
    cos = dot / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= 0.4)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos"))
        .orderBy("vec_a", "vec_b")
    )


def _hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 (computed in Python, emitted as
    literals into both dialects)."""
    out = []
    for j in range(n_planes):
        row = []
        for d_ in range(dim):
            h = hashlib.md5(f"{j},{d_}".encode()).digest()[0]
            row.append(1 if h % 2 == 0 else -1)
        out.append(row)
    return out


_N_PLANES = 8
_SIGNS = _hyperplane_signs(_N_PLANES, DIM)


def _proj_terms(alias: str, j: int, spark_dialect: bool) -> str:
    terms = []
    for d_ in range(DIM):
        idx = d_ if spark_dialect else d_ + 1
        cast = "cast" if spark_dialect else "CAST"
        sgn = "+" if _SIGNS[j][d_] > 0 else "-"
        terms.append(f"{sgn} {cast}({alias}[{idx}] AS DOUBLE)")
    return "(" + " ".join(terms) + ")"


def _bucket_expr(alias: str, spark_dialect: bool) -> str:
    shl = (
        "shiftleft(cast(1 as bigint), {j})"
        if spark_dialect
        else "(1::BIGINT << {j})"
    )
    parts = [
        f"(CASE WHEN {_proj_terms(alias, j, spark_dialect)} > 0 THEN {shl.format(j=j)} ELSE 0 END)"
        for j in range(_N_PLANES)
    ]
    return "(" + " + ".join(parts) + ")"


def with_hyperplane_projections(
    df: DataFrame, vec_alias: str, signs: list, prefix: str
) -> DataFrame:
    """Append one signed-sum projection column per hyperplane
    (``prefix0..prefixN``) as a dedicated Project stage — THE only
    codegen-safe AND fast formulation found (round-4 verdict nit, round-5
    measurement):

    - Unrolled 64-term sums fed DIRECTLY into a Generate blow Janino's
      64 KB method limit inside ``generate_doConsume`` → silent
      whole-stage-codegen fallback to interpretation (3× `ERROR
      CodeGenerator` in the r4 contract run).
    - Higher-order-function folds (aggregate over zip_with) compile
      compactly but allocate two arrays per plane per row — measured 8×
      slower on s_near_dup_lsh_verified at sf0.2 (61 s vs 7.6 s).
    - A SEPARATE Project stage keeps the unrolled straight-line sums
      (fast: no allocation, pure fused multiply-adds) while codegen's
      ``splitExpressionsWithCurrentInputs`` splits the per-plane
      expressions into sub-methods that each fit the JVM limit; the
      downstream Generate/bucket logic then consumes plain attribute
      references. Gated by
      test_embedding_queries_compile_under_wholestage_codegen
      (spark.sql.codegen.fallback=false turns any regression into a
      hard failure).

    Float semantics identical to the inline form: same left-to-right
    ± chain per plane."""
    # cexpr: the 64-term signed-sum strings are constants per (alias,
    # signs) site — one Catalyst parse per string per process instead of
    # per construction (~25 ms each × 16 planes; guide §5). Round 14:
    # the alias is folded INTO the memoized string ("... AS _p0"), so a
    # warm construction pays zero py4j trips per plane instead of one
    # .alias() trip each.
    cols = [
        cexpr(f"{_signed_sum_expr(vec_alias, row)} AS {prefix}{j}")
        for j, row in enumerate(signs)
    ]
    return df.select("*", *cols)


def _signed_sum_expr(alias: str, signs_row: list) -> str:
    """Unrolled Spark SQL text for Σ ±alias[d] over one hyperplane."""
    terms = [
        f"{'+' if s > 0 else '-'} cast({alias}[{d}] as double)"
        for d, s in enumerate(signs_row)
    ]
    return "(" + " ".join(terms) + ")"


def bucket_from_projections(prefix: str, n_planes: int = _N_PLANES) -> Column:
    """8-bit hyperplane bucket id from precomputed projection columns
    (``with_hyperplane_projections``) — the SQL-string twin of
    ``_bucket_expr(alias, True)`` split across two plan stages. Built as
    ONE cexpr'd string (same Cast/CaseWhen tree the former Column loop
    produced, ~40 py4j round trips fewer per construction; guide §5)."""
    parts = ["cast(0 as bigint)"] + [
        f"CASE WHEN {prefix}{j} > 0 THEN cast({1 << j} as bigint)"
        " ELSE cast(0 as bigint) END"
        for j in range(n_planes)
    ]
    return cexpr("(" + " + ".join(parts) + ")")


@register(
    "s_ann_lsh_top1",
    f"""
    WITH e AS (SELECT vec_id, embedding,
                      {_bucket_expr('embedding', False)} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id, embedding, bucket FROM e WHERE vec_id % 20 = 0),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_dot_duck('q.embedding', 'e.embedding')}
             / (sqrt({_dot_duck('q.embedding', 'q.embedding')})
                * sqrt({_dot_duck('e.embedding', 'e.embedding')})) AS cos
      FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id
    FROM (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn = 1
    ORDER BY query_id
    """,
)
def s_ann_lsh_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbor via random-hyperplane LSH: 8
    deterministic ±1 hyperplanes → 8-bit bucket; candidates share the
    query's bucket; exact cosine re-rank inside the bucket only.

    This is the scale path for similarity search: the candidate join is an
    equi-join on the bucket id (shuffle on a small int key), so cost is
    O(n x bucket_occupancy), not O(n x q)."""
    e = (
        with_hyperplane_projections(
            spread(
                t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
            ),
            "embedding",
            _SIGNS,
            "_q",
        )
        .withColumn("bucket", bucket_from_projections("_q"))
        .withColumn(
            "nrm", F.sqrt(cexpr(_dot_spark("embedding", "embedding")))
        )
        .drop(*[f"_q{j}" for j in range(_N_PLANES)])
    )
    q = e.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("nrm").alias("qnrm"),
    )
    cand = q.join(
        e,
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    dot = cexpr(_dot_spark("qv", "embedding"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "neighbor_id")
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Training-pipeline quality filters (round 2 additions)
# ---------------------------------------------------------------------------


@register(
    "t_repetition_metrics",
    r"""
    WITH base AS (
      SELECT doc_id,
             regexp_split_to_array(text, '\s+') AS toks
      FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bigrams
      FROM base),
    bg AS (
      SELECT m.doc_id, u.bg, COUNT(*) AS c
      FROM m, UNNEST(m.bigrams) AS u(bg)
      GROUP BY m.doc_id, u.bg),
    top_bg AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bg GROUP BY doc_id)
    SELECT m.doc_id, m.n_tokens, m.n_distinct,
           ROUND(1.0 - CAST(m.n_distinct AS DOUBLE) / m.n_tokens, 6)
             AS dup_word_frac,
           t.top_bigram_n,
           ROUND(CAST(t.top_bigram_n AS DOUBLE) / (m.n_tokens - 1), 6)
             AS top_bigram_frac,
           CAST((1.0 - CAST(m.n_distinct AS DOUBLE) / m.n_tokens) > 0.8
                OR CAST(t.top_bigram_n AS DOUBLE) / (m.n_tokens - 1) > 0.18
                AS INT) AS flag_repetitive
    FROM m JOIN top_bg t USING (doc_id)
    ORDER BY doc_id
    """,
)
def t_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters per document: duplicate-word
    fraction (1 - distinct/total) and most-frequent-bigram fraction, plus
    the keep/drop flag a pretraining pipeline would gate on (thresholds
    0.8 / 0.18 after Rae et al. 2021's repetition cut family).

    Scale shape: the bigram top count is explode → (doc_id, bigram) count
    → per-doc max — two partial-aggregated shuffles keyed by doc_id, no
    per-doc state beyond the hash slots; every fraction is exact integer
    arithmetic cast once at the end."""
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    base = d.withColumn("toks", F.split(F.col("text"), r"\s+"))
    m = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.expr(
            "transform(sequence(0, size(toks) - 2),"
            " i -> concat(toks[i], ' ', toks[i+1]))"
        ).alias("bigrams"),
    )
    top_bg = (
        m.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    dup_frac = 1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens")
    bg_frac = F.col("top_bigram_n").cast("double") / (F.col("n_tokens") - 1)
    return (
        m.drop("bigrams")
        .join(top_bg, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(dup_frac, 6).alias("dup_word_frac"),
            "top_bigram_n",
            F.round(bg_frac, 6).alias("top_bigram_frac"),
            ((dup_frac > 0.8) | (bg_frac > 0.18)).cast("int").alias(
                "flag_repetitive"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "t_pack_sequences",
    r"""
    WITH d AS (
      SELECT source, doc_id,
             len(regexp_split_to_array(text, '\s+')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) / 256) AS BIGINT) AS seq_id
      FROM d)
    SELECT source, seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY source, seq_id
    ORDER BY source, seq_id
    """,
)
def t_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: concatenate documents (per source, in
    deterministic doc_id order) into fixed token-budget sequences of 256
    tokens — the streaming-concat packing every pretraining data loader
    performs. ``seq_id = floor(running_tokens_before / budget)``.

    Scale shape: one window over (source, doc_id) — state is a running
    sum per partition key, and at 100 TB the partition key would include a
    shard component (e.g. hash(doc_id) div shard_rows) so no single
    source's window serializes on one task."""
    d = spread(t(spark, sf_dir, "documents").select("source", "doc_id", "text"))
    d = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = d.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 256
        ).cast("bigint"),
    )
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "seq_id")
    )


_GRAM5_SPARK = (
    "array_distinct(CASE WHEN size(toks) >= 5 THEN"
    " transform(sequence(0, size(toks) - 5),"
    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))"
    " ELSE array() END)"
)
_GRAM5_DUCK = r"""
    SELECT doc_id, u.sh
    FROM (SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) >= 5 THEN
                   list_transform(range(1, len(toks) - 3),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          || ' ' || toks[i+3] || ' ' || toks[i+4])
                   ELSE [] END) AS shs
          FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
                FROM documents)),
         UNNEST(shs) AS u(sh)
"""


@register(
    "t_contamination_check",
    f"""
    WITH sh AS ({_GRAM5_DUCK}),
    bench AS (SELECT DISTINCT sh, doc_id AS bench_id FROM sh
              WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT t.doc_id,
           COUNT(DISTINCT b.bench_id) AS n_bench_docs,
           COUNT(DISTINCT t.sh) AS n_shared_5grams
    FROM train t JOIN bench b ON t.sh = b.sh
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def t_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screening: flag training documents sharing
    any word-5-gram with a held-out benchmark set (docs with
    ``doc_id % 97 == 0`` stand in for the eval suite). Reports how many
    benchmark documents each contaminated training doc overlaps and on how
    many distinct 5-grams — the evidence needed to decide drop vs scrub.

    Scale shape: the overlap test is an equi-join ON THE 5-GRAM between
    the (small, broadcastable) benchmark shingle set and the corpus
    shingles — O(corpus shingles), never all-pairs of documents."""
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = (
        d.withColumn("toks", F.split(F.col("text"), r"\s+"))
        .select("doc_id", F.explode(F.expr(_GRAM5_SPARK)).alias("sh"))
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("bench_id"), "sh")
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_docs"),
            F.countDistinct("sh").alias("n_shared_5grams"),
        )
        .orderBy("doc_id")
    )


# 16 extra deterministic hyperplanes for the multi-band near-dup LSH
# (8 bands x 2 bits). Distinct hash salt from _SIGNS so the two LSH
# operators are independent.
_SIGNS16 = [
    [
        1 if hashlib.md5(f"band16:{j},{d_}".encode()).digest()[0] % 2 == 0 else -1
        for d_ in range(DIM)
    ]
    for j in range(16)
]


def _proj16(alias: str, p: int, spark_dialect: bool) -> str:
    terms = []
    for d_ in range(DIM):
        idx = d_ if spark_dialect else d_ + 1
        cast = "cast" if spark_dialect else "CAST"
        sgn = "+" if _SIGNS16[p][d_] > 0 else "-"
        terms.append(f"{sgn} {cast}({alias}[{idx}] AS DOUBLE)")
    return "(" + " ".join(terms) + ")"


def _band_bucket16(alias: str, j: int, spark_dialect: bool) -> str:
    """2-bit bucket of band j from hyperplanes 2j and 2j+1."""
    b0 = f"(CASE WHEN {_proj16(alias, 2 * j, spark_dialect)} > 0 THEN 1 ELSE 0 END)"
    b1 = f"(CASE WHEN {_proj16(alias, 2 * j + 1, spark_dialect)} > 0 THEN 2 ELSE 0 END)"
    return f"({b0} + {b1})"


_NEAR_DUP_BANDS = 8
_NEAR_DUP_THRESHOLD = 0.4


def _near_dup_bands_duck() -> str:
    selects = [
        f"SELECT vec_id, {j} AS band,"
        f" {_band_bucket16('embedding', j, False)} AS bucket"
        " FROM embeddings"
        for j in range(_NEAR_DUP_BANDS)
    ]
    return " UNION ALL ".join(selects)


@register(
    "s_near_dup_lsh_verified",
    f"""
    WITH bands AS ({_near_dup_bands_duck()}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
    e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT c.vec_a, c.vec_b,
           ROUND({_dot_duck('a.embedding', 'b.embedding')}
                 / (sqrt({_dot_duck('a.embedding', 'a.embedding')})
                    * sqrt({_dot_duck('b.embedding', 'b.embedding')})), 4) AS cos
    FROM cand c
    JOIN e a ON a.vec_id = c.vec_a
    JOIN e b ON b.vec_id = c.vec_b
    WHERE {_dot_duck('a.embedding', 'b.embedding')}
          / (sqrt({_dot_duck('a.embedding', 'a.embedding')})
             * sqrt({_dot_duck('b.embedding', 'b.embedding')})) >= {_NEAR_DUP_THRESHOLD}
    ORDER BY vec_a, vec_b
    """,
)
def s_near_dup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs at scale: multi-band hyperplane LSH
    candidates (8 bands x 2 bits — collision prob for a true cos>=0.4 pair
    per band ~0.4, across 8 bands ~0.98) followed by an EXACT cosine check,
    so precision is 1.0 and only recall is approximate. Candidates come
    from equi-joins on (band, bucket) and the exact verify touches only
    candidate pairs; the pair dedup runs AFTER the verify so no full
    candidate table is ever shuffled. tests/ pins recall >= 0.9 against
    the brute-force oracle at sf0.001.

    Honest complexity: at this contract's low threshold (cos >= 0.4,
    i.e. ~66 degree angle) hyperplane LSH has rho = ln(p_true)/ln(p_rand)
    = ln(0.63)/ln(0.5) ~ 0.67, so candidates grow ~n^1.67 — better than
    the all-pairs baseline's n^2 but NOT linear; every LSH family
    degrades toward all-pairs as the threshold drops. bench.py's
    sf_large section measures the curve. True near-duplicate dedup
    (cos >= 0.9, where per-bit collision is ~0.9 and LSH prunes hard)
    and the linear-scaling centroid path (s_semantic_dedup_rep) are the
    100 TB tools; this operator is the bounded-threshold pair finder.

    The DuckDB oracle replicates the same bands + verify, so the driver
    hash-checks the distributed implementation, not the (data-dependent)
    recall."""
    # Bare string column args are passed as memoized cexpr Columns
    # throughout this constructor (round 14): PySpark converts each
    # string arg through _create_column_from_name — 2-3 py4j round trips
    # per string per build — while a prebuilt Column costs zero
    # (measured 12.2 -> 6.5 ms per select on this host). Identical plan:
    # both forms yield the same UnresolvedAttribute.
    e = spread(
        t(spark, sf_dir, "embeddings").select(
            cexpr("vec_id"), cexpr("embedding")
        )
    )
    e16 = with_hyperplane_projections(e, "embedding", _SIGNS16, "_p")
    # All 8 band buckets packed into ONE 16-bit int (bucket_j occupies
    # bits 2j..2j+1), carried alongside each exploded band row: the
    # first-shared-band condition below reads it with shift/mask
    # primitives (codegen-friendly, no per-candidate array allocation).
    # Construction goes through cexpr'd SQL strings (string twins of the
    # former Column loops — same CaseWhen/explode trees, verified by
    # normalized plan diff + oracle): the pack chain and the 8-struct
    # explode cost ONE memoized parse each instead of ~200 py4j round
    # trips per construction (guide §5).
    def _b16(j: int) -> str:
        return (
            f"((CASE WHEN _p{2 * j} > 0 THEN 1 ELSE 0 END)"
            f" + (CASE WHEN _p{2 * j + 1} > 0 THEN 2 ELSE 0 END))"
        )

    pack_sql = " + ".join(
        _b16(j) if j == 0 else f"{_b16(j)} * {1 << (2 * j)}"
        for j in range(_NEAR_DUP_BANDS)
    )
    bb_sql = "explode(array(%s))" % ", ".join(
        f"named_struct('band', {j}, 'bucket', {_b16(j)})"
        for j in range(_NEAR_DUP_BANDS)
    )
    bands = e16.select(
        cexpr("vec_id"),
        cexpr(f"{pack_sql} AS pack"),
        cexpr(f"{bb_sql} AS bb"),
    ).select(
        cexpr("vec_id"),
        cexpr("pack"),
        cexpr("bb.band AS band"),
        cexpr("bb.bucket AS bucket"),
    )
    # Round-13 optimization (guide §1.1 empirical + §3): stage profiling
    # at the bench's 2x corpus put ~97% of the query's core-seconds in
    # the fused candidate+verify stage, and at this contract's low
    # threshold (2-bit buckets -> 4 buckets/band) a RANDOM pair shares
    # ~2 of the 8 bands, so the 64-term exact verify used to run ~2x per
    # pair. Each pair is now verified exactly ONCE — on its FIRST shared
    # band — selected by a pure shift/mask CASE over the packed bucket
    # signatures (a.pack ^ b.pack has a zero 2-bit group exactly at the
    # shared bands). This is a join-condition filter, so the dedup costs
    # a few ALU ops per candidate occurrence instead of either the
    # duplicate 64-term dots (before) or a pre-verify DISTINCT shuffle
    # of the full candidate table (measured worse in round 12); the
    # surviving pair set — and therefore the output after the late
    # distinct — is byte-identical (same rounded cos per pair).
    first_shared = (
        "CASE "
        + " ".join(
            f"WHEN (((a.pack ^ b.pack) >> {2 * j}) & 3) = 0 THEN {j}"
            for j in range(_NEAR_DUP_BANDS)
        )
        + " ELSE -1 END"
    )
    # The whole join condition is ONE memoized constant string (round 14:
    # the And-chain parses to the same left-associated And tree the
    # Column `&` operators built — zero py4j trips per warm construction
    # instead of ~12).
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            cexpr(
                "a.band = b.band AND a.bucket = b.bucket"
                " AND a.vec_id < b.vec_id"
                f" AND ({first_shared}) = a.band"
            ),
        )
        .select(cexpr("a.vec_id AS vec_a"), cexpr("b.vec_id AS vec_b"))
    )
    # Norms are computed ONCE per vector (narrow map, O(n) dots) and carried
    # through the pair joins, so the per-pair verify is a single dot product
    # instead of three — bit-identical to the per-pair form (same expression
    # tree on the same input bits), 3x less verify CPU on candidate-heavy
    # corpora.
    ev = e.select(
        cexpr("vec_id"),
        cexpr("embedding"),
        cexpr(f"sqrt({_dot_spark('embedding', 'embedding')}) AS nrm"),
    )
    ea = ev.select(
        cexpr("vec_id AS vec_a"),
        cexpr("embedding AS va"),
        cexpr("nrm AS na"),
    )
    eb = ev.select(
        cexpr("vec_id AS vec_b"),
        cexpr("embedding AS vb"),
        cexpr("nrm AS nb"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            cexpr("vec_a"),
            cexpr("vec_b"),
            cexpr(f"{_dot_spark('va', 'vb')} / (na * nb) AS cos_raw"),
        )
        .filter(cexpr(f"cos_raw >= {_NEAR_DUP_THRESHOLD}D"))
        .select(
            cexpr("vec_a"),
            cexpr("vec_b"),
            cexpr("round(cos_raw, 4) AS cos"),
        )
        .distinct()
        .orderBy(cexpr("vec_a"), cexpr("vec_b"))
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) sub-document dedup
# ---------------------------------------------------------------------------

_CDC_W = 4  # rolling-window tokens; boundary prob 1/8 → ~8-token chunks


def cdc_chunk_rows(d: DataFrame) -> DataFrame:
    """(doc_id, n, h, sz): content-defined chunk rows for a (doc_id, text)
    frame. Boundary positions, chunk splitting, and chunk digests are all
    narrow per-doc array expressions — the first shuffle-bearing consumer
    is whatever aggregates these rows."""
    w = _CDC_W
    df = d.select(
        "doc_id", F.expr(TOK_SPARK).alias("tk")
    ).withColumn("n", F.size("tk"))
    bounds = F.expr(
        f"CASE WHEN n >= {w + 1} THEN "
        f"filter(sequence(2, n - {w - 1}), "
        f"p -> substring(md5(cast(concat_ws(' ', slice(tk, p, {w})) "
        f"as binary)), 1, 1) < '2') "
        f"ELSE array() END"
    )
    return (
        df.withColumn("b", bounds)
        .select(
            "doc_id",
            "n",
            F.explode(
                F.expr(
                    "zip_with("
                    "  concat(array(1), b),"
                    "  concat(transform(b, x -> x - 1), array(n)),"
                    "  (s, e) -> struct("
                    "    md5(cast(concat_ws(' ', slice(tk, s, e - s + 1))"
                    "        as binary)) AS h,"
                    "    e - s + 1 AS sz))"
                )
            ).alias("c"),
        )
        .select(
            "doc_id", "n", F.col("c.h").alias("h"), F.col("c.sz").alias("sz")
        )
    )


@register(
    "t_cdc_chunk_dedup",
    rf"""
    WITH docs AS (
      SELECT doc_id, {TOK_DUCK} AS tk FROM documents),
    base AS (SELECT doc_id, tk, len(tk) AS n FROM docs),
    bnds AS (
      SELECT doc_id, tk, n,
             CASE WHEN n >= {_CDC_W + 1} THEN
               list_filter(generate_series(2, n - {_CDC_W - 1}),
                 p -> substr(md5(array_to_string(tk[p:p + {_CDC_W - 1}], ' ')),
                             1, 1) < '2')
             ELSE CAST([] AS BIGINT[]) END AS b
      FROM base),
    chunks AS (
      SELECT doc_id, n,
             md5(array_to_string(tk[z.p[1]:z.p[2]], ' ')) AS h,
             z.p[2] - z.p[1] + 1 AS sz
      FROM bnds,
           UNNEST(list_zip(list_prepend(1, b),
                           list_append(list_transform(b, x -> x - 1), n)))
             AS z(p)),
    stats AS (
      SELECT h, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY h)
    SELECT c.doc_id,
           CAST(c.n AS BIGINT) AS n_tokens,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (WHERE s.nd >= 2) AS dup_chunks,
           COALESCE(CAST(SUM(c.sz) FILTER (WHERE s.nd >= 2) AS BIGINT), 0)
             AS dup_tokens,
           ROUND(COALESCE(SUM(c.sz) FILTER (WHERE s.nd >= 2), 0)
                 / CAST(c.n AS DOUBLE), 6) AS dup_fraction
    FROM chunks c JOIN stats s USING (h)
    GROUP BY c.doc_id, c.n
    ORDER BY c.doc_id
    """,
)
def t_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the rolling-hash chunker of dedup
    storage — LBFS/Borg/restic — at token grain): chunk boundaries fall
    where the hash of a {_CDC_W}-token window starts with hex 0/1
    (p = 1/8, ~8-token expected chunks), so an insertion only reshapes
    the chunks it touches — unlike fixed-stride spans (t_dup_spans),
    which shift every downstream span. Per doc: chunk count, chunks whose
    digest recurs in ≥2 distinct documents, duplicated-token count and
    fraction — the sub-document dedup signal span-exact dedup papers act
    on.

    Plan shape: boundary detection, chunk splitting, and chunk digests
    are ALL narrow per-doc array expressions (filter/zip_with over a
    token array — no explode until chunks exist, and chunk rows are ~8×
    fewer than token rows). Cross-document recurrence is then decided IN
    PLACE on one digest-partitioned exchange: a chunk digest occurs in
    ≥2 distinct documents iff ``min(doc_id) != max(doc_id)`` over its
    digest partition — two running scalars, no distinct-set allocation,
    exact by definition. (Round 13, guide §2.2: the previous
    groupBy(digest) + digest equi-join-back consumed the chunk lineage
    twice — Spark recomputed the whole tokenize/boundary/digest
    derivation for each consumer, the two heaviest stages of the query
    at the bench's 4× corpus — and shuffled the chunk stream twice.
    Now: ONE derivation pass, ONE chunk-grain exchange, then the
    doc-grain aggregate — results byte-identical since dup_chunks /
    dup_tokens depend only on the nd>=2 predicate.) At 100 TB the
    digest exchange stays uniform (md5 keys); a viral boilerplate chunk
    is one fat-but-bounded window partition (the per-row state is two
    bigints), never a sorted-range straggler."""
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    chunks = cdc_chunk_rows(d)
    wh = Window.partitionBy("h")
    dup = F.min("doc_id").over(wh) != F.max("doc_id").over(wh)
    return (
        chunks.withColumn("dup", dup)
        .groupBy("doc_id", "n")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count(F.when(F.col("dup"), 1)).alias("dup_chunks"),
            F.coalesce(F.sum(F.when(F.col("dup"), F.col("sz"))), F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_tokens"),
            "n_chunks",
            "dup_chunks",
            "dup_tokens",
            F.round(
                F.col("dup_tokens").cast("double") / F.col("n"), 6
            ).alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup: maximal repeated character spans (Lee et al. 2022)
# ---------------------------------------------------------------------------

_ESS_L = 40  # anchor gram length (characters)

#: exact_substring_spans auto-prune engagement threshold (total corpus
#: chars). Below it the dup-anchor groupBy is already cheap and the
#: pre-prune's extra full gram pass is pure overhead; above it the
#: position-stream shuffle dominates and pruning singleton grams before
#: the exchange is the win. Like twolevel.SMALL_INPUT_ROWS this is a
#: posture bound, not a tuned crossover — bench.py records the forced
#: A/B every round so the real crossover stays a measured number.
_ESS_PRUNE_CHARS = 32_000_000

#: Bucket-count domain of the pre-prune (one xxhash64 of the gram digest
#: modulo this). 2^20 hot-bucket ids broadcast at ≤ 8 MB worst case;
#: size it ~10x the expected DISTINCT dup grams — an overfull domain
#: (every bucket hot) degrades gracefully to a no-op filter, never to a
#: wrong answer, because the exact per-digest count still runs on the
#: survivors.
#:
#: Regime honesty (measured, bench `ess_knob_regime`, round 9): the
#: filter is only selective while total grams / n_buckets stays ≲ 1, so
#: big corpora must RAISE n_buckets with corpus size — and once
#: n_buckets exceeds the per-task gram count the pass-0 partial agg
#: stops combining (few in-task bucket repeats), leaving the
#: bucket-count exchange itself carrying ~n rows, just ~3x smaller ones
#: (8-byte bucket + count vs digest + doc_id + pos). Net effect on a
#: mostly-singleton corpus: shuffle BYTES drop ~3x (74.7 → 23.4 MB
#: measured at the smoke point; the bench records the full-size numbers
#: every round) for one extra narrow gram pass of CPU — a knob that
#: wins where the network, not the CPU, binds. When the dup-gram count
#: itself is what's small AND total grams fit ~10x a broadcastable
#: domain, the original cap argument applies and the win is larger. For
#: corpora where neither holds, prefer anchor="winnow": it shrinks the
#: compute pass AND both exchanges together (~2/(w+1) sampling before
#: any shuffle) with a proven recall floor.
_ESS_PRUNE_BUCKETS = 1 << 20


#: Default winnowing window (grams) for exact_substring_spans'
#: ``anchor="winnow"`` — expected anchor density 2/(w+1) ≈ 0.12, recall
#: guaranteed for repeats of length >= L + w - 1 (= 55 chars at the
#: default L=40), span boundaries conservative by <= w-1 chars.
_ESS_WINNOW_W = 16


def winnow_oracle_sql(
    L: int = _ESS_L, w: int = _ESS_WINNOW_W, table: str = "documents"
) -> str:
    """DuckDB twin of ``exact_substring_spans(anchor="winnow",
    winnow_hash="md5hex60")`` — the winnowing SELECTION expressed as two
    sliding window passes per doc (forward MIN of the 60-bit gram hash,
    backward MAX of that), then the registered row's dup-count +
    gaps-and-islands pipeline over the selected anchors only. Staged in
    round 8 so a round-9 winnow row can register with a FULL value-hash
    oracle; cross-engine equality is already pinned by
    tests/test_corpusops.py::test_winnow_duckdb_oracle_parity."""
    # DuckDB lateral alias reference: hv reads the already-computed h,
    # so md5 runs once per row (the same compute-once shape as the
    # Spark side's two-level transform).
    return f"""
    WITH g AS (
      SELECT doc_id, pos,
             md5(substring(text, pos, {L})) AS h,
             {_hex60_of_hash_duck('h')} AS hv
      FROM (SELECT doc_id, text,
                   UNNEST(range(1, length(text) - {L - 1} + 1)) AS pos
            FROM {table} WHERE length(text) >= {L})),
    wm AS (
      SELECT doc_id, pos, h, hv,
             MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW
                           AND {w - 1} FOLLOWING) AS wmin
      FROM g),
    sel AS (
      SELECT doc_id, pos, h
      FROM (SELECT doc_id, pos, h, hv,
                   MAX(wmin) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN {w - 1} PRECEDING
                                   AND CURRENT ROW) AS smax
            FROM wm)
      WHERE hv = smax),
    dup AS (
      SELECT h FROM sel GROUP BY h HAVING COUNT(*) >= 2),
    hits AS (
      SELECT s.doc_id, s.pos FROM sel s SEMI JOIN dup d ON s.h = d.h),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= {L}
                  THEN 0 ELSE 1 END AS brk
      FROM hits),
    grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl)
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {L} - 1 AS span_end,
           MAX(pos) + {L} - MIN(pos) AS span_len
    FROM grp
    GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """


#: exact_substring_spans' corpus-size probe memo, weak-keyed on the
#: SparkSession (round-14 memo-key hygiene): session -> {sorted input
#: files: total chars}. Same pattern/contract as twolevel._COUNT_MEMO
#: (see the prune=="auto" branch below); a collected session's entries
#: vanish with it and a new session object — even at a recycled id() —
#: starts empty.
_CHARS_PROBE_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def exact_substring_spans(
    docs: DataFrame,
    L: int = _ESS_L,
    prune: str = "auto",
    n_buckets: int = _ESS_PRUNE_BUCKETS,
    prune_threshold_chars: int = _ESS_PRUNE_CHARS,
    anchor: str = "stride1",
    winnow_w: int = _ESS_WINNOW_W,
    winnow_hash: str = "xxhash64",
    dup_filter: str = "auto",
) -> DataFrame:
    """ExactSubstr maximal-span dedup over a (doc_id, text) frame — the
    operator body of t_exact_substring_spans (see its docstring for
    semantics), parameterized with the 100 TB pre-prune.

    ``prune``:

    - ``"off"`` — the two-pass exact plan: gram fan-out (narrow), ONE
      shuffle counting occurrences per 16-byte digest, semi-join of the
      full position stream against the duplicated digests.
    - ``"bucket"`` — the docstring-promised two-pass frequency filter,
      built entirely from JVM built-ins (Spark's ``bloom_filter_agg`` is
      not in the public registry): pass 1 partial-aggregates gram counts
      at a COARSE key (``xxhash64(digest) % n_buckets`` — map-side
      combine caps the exchange at n_buckets rows per task), keeps the
      bucket ids seen >= 2, and BROADCASTS them — a one-hash counting
      Bloom filter. The position stream then semi-joins that broadcast
      (a narrow filter, no exchange) so only grams that CAN be
      duplicated reach the exact per-digest count and the big semi-join
      shuffle. Exact by construction: all occurrences of a digest share
      a bucket, so a bucket with total count < 2 holds only singleton
      grams — pruning it cannot change any surviving digest's count,
      and bucket collisions (false positives) are removed by the exact
      pass that follows. The price is one extra narrow gram pass
      (the fan-out lineage is recomputed 3x instead of 2x); the win is
      shuffling only the duplicated fraction of the corpus's positions.
    - ``"auto"`` — a cheap corpus-size probe (``sum(n_chars)`` when the
      frame declares that column — one pruned single-long-column scan —
      else ``sum(length(text))``) engages
      ``"bucket"`` at >= ``prune_threshold_chars`` total chars (the
      same adaptive-guard shape as twolevel.sessionize_session_rows):
      the registered row stays on the exact plain plan at test scale
      and a 100 TB corpus gets the prune without a code change.

    Result-identical across all three prune modes at any parallelism
    (pinned by tests/test_corpusops.py::test_exact_substring_prune_equality
    against the brute-force reference and mode "off").

    ``dup_filter`` picks how duplicated-digest positions are selected
    (round-13 optimization; result-identical by construction, pinned by
    test_exact_substring_dup_filter_equality):

    - ``"semi"`` — the original two-consumption shape: per-digest counts
      aggregated (one exchange of (h, count) partials), digests with
      count >= 2 broadcast, and the gram lineage RECOMPUTED for a
      broadcast LEFT SEMI join. Two gram fan-out passes.
    - ``"window"`` — one gram fan-out pass: the position stream is
      exchanged by digest once and ``count(*) over (partition by h)``
      filters in place. Stage profiling at the bench's 4x corpus put
      ~78% of the query's executor CPU in the two fan-out passes
      (27.5 s + 25.6 s of ~68 s), and on a mostly-singleton corpus the
      count exchange's partial aggregation cannot combine (unique keys),
      so it already carried ~stream-sized bytes — the window form drops
      a full md5 fan-out pass for byte-parity shuffle.
    - ``"auto"`` (default) — ``"window"`` when the resolved prune mode
      is ``"off"`` (the exact/CPU-bound regime where the fan-out pass is
      the cost), ``"semi"`` under ``"bucket"`` (the 100 TB posture: the
      hot-bucket survivor stream is dup-heavy by construction, so the
      count exchange combines well and the broadcast semi keeps the
      surviving position stream out of the exchange entirely).

    ``anchor`` picks the anchoring scheme:

    - ``"stride1"`` (default, the registered row's mode): every gram
      position is an anchor — EXACT maximal spans for all repeats >= L.
    - ``"winnow"`` — winnowing / minimizer sampling (Schleimer et al.
      2003, SIGMOD; the content-defined replacement for the naive
      "stride L/2" idea, which is BROKEN across occurrence phases): a
      position is an anchor iff its gram's xxhash64 is the minimum of
      at least one window of ``winnow_w`` consecutive gram positions
      (all ties selected — the choice depends only on gram CONTENT, so
      every occurrence of a repeat samples the same relative
      positions). Guarantees: expected anchor density 2/(w+1); zero
      false positives (anchors are a subset of stride-1 anchors, so
      every reported span lies inside an exact span); every repeat of
      length >= L + w - 1 is detected in every occurrence (it contains
      a full gram window at matching relative offsets, whose minimizer
      matches), with span boundaries conservative by at most w-1 chars
      and intra-repeat anchor gaps <= w <= L (so the island merge
      cannot split a covered repeat). Repeats of length L..L+w-2 MAY be
      missed — the documented recall trade, now with a real guarantee
      instead of the stride heuristic. Implementation is entirely
      NARROW: per-doc array HOFs (transform/slice/filter — O(n·w)
      compute per doc, zero extra shuffles) select anchor positions
      before the explode, so only the ~2/(w+1) sampled stream pays
      md5, the count shuffle, and the semi-join. Regime honesty
      (measured, bench `ess_anchor_ab`): at local[32] toy scale the
      selection's interpreted-HOF constant (~2·n·w lambda evals +
      n xxhash64-of-substring, which alone rivals stride-1's n md5s)
      EXCEEDS the shuffle savings, so winnow loses there — its win is
      the shuffle-/network-bound regime the mode exists for, where
      8x fewer shuffled positions and 8x smaller dup-count state
      dominate. (A shifted-zip_with formulation was also measured and
      lost to this slice form single-task, 23.6 vs 19.3 s at 6M chars,
      with identical anchor sets.) The identity ``winnow_w=1`` ==
      ``stride1`` is pinned by pytest, as are the subset and detection
      guarantees."""
    base = docs.where(F.length("text") >= L).select("doc_id", "text")
    if prune == "auto":
        # The probe prefers a declared n_chars column (one pruned-column
        # scan of a long — documents ships one) over summing
        # length(text) (a full text-column pass, ~25-33% extra corpus
        # I/O in exactly the regime the prune targets). Including
        # sub-L docs in the n_chars total is immaterial: the threshold
        # is a posture bound, not an exact crossover. Memoized per
        # (session, file set) like twolevel._COUNT_MEMO: the probe is a
        # real job inside the bench's timed construction (guide §5), the
        # total depends only on the write-once file set, and even a
        # mis-keyed hit could only flip between prune modes that are
        # result-identical by test_exact_substring_prune_equality.
        files: tuple = ()
        try:
            files = tuple(sorted(docs.inputFiles()))
        except Exception:  # non-file-backed frame: no memo
            pass
        per_session = None
        total = None
        if files:
            per_session = _CHARS_PROBE_MEMO.get(docs.sparkSession)
            if per_session is None:
                per_session = {}
                _CHARS_PROBE_MEMO[docs.sparkSession] = per_session
            total = per_session.get(files)
        if total is None:
            probe = (
                docs.agg(F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"))
                if "n_chars" in docs.columns
                else base.agg(
                    F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("c")
                )
            )
            total = probe.first()[0]
            if per_session is not None:
                per_session[files] = total
        prune = "bucket" if total >= prune_threshold_chars else "off"
    if prune not in ("off", "bucket"):
        raise ValueError(f"unknown prune mode {prune!r}")
    if anchor == "winnow":
        if winnow_w < 1:
            raise ValueError(f"winnow_w must be >= 1, got {winnow_w}")
        if winnow_w > L:
            # The island merge breaks on gaps > L, and intra-repeat
            # anchor gaps reach w — w > L would silently split covered
            # repeats, voiding the documented guarantees.
            raise ValueError(
                f"winnow_w ({winnow_w}) must be <= L ({L}): the gap-{L} "
                "island merge cannot bridge anchor gaps up to w"
            )
        if winnow_hash == "xxhash64":
            # fastest JVM-side choice; no DuckDB twin function exists
            hv_expr = (
                f"transform(sequence(1, length(text) - {L - 1}), "
                f"p -> xxhash64(substring(text, p, {L})))"
            )
        elif winnow_hash == "md5hex60":
            # cross-engine selection hash (the _hex60 idiom): the inner
            # transform computes each gram's md5 ONCE; the outer
            # polynomial reads the bound hex string 15 times. This is
            # what lets winnow_oracle_sql() regenerate the SELECTION in
            # DuckDB — the round-9 registration path.
            hv_expr = (
                f"transform(transform(sequence(1, length(text) - {L - 1}), "
                f"p -> md5(cast(substring(text, p, {L}) as binary))), "
                f"h -> {_hex60_of_hash_spark('h')})"
            )
        else:
            raise ValueError(f"unknown winnow_hash {winnow_hash!r}")
        w_ = winnow_w
        grams = (
            spread(base)
            .withColumn("hvs", F.expr(hv_expr))
            .withColumn(
                # wmin[q] = min gram hash of the window starting at q
                # (partial windows near the end included — selects a few
                # extra boundary anchors, harmless: still exact-subset).
                "wmin",
                F.expr(
                    f"transform(sequence(1, size(hvs)), "
                    f"q -> array_min(slice(hvs, q, {w_})))"
                ),
            )
            .select(
                "doc_id",
                "text",
                # p is an anchor iff it achieves the min of SOME window
                # containing it <=> hvs[p] == max(wmin[p-w+1 .. p]).
                F.explode(
                    F.expr(
                        f"filter(sequence(1, size(hvs)), "
                        f"p -> element_at(hvs, p) == array_max(slice(wmin, "
                        f"greatest(1, p - {w_ - 1}), "
                        f"p - greatest(1, p - {w_ - 1}) + 1)))"
                    )
                ).alias("pos"),
            )
            .select(
                "doc_id",
                "pos",
                F.md5(
                    F.expr(f"cast(substring(text, pos, {L}) as binary)")
                ).alias("h"),
            )
        )
    elif anchor == "stride1":
        grams = (
            # spread() AFTER the length filter: the gram fan-out is the
            # compute-dense stage (length(text) md5s per doc), and a
            # single-row-group documents file would otherwise pin it to one
            # task (no-op whenever the scan already splits).
            spread(base)
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(1), F.length("text") - (L - 1))
                ).alias("pos"),
                "text",
            )
            .select(
                "doc_id",
                "pos",
                F.md5(
                    F.expr(f"cast(substring(text, pos, {L}) as binary)")
                ).alias("h"),
            )
        )
    else:
        raise ValueError(f"unknown anchor mode {anchor!r}")
    if prune == "bucket":
        bucket = F.pmod(F.xxhash64("h"), F.lit(n_buckets))
        hot = (
            grams.groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .select("b")
        )
        grams = grams.join(
            F.broadcast(hot), bucket == F.col("b"), "left_semi"
        )
    if dup_filter == "auto":
        dup_filter = "window" if prune == "off" else "semi"
    if dup_filter == "window":
        hits = (
            grams.withColumn(
                "c", F.count(F.lit(1)).over(Window.partitionBy("h"))
            )
            .where(F.col("c") >= 2)
            .select("doc_id", "pos")
        )
    elif dup_filter == "semi":
        dup = (
            grams.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .select("h")
        )
        hits = grams.join(dup, "h", "left_semi").select("doc_id", "pos")
    else:
        raise ValueError(f"unknown dup_filter mode {dup_filter!r}")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= L, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    grp = isl.withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grp.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (L - 1)).alias("span_end"),
            (F.max("pos") + L - F.min("pos")).alias("span_len"),
        )
        .select("doc_id", "span_start", "span_end", "span_len")
        .orderBy("doc_id", "span_start")
    )


@register(
    "t_exact_substring_spans",
    f"""
    WITH grams AS (
      SELECT doc_id, i.i AS pos,
             md5(substr(text, i.i, {_ESS_L})) AS h
      FROM documents, UNNEST(range(1, length(text) - {_ESS_L} + 2)) AS i(i)
      WHERE length(text) >= {_ESS_L}),
    dup AS (
      SELECT h FROM grams GROUP BY h HAVING COUNT(*) >= 2),
    hits AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= {_ESS_L}
                  THEN 0 ELSE 1 END AS brk
      FROM hits),
    grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl)
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_ESS_L} - 1 AS span_end,
           MAX(pos) + {_ESS_L} - MIN(pos) AS span_len
    FROM grp
    GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
)
def t_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup at MAXIMAL-span granularity (the ExactSubstr
    semantics of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): every substring of length >= L that occurs
    2+ times anywhere in the corpus (cross-doc or within-doc) is reported
    as a per-document removal span [span_start, span_end] (1-based char
    positions, overlapping/adjacent repeats merged into maximal islands).

    The reference paper builds a single-node suffix array over the
    concatenated corpus; the Spark-native equivalent anchors on L-grams —
    any repeated substring of length >= L contains a repeated L-gram at
    every offset, so stride-1 L-gram anchoring + island merging recovers
    exactly the union of repeated regions (no suffix array needed, fully
    distributed). Differs from t_dup_spans (fixed 16-token spans,
    cross-doc only, top-20 report) and t_cdc_chunk_dedup (content-defined
    CHUNK grain): this row emits the precise character ranges an
    ExactSubstr pass would cut.

    Plan shape: gram fan-out is a narrow per-doc explode (no token-grain
    shuffle); one shuffle aggregates gram occurrence counts on the
    16-byte md5 key (NOT the 40-char text — a 100 TB corpus shuffles
    digests, not substrings); a semi-join filters gram positions to
    duplicated anchors; the island merge is one doc_id-partitioned window
    whose partitioning the final (doc_id, island) aggregate reuses.
    The 100 TB pre-prune promised here in round 7 is now REAL: the body
    is :func:`exact_substring_spans` with ``prune="auto"`` — a coarse
    bucket-count frequency filter (partial-agg + broadcast hot-bucket
    set, the one-hash counting-Bloom stand-in documented there) engages
    above ``_ESS_PRUNE_CHARS`` total chars so the position stream only
    shuffles grams that can survive; at test scale the probe keeps the
    plain exact plan, and both modes are result-identical by
    construction and by pytest. The anchor stride can also rise to L/2
    at a 2x recall-window cost; the stride-1 form keeps the oracle
    exact."""
    return exact_substring_spans(
        t(spark, sf_dir, "documents"), L=_ESS_L, prune="auto"
    )


@register("t_exact_substring_spans_winnow", winnow_oracle_sql())
def t_exact_substring_spans_winnow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAMPLED-ANCHOR ExactSubstr configuration a 100 TB corpus
    actually runs, as its own FULL hash row: ``anchor="winnow"``
    (minimizer sampling, Schleimer et al. 2003 — expected anchor
    density 2/(w+1), every repeat >= L+w-1 detected in every
    occurrence, anchors a strict subset of stride-1 so every reported
    span lies inside an exact span; see exact_substring_spans'
    docstring for the full guarantee set) with
    ``winnow_hash="md5hex60"``, the cross-engine selection hash that
    lets DuckDB regenerate the SAME anchor selection via two sliding
    window min/max passes (winnow_oracle_sql). The oracle therefore
    pins the sampled-anchor semantics end-to-end — selection, dup
    count, island merge, span arithmetic — not just the stride-1 plan
    the registered t_exact_substring_spans row covers. Spark<->DuckDB
    byte-equality of the selection itself is additionally pinned by
    tests/test_corpusops.py::test_winnow_duckdb_oracle_parity.
    Production at scale keeps winnow_hash="xxhash64" (one JVM hash vs
    an md5 + 15-term hex polynomial per gram); the selection contract
    is identical in distribution."""
    return exact_substring_spans(
        t(spark, sf_dir, "documents"),
        L=_ESS_L,
        prune="auto",
        anchor="winnow",
        winnow_hash="md5hex60",
    )


def min_label_components_doubling(
    edges: DataFrame, ckpt, max_rounds: int = 15
) -> DataFrame:
    """Connected components by min-label propagation WITH pointer
    doubling: each round every node takes the least of (its label, its
    LABEL'S label, its neighbors' min label). The extra self-join through
    the label table halves pointer depth per round, so convergence is
    O(log diameter): on a worst-case path the measured recurrence
    (simulated exactly — round 1 is a single neighbor hop, the last
    round must be all-quiet to return) gives coverage 2^(max_rounds-2),
    so ``max_rounds=15`` guarantees a returned result for any component
    diameter up to 8192, where the plain neighbor-min recurrence
    (t_dedup_clusters' pre-round-8 form, round 7's documented scale
    edge) needs a round PER HOP and silently splits any component whose
    diameter exceeds the cap.

    Contract hardening over the plain form: if the fixpoint is NOT
    reached within ``max_rounds`` this RAISES instead of returning
    partially-propagated labels — at a fixpoint labels are provably
    constant per component (stability across every edge forces equality,
    and the component minimum keeps its own id), so a returned result is
    always exact.

    ``edges`` must be the symmetrized, distinct (src, dst) candidate
    graph; ``ckpt`` is a lineage-truncating checkpoint function (see
    :func:`_reliable_ckpt`). Production path of t_dedup_clusters since
    round 8 (pytest-proven: random graphs vs union-find, and a 120-hop
    chain the 15-round plain form cannot close)."""
    labels = ckpt(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
    )
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        jump = labels.join(
            labels.select(
                F.col("doc_id").alias("lbl"), F.col("lbl").alias("jlbl")
            ),
            "lbl",
            "left",
        )
        new_labels = ckpt(
            jump.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("jlbl"), F.col("lbl")),
                    F.coalesce(F.col("nlbl"), F.col("lbl")),
                ).alias("lbl"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("doc_id", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"min_label_components_doubling: no fixpoint in {max_rounds} "
        f"rounds (component diameter > 2^{max_rounds - 2}) — raise "
        "max_rounds"
    )
