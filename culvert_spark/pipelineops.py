"""Training-data pipeline operators, batch 2: PII redaction, text
normalization, chunking with overlap, deterministic sampling, embedding
quantization, and unigram LM quality scoring (SURVEY.md §2 Tier B additions
beyond the reference, which has no text surface — reference repo is a Hive
streaming-ingest benchmark only, see ``/root/reference/README.md``).

Design rules are identical to textops.py: deterministic pure functions of the
input expressed with JVM-side built-in functions (zero Python UDFs), each with
a DuckDB oracle that performs the same computation. md5 is the cross-engine
hash (bit-identical in Spark and DuckDB); float reductions either stay
integer-exact, use a fixed left-to-right in-row expression chain, or round
per-row and sum as DECIMAL so partition order cannot change the result.

Scale notes (100 TB):
- Redaction / normalization / chunking are *narrow* maps — no shuffle at all;
  they scale linearly with input splits and stay inside whole-stage codegen.
- Sampling is a deterministic hash filter (narrow) or a bounded per-stratum
  top-N (one shuffle on the stratum key; N rows per stratum survive).
- Unigram scoring shuffles on token to build the vocabulary (bounded by
  |vocab|, not corpus size) and joins it back; AQE picks broadcast vs shuffle
  join by the measured vocab size.
- Quantization is a narrow map; the per-label report is a partial-agg shuffle
  on a low-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from culvert_spark.queries import QUERIES, ORACLE, cexpr, register, spread, t  # noqa: F401
from culvert_spark.textops import DIM, TOK_DUCK, TOK_SPARK

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2 (DuckDB) and java.util.regex (Spark) agree on these patterns: no
# backreferences, no lookaround; greedy quantifiers over disjoint character
# classes make leftmost-first (Java) and leftmost-longest (RE2) coincide.
_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PHONE_RE = r"\+[0-9][0-9 ]{5,}[0-9]"


def _sp(pat: str) -> str:
    """Escape a regex for embedding in a Spark SQL single-quoted literal
    (Spark's SQL parser consumes one level of backslash escaping; DuckDB's
    standard literals do not)."""
    return pat.replace("\\", "\\\\")

# The corpus is synthetic prose with no real PII, so both engines first
# append the SAME deterministic PII tail (email + IP + phone derived from
# doc_id), then redact it; the oracle hash then verifies the regex machinery
# end-to-end rather than a trivially-empty match set.
_AUG_SPARK = (
    "concat(text, ' contact user', cast(doc_id as string), "
    "'@example.com from 10.', cast(doc_id % 200 as string), "
    "'.0.', cast(doc_id % 250 as string), "
    "' tel +1 555 01', cast(doc_id % 90 + 10 as string))"
)
_AUG_DUCK = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
    "'@example.com from 10.', CAST(doc_id % 200 AS VARCHAR), "
    "'.0.', CAST(doc_id % 250 AS VARCHAR), "
    "' tel +1 555 01', CAST(doc_id % 90 + 10 AS VARCHAR))"
)


def _redact_spark(expr: str) -> str:
    out = f"regexp_replace({expr}, '{_sp(_EMAIL_RE)}', '<EMAIL>')"
    out = f"regexp_replace({out}, '{_sp(_IPV4_RE)}', '<IP>')"
    return f"regexp_replace({out}, '{_sp(_PHONE_RE)}', '<PHONE>')"


def _redact_duck(expr: str) -> str:
    out = f"regexp_replace({expr}, '{_EMAIL_RE}', '<EMAIL>', 'g')"
    out = f"regexp_replace({out}, '{_IPV4_RE}', '<IP>', 'g')"
    return f"regexp_replace({out}, '{_PHONE_RE}', '<PHONE>', 'g')"


@register(
    "t_pii_redaction",
    f"""
    WITH aug AS (SELECT source, {_AUG_DUCK} AS augtext FROM documents),
    red AS (
      SELECT source,
             len(regexp_extract_all(augtext, '{_EMAIL_RE}')) AS n_email,
             len(regexp_extract_all(augtext, '{_IPV4_RE}')) AS n_ip,
             len(regexp_extract_all(augtext, '{_PHONE_RE}')) AS n_phone,
             {_redact_duck('augtext')} AS redacted
      FROM aug)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_ip) AS BIGINT) AS ips,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           COUNT(DISTINCT md5(redacted)) AS distinct_redacted
    FROM red
    GROUP BY source
    ORDER BY source
    """,
)
def t_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII detection + redaction (emails, IPv4, phone numbers) as a
    narrow JVM-side map; the per-source report aggregates match counts and a
    distinct-hash of the redacted text so the oracle verifies the exact
    redacted bytes. At 100 TB this is a pure scan→map→partial-agg pipeline —
    no shuffle before the final low-cardinality groupBy."""
    d = t(spark, sf_dir, "documents")
    aug = d.select(
        "source", F.expr(_AUG_SPARK).alias("augtext")
    )
    red = aug.select(
        "source",
        F.expr(f"regexp_count(augtext, '{_sp(_EMAIL_RE)}')").alias("n_email"),
        F.expr(f"regexp_count(augtext, '{_sp(_IPV4_RE)}')").alias("n_ip"),
        F.expr(f"regexp_count(augtext, '{_sp(_PHONE_RE)}')").alias("n_phone"),
        F.expr(_redact_spark("augtext")).alias("redacted"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").alias("emails"),
            F.sum("n_ip").alias("ips"),
            F.sum("n_phone").alias("phones"),
            F.countDistinct(F.md5("redacted")).alias("distinct_redacted"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------


@register(
    "t_text_normalize",
    """
    WITH norm AS (
      SELECT source,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(norm)) AS distinct_norm,
           CAST(SUM(len(norm)) AS BIGINT) AS total_norm_chars
    FROM norm
    GROUP BY source
    ORDER BY source
    """,
)
def t_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase, strip punctuation, collapse
    whitespace) — the standard pre-dedup cleanup pass. Narrow map; the
    distinct-hash per source verifies the normalized bytes."""
    d = t(spark, sf_dir, "documents")
    norm = d.select(
        "source",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
        ).alias("norm"),
    )
    return (
        norm.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("norm")).alias("distinct_norm"),
            F.sum(F.length("norm")).alias("total_norm_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Document chunking with overlap
# ---------------------------------------------------------------------------

_CHUNK = 64  # tokens per chunk
_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "t_doc_chunks",
    f"""
    WITH tk AS (SELECT doc_id, {TOK_DUCK} AS toks FROM documents),
    st AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start
      FROM tk)
    SELECT doc_id,
           CAST(FLOOR(start / {_STRIDE}) AS INT) AS chunk_idx,
           len(list_slice(toks, start + 1, start + {_CHUNK})) AS chunk_tokens,
           md5(array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' ')) AS chunk_hash
    FROM st
    ORDER BY doc_id, chunk_idx
    """,
)
def t_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (64-token windows, stride 48)
    — the standard long-document → training-sample splitter. Implemented as
    sequence + explode + slice: a narrow generate, no shuffle, and the output
    row count is sum(ceil(n_tokens/stride)), linear in corpus size. The
    chunk hash verifies exact chunk content against the oracle."""
    d = t(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.expr(TOK_SPARK).alias("toks"))
    st = tk.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(f"sequence(0, size(toks) - 1, {_STRIDE})")
        ).alias("start"),
    )
    chunk = F.expr(f"slice(toks, start + 1, {_CHUNK})")
    return st.select(
        "doc_id",
        F.expr(f"cast(floor(start / {_STRIDE}) as int)").alias("chunk_idx"),
        F.size(chunk).alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


@register(
    "t_stratified_sample",
    """
    SELECT lang, rk, doc_id FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) s
    WHERE rk <= 10
    ORDER BY lang, rk
    """,
)
def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: top-10 docs per language stratum
    ordered by md5(doc_id) — a seedless, engine-portable shuffle order (md5
    hex is bit-identical everywhere), so the same sample reproduces on any
    engine and any cluster size. One shuffle on the stratum key; only N rows
    per stratum survive the window."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .select("lang", "rk", "doc_id")
        .orderBy("lang", "rk")
    )


@register(
    "t_hash_sample_rate",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0') THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           ROUND(CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS sample_frac
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def t_hash_sample_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sampling by hash prefix (md5 first hex digit
    = '0' → ~1/16 ≈ 6.25% rate): a narrow filter with zero coordination, the
    scale-safe way to subsample 100 TB (no RNG state, no seed skew across
    executors, trivially resumable). Reports achieved rate per stratum."""
    d = t(spark, sf_dir, "documents")
    hit = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    ).cast("long")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(hit).alias("n_sampled"),
            F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias(
                "sample_frac"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization
# ---------------------------------------------------------------------------


def _absmax(alias: str, spark_dialect: bool) -> str:
    cast = "cast" if spark_dialect else "CAST"
    off = 0 if spark_dialect else 1
    terms = [
        f"abs({cast}({alias}[{i + off}] AS DOUBLE))" for i in range(DIM)
    ]
    return "greatest(" + ", ".join(terms) + ", 1e-12)"


def _qterm(alias: str, i: int, spark_dialect: bool) -> str:
    cast = "cast" if spark_dialect else "CAST"
    off = 0 if spark_dialect else 1
    return (
        f"{cast}(round(127.0 * {cast}({alias}[{i + off}] AS DOUBLE) / qscale)"
        f" AS INT)"
    )


def _qsum(alias: str, spark_dialect: bool) -> str:
    return "(" + " + ".join(
        _qterm(alias, i, spark_dialect) for i in range(DIM)
    ) + ")"


def _qerr(alias: str, spark_dialect: bool) -> str:
    cast = "cast" if spark_dialect else "CAST"
    off = 0 if spark_dialect else 1
    terms = [
        f"abs({cast}({alias}[{i + off}] AS DOUBLE)"
        f" - {_qterm(alias, i, spark_dialect)} * qscale / 127.0)"
        for i in range(DIM)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "s_embedding_quantize_int8",
    f"""
    WITH s AS (
      SELECT label, embedding, {_absmax('embedding', False)} AS qscale
      FROM embeddings),
    q AS (
      SELECT label,
             {_qsum('embedding', False)} AS qsum,
             CAST(ROUND({_qerr('embedding', False)}, 6) AS DECIMAL(18,6)) AS err
      FROM s)
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(qsum) AS BIGINT) AS qsum_total,
           ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 4) AS avg_abs_err
    FROM q
    GROUP BY label
    ORDER BY label
    """,
)
def s_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of embeddings (per-vector absmax
    scale, the standard ANN index compression: 4× smaller than float32).
    Narrow map — each vector quantizes independently inside codegen; the
    per-label report sums the integer quantized components (exact checksum
    of the quantized codes) and the mean L1 reconstruction error (rounded
    per-row, summed as DECIMAL for partition-order determinism)."""
    e = spread(t(spark, sf_dir, "embeddings").select("label", "embedding"))
    s = e.select(
        "label",
        "embedding",
        F.expr(_absmax("embedding", True)).alias("qscale"),
    )
    q = s.select(
        "label",
        F.expr(_qsum("embedding", True)).alias("qsum"),
        F.expr(
            f"cast(round({_qerr('embedding', True)}, 6) as decimal(18,6))"
        ).alias("err"),
    )
    return (
        q.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("qsum").alias("qsum_total"),
            F.round(F.sum("err").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_abs_err"
            ),
        )
        .orderBy("label")
    )


def floordiv_sql(numer: str, den: str) -> str:
    """Spark SQL floor division for a POSITIVE denominator, correct for
    negative numerators too. Spark's ``div`` truncates toward zero while
    DuckDB's ``//`` floors, so any oracle-paired integer division that can
    see a negative numerator must go through this (used by the gap-fill
    interpolation so negative series round identically on both engines)."""
    return (
        f"(({numer}) div ({den})"
        f" - (case when ({numer}) % ({den}) != 0 and ({numer}) < 0"
        f" then 1 else 0 end))"
    )


# ---------------------------------------------------------------------------
# Funnel analysis
# ---------------------------------------------------------------------------


@register(
    "q_funnel_steps",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS step1_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS step2_click,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS step3_purchase
    FROM per_user
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users whose FIRST view precedes their first click
    precedes their first purchase (strict event-order funnel, the standard
    product-analytics query). One shuffle on user_id collapses each user to
    a single row of first-touch timestamps (conditional MIN — no sorting,
    no per-user event list materialized), then a global count. NULL
    comparisons drop non-converters for free (NULL > x is never true)."""
    e = t(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(
            F.when(F.col("event_type") == etype, F.col("ts"))
        ).alias(f"t_{etype}")

    per_user = e.groupBy("user_id").agg(
        first_ts("view"), first_ts("click"), first_ts("purchase")
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(s1.cast("long")).alias("step1_view"),
        F.sum(s2.cast("long")).alias("step2_click"),
        F.sum(s3.cast("long")).alias("step3_purchase"),
    )


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


@register(
    "q_cohort_retention",
    """
    WITH firstday AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           COUNT(DISTINCT f.user_id) AS cohort_size,
           COUNT(DISTINCT CASE WHEN a.d = f.cohort_day + 1
                               THEN a.user_id END) AS retained_d1,
           COUNT(DISTINCT CASE WHEN a.d >= f.cohort_day + 7
                                AND a.d < f.cohort_day + 14
                               THEN a.user_id END) AS retained_wk2
    FROM firstday f JOIN activity a USING (user_id)
    GROUP BY f.cohort_day
    ORDER BY f.cohort_day
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, measured for
    day-1 and week-2 return activity — the canonical growth-analytics
    rollup. Two shuffles on user_id (first-touch min, distinct activity
    days) then one equi-join back on user_id; all counts integer-exact.
    At 100 TB the activity de-dup is the heavy step and is exactly the
    partial-agg shape Spark optimizes (distinct → two-phase aggregate)."""
    e = t(spark, sf_dir, "events")
    firstday = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    j = firstday.join(activity, "user_id")
    # Date columns render differently across pandas paths (date vs midnight
    # datetime); an ISO string is the canonicalization-proof output type.
    return (
        j.groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(
                    F.col("d") == F.date_add(F.col("cohort_day"), 1),
                    F.col("user_id"),
                )
            ).alias("retained_d1"),
            F.countDistinct(
                F.when(
                    (F.col("d") >= F.date_add(F.col("cohort_day"), 7))
                    & (F.col("d") < F.date_add(F.col("cohort_day"), 14)),
                    F.col("user_id"),
                )
            ).alias("retained_wk2"),
        )
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "cohort_size",
            "retained_d1",
            "retained_wk2",
        )
        .orderBy("cohort_day")
    )


# ---------------------------------------------------------------------------
# Semi-structured VARIANT (Spark 4 native JSON type)
# ---------------------------------------------------------------------------


@register(
    "q_variant_props",
    """
    WITH kv AS (
      SELECT event_type, CAST(props->>'$.k' AS INTEGER) AS k FROM events)
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM kv
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` ingests the raw JSON column once into the binary variant
    encoding, ``variant_get`` then extracts typed paths without re-parsing
    — the scale-correct pattern for JSON-heavy event tables (parse cost
    paid once per row, not once per extracted field; shredded storage
    ready). Functionally equivalent to ``get_json_object`` (q_json_props)
    but typed and O(1) per additional path."""
    e = t(spark, sf_dir, "events")
    kv = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
    )
    return (
        kv.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Null-safe join
# ---------------------------------------------------------------------------


@register(
    "q_nullsafe_join",
    """
    WITH a AS (
      SELECT NULLIF(user_id % 10, 0) AS nk, COUNT(*) AS cnt_a
      FROM events GROUP BY NULLIF(user_id % 10, 0)),
    b AS (
      SELECT NULLIF(user_id % 10, 0) AS nk,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS views
      FROM events GROUP BY NULLIF(user_id % 10, 0))
    SELECT COALESCE(CAST(a.nk AS VARCHAR), 'NULL') AS nk, a.cnt_a, b.views
    FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
    ORDER BY nk
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics you need
    when joining on optional attributes. Catalyst treats EqualNullSafe as a
    real equi-join condition, so this still plans as a hash/sort-merge
    join, not a nested loop. Null keys are manufactured with NULLIF so the
    match-on-NULL path is actually exercised; the output key is stringified
    (NULL sentinel) for canonicalization stability."""
    e = t(spark, sf_dir, "events")
    nk = F.expr("nullif(user_id % 10, 0)")
    a = e.groupBy(nk.alias("nk")).agg(F.count(F.lit(1)).alias("cnt_a"))
    b = e.groupBy(nk.alias("nk")).agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("views")
    )
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.nk").eqNullSafe(F.col("b.nk")))
        .select(
            F.coalesce(F.col("a.nk").cast("string"), F.lit("NULL")).alias(
                "nk"
            ),
            "cnt_a",
            "views",
        )
        .orderBy("nk")
    )


# ---------------------------------------------------------------------------
# Skew diagnostics
# ---------------------------------------------------------------------------


@register(
    "q_skew_report",
    """
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
    stats AS (
      SELECT COUNT(*) AS n_keys,
             CAST(MIN(cnt) AS BIGINT) AS min_cnt,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(quantile_disc(cnt, 0.5) AS BIGINT) AS median_cnt
      FROM per_key)
    SELECT n_keys, min_cnt, median_cnt, max_cnt, total_rows,
           ROUND(CAST(max_cnt AS DOUBLE) / median_cnt, 6) AS skew_factor,
           CASE WHEN CAST(max_cnt AS DOUBLE) / median_cnt > 4.0
                THEN 1 ELSE 0 END AS needs_salting
    FROM stats
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics for a prospective shuffle key: per-key counts
    (one partial+final agg), then min/median/max and the max/median skew
    factor with a salting recommendation — the report you run BEFORE keying
    a 100 TB join or agg on a column. The per-key histogram never leaves
    the cluster; only the 1-row summary returns. percentile on the count
    column is exact-discrete (matches DuckDB quantile_disc) so the oracle
    hash-checks it."""
    e = t(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("cnt").alias("min_cnt"),
        F.expr("percentile_approx(cnt, 0.5, 1000000)").alias("median_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").alias("total_rows"),
    )
    skew = F.round(F.col("max_cnt").cast("double") / F.col("median_cnt"), 6)
    return stats.select(
        "n_keys",
        "min_cnt",
        "median_cnt",
        "max_cnt",
        "total_rows",
        skew.alias("skew_factor"),
        F.when(
            F.col("max_cnt").cast("double") / F.col("median_cnt") > 4.0, 1
        )
        .otherwise(0)
        .alias("needs_salting"),
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketches (Apache DataSketches via Spark built-ins)
# ---------------------------------------------------------------------------


@register(
    "q_hll_sketch_users",
    """
    WITH per AS (
      SELECT event_type,
             COUNT(DISTINCT user_id) AS exact_users,
             1 AS within_5pct,
             CAST(NULL AS BIGINT) AS est_if_deviant
      FROM events GROUP BY event_type),
    total AS (
      SELECT 'ALL' AS event_type,
             COUNT(DISTINCT user_id) AS exact_users,
             1 AS within_5pct,
             CAST(NULL AS BIGINT) AS est_if_deviant
      FROM events)
    SELECT * FROM per UNION ALL SELECT * FROM total
    ORDER BY event_type
    """,
)
def q_hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-event-type HLL sketches
    (``hll_sketch_agg``, Apache DataSketches) whose *binary sketches* are
    then re-aggregated with ``hll_union_agg`` for the global count — the
    100 TB pattern where per-partition/per-day sketches are stored once and
    merged at query time instead of rescanning raw data. Estimates are
    deterministic for fixed input; the oracle uses the tolerance pattern
    (exact distinct + literal flag) because DuckDB has no HLL: Spark emits
    the EXACT count too and a flag that the sketch estimate landed within
    5% of it, so the driver hash-checks exactness and bounds the sketch."""
    e = t(spark, sf_dir, "events")
    per = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.expr("hll_sketch_agg(user_id)").alias("sk"),
        )
    )
    # est_if_deviant: NULL while the 5% bound holds (hash-stable) but the
    # measured sketch estimate in any future mismatch diff — a tolerance
    # failure is diagnosable from the CORRECTNESS record alone.
    per_within = (
        F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    )
    per_out = per.select(
        "event_type",
        "exact_users",
        per_within.cast("int").alias("within_5pct"),
        F.when(~per_within, F.expr("hll_sketch_estimate(sk)"))
        .cast("bigint")
        .alias("est_if_deviant"),
    )
    tot_within = (
        F.abs(F.col("est") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    )
    total = (
        per.select(F.col("sk"), F.col("exact_users"))
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
        )
        .crossJoin(
            e.agg(F.countDistinct("user_id").alias("exact_users"))
        )
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_users",
            tot_within.cast("int").alias("within_5pct"),
            F.when(~tot_within, F.col("est"))
            .cast("bigint")
            .alias("est_if_deviant"),
        )
    )
    return per_out.unionByName(total).orderBy("event_type")


# ---------------------------------------------------------------------------
# Time-series gap fill + linear interpolation
# ---------------------------------------------------------------------------


@register(
    "q_timeseries_gapfill",
    """
    WITH src AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hr,
             CAST(ROUND(value * 1000000) AS BIGINT) AS vmic
      FROM events WHERE user_id < 8),
    hourly AS (
      SELECT user_id, hr,
             (2 * CAST(SUM(vmic) AS BIGINT) + COUNT(*)) // (2 * COUNT(*)) AS v
      FROM src GROUP BY user_id, hr),
    bounds AS (
      SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM hourly GROUP BY user_id),
    grid AS (
      SELECT b.user_id, unnest(generate_series(b.mn, b.mx, INTERVAL '1 hour')) AS hr
      FROM bounds b),
    joined AS (
      SELECT g.user_id, g.hr, h.v FROM grid g
      LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr),
    ctx AS (
      SELECT user_id, hr, v,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER w_prev AS pt,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER w_next AS nt
      FROM joined
      WINDOW w_prev AS (PARTITION BY user_id ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY user_id ORDER BY hr
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, hr,
           CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS filled,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE (2 * (pv * ((CAST(epoch(nt) AS BIGINT) - CAST(epoch(hr) AS BIGINT)) // 3600)
                        + nv * ((CAST(epoch(hr) AS BIGINT) - CAST(epoch(pt) AS BIGINT)) // 3600))
                   + (CAST(epoch(nt) AS BIGINT) - CAST(epoch(pt) AS BIGINT)) // 3600)
                  // (2 * ((CAST(epoch(nt) AS BIGINT) - CAST(epoch(pt) AS BIGINT)) // 3600))
           END AS v_filled_micros
    FROM ctx
    ORDER BY user_id, hr
    """,
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: densify each user's hourly series over its own
    [min, max] hour range (sequence + explode — rows generated
    distributively, never on the driver), then linearly interpolate missing
    hours from the nearest non-null neighbors via IGNORE NULLS window
    carries. All values live in integer micro-units with explicit
    half-up integer rounding, so the result is bit-identical regardless of
    partition order, engine, or float rounding mode (a naive double
    interpolation lands exactly on round-half boundaries whenever a
    single-hour gap averages two 6-decimal neighbors). Two shuffles total
    (hourly agg, window by user) — both key on user_id and survive any
    scale."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    hourly = (
        e.select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("hr"),
            F.expr("cast(round(value * 1000000) as bigint)").alias("vmic"),
        )
        .groupBy("user_id", "hr")
        .agg(
            F.expr(
                floordiv_sql("2 * sum(vmic) + count(*)", "2 * count(*)")
            ).alias("v")
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(mn, mx, interval 1 hour)")
            ).alias("hr"),
        )
    )
    joined = grid.join(hourly, ["user_id", "hr"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    vt = F.when(F.col("v").isNotNull(), F.col("hr"))
    ctx = joined.select(
        "user_id",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(vt, ignorenulls=True).over(w_prev).alias("pt"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(vt, ignorenulls=True).over(w_next).alias("nt"),
    )
    j_next = "((cast(nt as long) - cast(hr as long)) div 3600)"
    j_prev = "((cast(hr as long) - cast(pt as long)) div 3600)"
    n_span = "((cast(nt as long) - cast(pt as long)) div 3600)"
    # Floor division (not `div`) so negative-valued series round the same
    # half-up way on both engines (DuckDB `//` floors; Spark div truncates).
    interp = F.expr(
        floordiv_sql(
            f"2 * (pv * {j_next} + nv * {j_prev}) + {n_span}",
            f"2 * {n_span}",
        )
    )
    v_filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
    )
    return ctx.select(
        "user_id",
        "hr",
        F.when(F.col("v").isNotNull(), 0).otherwise(1).alias("filled"),
        v_filled.alias("v_filled_micros"),
    ).orderBy("user_id", "hr")


# ---------------------------------------------------------------------------
# Unigram LM quality scoring
# ---------------------------------------------------------------------------


@register(
    "t_unigram_lm_score",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({TOK_DUCK}) AS tk FROM documents),
    v AS (SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY tk)
    SELECT t.doc_id,
           ROUND(CAST(SUM(v.cnt) AS DOUBLE) / COUNT(*), 6) AS avg_tok_freq
    FROM tok t JOIN v USING (tk)
    GROUP BY t.doc_id
    ORDER BY avg_tok_freq DESC, doc_id
    LIMIT 20
    """,
)
def t_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram quality score per document: mean corpus frequency of
    the doc's tokens (the integer-exact core of perplexity-style filtering —
    high score = generic/repetitive text, low = rare-token text). Builds the
    vocabulary with one token-keyed shuffle (bounded by |vocab|), joins it
    back (AQE broadcasts when the vocab is small), and takes the global
    top-20 via TakeOrdered — no full sort materializes."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.expr(TOK_SPARK)).alias("tk")
    )
    vocab = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tok.join(vocab, "tk")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum("cnt").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_tok_freq")
        )
        .orderBy(F.col("avg_tok_freq").desc(), "doc_id")
        .limit(20)
    )
