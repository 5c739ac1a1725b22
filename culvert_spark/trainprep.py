"""Training-data preparation operators (round 3 batch): deterministic
global shuffle, context-length truncation accounting, quality-percentile
filtering, Gopher-style heuristic quality rules, and SemDeDup-style
semantic dedup by centroid representative.

These extend the LLM-pipeline surface (SURVEY.md §2 Tier B) with the
remaining steps a pretraining data pipeline runs between "cleaned corpus"
and "training shards". Same design rules as textops.py: JVM-side built-in
functions only, md5-based hashing (bit-identical across Spark and DuckDB),
fixed left-to-right float summation where a float reduction exists, and a
DuckDB oracle that performs the same computation.

Scale notes (100 TB):
- The deterministic shuffle is ONE hash-partitioned window — shard count
  scales with the corpus (shard ≈ fixed row budget), so no shard's window
  serializes on a single task.
- Truncation stats and Gopher rules are narrow maps + a low-cardinality
  aggregate: they never shuffle the corpus.
- Percentile filtering shuffles once on `source`; at 100 TB a giant
  source would route through the two-level segmentation helper
  (culvert_spark/twolevel.py) like the other user-partitioned windows.
- Semantic dedup buckets on an 8-bit hyperplane signature (bounded
  occupancy), computes per-bucket centroids from a posexplode aggregate
  (shuffle bounded by buckets x dims, not the corpus), and broadcasts the
  centroid table (<=256 rows) back for the cosine scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from culvert_spark.queries import QUERIES, ORACLE, cexpr, register, spread, t  # noqa: F401
from culvert_spark.textops import (  # noqa: F401
    DIM,
    TOK_DUCK,
    TOK_SPARK,
    _SIGNS,
    _bucket_expr,
    bucket_from_projections,
    with_hyperplane_projections,
    _hex60_duck,
    _hex60_spark,
)

_N_SHARDS = 8


@register(
    "t_deterministic_shuffle",
    f"""
    SELECT shard, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
             AS pos, doc_id
    FROM (SELECT doc_id,
                 {_hex60_duck("('shuf|' || CAST(doc_id AS VARCHAR))")} AS h,
                 {_hex60_duck("('shuf|' || CAST(doc_id AS VARCHAR))")} % {_N_SHARDS}
                   AS shard
          FROM documents)
    ORDER BY shard, pos
    """,
)
def t_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training shards: every doc gets a
    (shard, position) that is a pure function of doc_id — the reproducible
    pseudo-random permutation a data loader needs so that run N and a
    resumed run N' read the identical byte order. shard = md5 bucket;
    position = rank of the md5 value within the shard.

    Scale shape: one shuffle on `shard`; shard count scales with the
    corpus (fixed rows-per-shard budget), so the per-shard ordering window
    never sees more than the shard budget. No global sort exists anywhere:
    ordering is per-shard."""
    d = spread(t(spark, sf_dir, "documents").select("doc_id"))
    h = F.expr(_hex60_spark("concat('shuf|', cast(doc_id as string))"))
    d = d.select("doc_id", h.alias("h"), (h % _N_SHARDS).alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select(
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
            "doc_id",
        )
        .orderBy("shard", "pos")
    )


_CTX = (32, 64, 96)


@register(
    "t_context_truncation_stats",
    f"""
    SELECT source, c.ctx AS ctx,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_tok > c.ctx THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_over,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(GREATEST(n_tok - c.ctx, 0)) AS BIGINT) AS tokens_lost,
           ROUND(CAST(SUM(GREATEST(n_tok - c.ctx, 0)) AS DOUBLE)
                 / SUM(n_tok), 6) AS pct_tokens_lost
    FROM (SELECT source, len({TOK_DUCK}) AS n_tok FROM documents),
         (VALUES {", ".join(f"({c})" for c in _CTX)}) c(ctx)
    GROUP BY source, c.ctx
    ORDER BY source, ctx
    """,
)
def t_context_truncation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation accounting: for each source and each
    candidate context length, how many documents exceed it and how many
    tokens a hard truncation would discard — the table that decides the
    packing/chunking strategy before training. Integer arithmetic
    throughout; the only division is the final ratio.

    Scale shape: narrow token count per doc, then one aggregate of
    |sources| x |ctx| groups — map-side combine absorbs the corpus."""
    d = t(spark, sf_dir, "documents").select(
        "source", F.expr(f"size({TOK_SPARK})").alias("n_tok")
    )
    d = d.select(
        "source",
        "n_tok",
        F.explode(F.array(*[F.lit(c) for c in _CTX])).alias("ctx"),
    )
    lost = F.greatest(F.col("n_tok") - F.col("ctx"), F.lit(0))
    return (
        d.groupBy("source", "ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n_tok") > F.col("ctx"), 1).otherwise(0)
            ).alias("n_docs_over"),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
            F.sum(lost).cast("bigint").alias("tokens_lost"),
            F.round(
                F.sum(lost).cast("double") / F.sum("n_tok"), 6
            ).alias("pct_tokens_lost"),
        )
        .orderBy("source", "ctx")
    )


@register(
    "t_quality_percentile_filter",
    f"""
    SELECT source, doc_id, ROUND(qs, 6) AS quality_score, ROUND(pr, 6) AS pr
    FROM (
      SELECT source, doc_id, qs,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY qs DESC, doc_id) AS pr
      FROM (
        SELECT source, doc_id,
               CAST(LENGTH(text)
                    - 10 * len(list_filter({TOK_DUCK},
                               x -> x = 'a' OR x = 'the')) AS DOUBLE)
               / len({TOK_DUCK}) AS qs
        FROM documents))
    WHERE pr <= 0.5
    ORDER BY source, doc_id
    """,
)
def t_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-percentile filter: keep the top half of each
    source by the t_quality_scores scoring rule — the "filter by quality
    classifier percentile, stratified by domain" step of a pretraining
    mix. percent_rank is computed over a total order (score, doc_id) so
    ranks are deterministic under ties.

    Scale shape: one shuffle on source; at 100 TB a giant source uses
    the approx-percentile threshold instead of an exact rank (compute the
    per-source score threshold with percentile_approx — a mergeable
    sketch — then a narrow filter; same contract, no ordered window)."""
    d = t(spark, sf_dir, "documents")
    qs = (
        F.length("text")
        - 10
        * F.expr(f"size(filter({TOK_SPARK}, x -> x = 'a' OR x = 'the'))")
    ).cast("double") / F.expr(f"size({TOK_SPARK})")
    scored = spread(d.select("source", "doc_id", qs.alias("qs")))
    w = Window.partitionBy("source").orderBy(F.desc("qs"), "doc_id")
    return (
        scored.select(
            "source",
            "doc_id",
            "qs",
            F.percent_rank().over(w).alias("pr"),
        )
        .filter(F.col("pr") <= 0.5)
        .select(
            "source",
            "doc_id",
            F.round("qs", 6).alias("quality_score"),
            F.round("pr", 6).alias("pr"),
        )
        .orderBy("source", "doc_id")
    )


@register(
    "t_quality_percentile_filter_approx",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE pr <= 0.5) AS n_kept_exact,
           1 AS within_tol,
           CAST(NULL AS BIGINT) AS kept_if_deviant
    FROM (
      SELECT source, doc_id,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY qs DESC, doc_id) AS pr
      FROM (
        SELECT source, doc_id,
               CAST(LENGTH(text)
                    - 10 * len(list_filter({TOK_DUCK},
                               x -> x = 'a' OR x = 'the')) AS DOUBLE)
               / len({TOK_DUCK})
               + CAST(doc_id % 100003 AS DOUBLE) * 1e-13 AS qs
        FROM documents))
    GROUP BY source
    ORDER BY source
    """,
)
def t_quality_percentile_filter_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB twin of t_quality_percentile_filter, registered as a
    driver row (round-4 verdict item 5): instead of an exact per-source
    percent_rank (an ordered window over every source's full score list),
    the keep threshold is ``percentile_approx(qs, 0.5)`` — a mergeable
    Greenwald-Khanna sketch aggregated per source (two shuffled numbers
    per source) — followed by a NARROW broadcast-join filter
    ``qs >= threshold``. Same contract, no ordered window, which is the
    only formulation that survives a source with 10^10 documents.

    Tolerance-oracle shape: the exact kept count per source is emitted
    next to a flag that the approx-threshold kept count landed within
    max(2% of n_docs, ±2 docs) of it (the floor absorbs boundary docs on
    small sources); kept_if_deviant surfaces the approx count in any
    future mismatch diff.

    Tie robustness (round-5 ADVICE): a raw score has ties (many docs
    share a length/token profile), and around the median a tie group
    makes ``qs >= threshold`` (counts the whole group) and
    ``percent_rank <= 0.5`` (counts to the group's first rank) diverge
    by the group size — a data change could then blow the ±2 floor. The
    score is therefore made UNIQUE with a deterministic doc_id-derived
    epsilon, ``+ (doc_id % 100003) * 1e-13`` — far below any meaningful
    score gap (scores are O(1)), identical IEEE arithmetic on both
    engines, so both sides count the same strictly-ordered set and the
    only remaining divergence is genuine sketch error."""
    d = t(spark, sf_dir, "documents")
    qs = (
        F.length("text")
        - 10
        * F.expr(f"size(filter({TOK_SPARK}, x -> x = 'a' OR x = 'the'))")
    ).cast("double") / F.expr(f"size({TOK_SPARK})") + (
        F.col("doc_id") % 100003
    ).cast("double") * F.lit(1e-13)
    scored = spread(d.select("source", "doc_id", qs.alias("qs")))
    thr = scored.groupBy("source").agg(
        F.percentile_approx("qs", 0.5, 10000).alias("thr")
    )
    n_kept_approx = (
        scored.join(broadcast(thr), "source")
        .where(F.col("qs") >= F.col("thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept_approx"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("qs"), "doc_id")
    exact = (
        scored.select("source", F.percent_rank().over(w).alias("pr"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("pr") <= 0.5, 1).otherwise(0)).alias(
                "n_kept_exact"
            ),
        )
    )
    within = F.abs(
        F.col("n_kept_approx") - F.col("n_kept_exact")
    ) <= F.greatest(0.02 * F.col("n_docs"), F.lit(2.0))
    return (
        exact.join(n_kept_approx, "source")
        .select(
            "source",
            "n_docs",
            "n_kept_exact",
            within.cast("int").alias("within_tol"),
            F.when(~within, F.col("n_kept_approx"))
            .cast("bigint")
            .alias("kept_if_deviant"),
        )
        .orderBy("source")
    )


@register(
    "t_gopher_quality_rules",
    f"""
    SELECT doc_id, n_words,
           ROUND(mwl, 6) AS mean_word_len,
           ROUND(alpha_ratio, 6) AS alpha_ratio,
           ROUND(hash_ratio, 6) AS symbol_ratio,
           (mwl >= 3 AND mwl <= 10 AND alpha_ratio >= 0.8
            AND hash_ratio <= 0.1) AS keep
    FROM (
      SELECT doc_id,
             len({TOK_DUCK}) AS n_words,
             CAST(LENGTH(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
               / len({TOK_DUCK}) AS mwl,
             CAST(len(list_filter({TOK_DUCK},
                      x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
               / len({TOK_DUCK}) AS alpha_ratio,
             CAST(LENGTH(text) - LENGTH(replace(text, '#', ''))
                  + LENGTH(text) - LENGTH(replace(text, '...', ''))
                  AS DOUBLE) / LENGTH(text) AS hash_ratio
      FROM documents)
    ORDER BY doc_id
    """,
)
def t_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021 §A.1.1
    re-expressed): mean word length in [3, 10], >=80% of words contain an
    alphabetic character, and <=10% symbol characters ('#' plus '...'
    ellipses) — each document gets its rule inputs and a final keep flag.
    Every ratio is a single division of exact integers (deterministic in
    double), rounded for presentation; the keep flag compares the RAW
    ratios so it never depends on rounding.

    Scale shape: narrow per-doc map, zero shuffles — the 100 TB workhorse
    shape (cf. SURVEY §9 "Text pipeline" row)."""
    d = t(spark, sf_dir, "documents")
    n_words = F.expr(f"size({TOK_SPARK})")
    mwl = (
        F.length(F.regexp_replace("text", r"\s+", "")).cast("double") / n_words
    )
    alpha = (
        F.expr(
            f"size(filter({TOK_SPARK}, x -> x rlike '[a-zA-Z]'))"
        ).cast("double")
        / n_words
    )
    symb = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
        + F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    ).cast("double") / F.length("text")
    scored = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mwl"),
        alpha.alias("alpha_ratio"),
        symb.alias("hash_ratio"),
    )
    return scored.select(
        "doc_id",
        "n_words",
        F.round("mwl", 6).alias("mean_word_len"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("hash_ratio", 6).alias("symbol_ratio"),
        (
            (F.col("mwl") >= 3)
            & (F.col("mwl") <= 10)
            & (F.col("alpha_ratio") >= 0.8)
            & (F.col("hash_ratio") <= 0.1)
        ).alias("keep"),
    ).orderBy("doc_id")


def _dot_list_duck(a: str, b: str) -> str:
    """Fixed-order dot product where either side may be a DuckDB list
    (1-based)."""
    terms = [
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)"
        for i in range(DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _dot_spark_cols(a: str, b: str) -> str:
    terms = [
        f"cast({a}[{i}] as double) * cast({b}[{i}] as double)"
        for i in range(DIM)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "s_semantic_dedup_rep",
    f"""
    WITH e AS (SELECT vec_id, embedding,
                      {_bucket_expr('embedding', False)} AS bucket
               FROM embeddings),
    cent AS (
      SELECT bucket, d.i AS pos,
             list_reduce(list(CAST(embedding[d.i] AS DOUBLE) ORDER BY vec_id),
                         (acc, x) -> acc + x) / COUNT(*) AS cd
      FROM e, range(1, {DIM + 1}) d(i)
      GROUP BY bucket, d.i),
    centv AS (SELECT bucket, list(cd ORDER BY pos) AS centroid
              FROM cent GROUP BY bucket),
    mem AS (SELECT bucket, COUNT(*) AS n_members FROM e GROUP BY bucket),
    scored AS (
      SELECT e.bucket, e.vec_id,
             {_dot_list_duck('e.embedding', 'c.centroid')}
             / (sqrt({_dot_list_duck('e.embedding', 'e.embedding')})
                * sqrt({_dot_list_duck('c.centroid', 'c.centroid')})) AS cos
      FROM e JOIN centv c ON c.bucket = e.bucket)
    SELECT s.bucket, s.vec_id AS rep_vec_id, m.n_members,
           ROUND(s.cos, 4) AS rep_cos
    FROM (SELECT bucket, vec_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY bucket
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM scored) s
    JOIN mem m ON m.bucket = s.bucket
    WHERE s.rn = 1
    ORDER BY s.bucket
    """,
)
def s_semantic_dedup_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023 re-expressed):
    bucket embeddings by the 8-bit hyperplane signature (the same
    deterministic planes as s_ann_lsh_top1), compute each bucket's
    centroid, and elect the member closest to the centroid as the bucket
    representative — the canonical doc a semantic-dedup pass would keep.

    Float determinism: the centroid's per-dimension sum is a fixed-order
    fold over members sorted by vec_id (Spark `aggregate` over a sorted
    collect_list == DuckDB `list_reduce` over an ORDER BY list — both
    left-to-right, and 0.0 + x == x exactly so the differing fold seeds
    agree), and the cosine is the fixed left-to-right 64-term dot.

    Scale shape (round-13 optimization, guide §2.3/§2.4): ONE bucket-grain
    aggregation collects each bucket's members (sorted by vec_id) and
    derives all 64 centroid dimensions plus the member count from that
    array — replacing the previous (bucket, pos) shape, which exploded
    every vector 64x before its aggregation (64x the shuffled rows, each
    value paying its own struct/row overhead) and then needed a second
    re-assembly aggregation plus a THIRD aggregation + broadcast join
    just for n_members. The per-dimension fold order over the sorted
    member array is unchanged (same adds, same doubles, bit-identical
    output — hash-pinned by the unchanged DuckDB oracle). Group state is
    bounded by bucket occupancy exactly as before (the 64 per-dim lists
    jointly held the same values); at 100 TB the signature widens so
    occupancy stays bounded (SURVEY §9 "Embedding ANN"), and the sorted
    member fold would become a decimal-sum partial aggregate at scale
    (documented trade: the fold keeps the oracle bit-exact). The
    centroid table (<=256 rows) broadcasts back for scoring."""
    e = (
        with_hyperplane_projections(
            spread(
                t(spark, sf_dir, "embeddings").select(
                    cexpr("vec_id"), cexpr("embedding")
                )
            ),
            "embedding",
            _SIGNS,
            "_q",
        )
        .withColumn("bucket", bucket_from_projections("_q"))
        .drop(*[f"_q{j}" for j in range(len(_SIGNS))])
    )
    # Round 14: aliases, the cast, the row_number window, and the final
    # projections are folded into the memoized cexpr strings (same
    # Catalyst trees the Column DSL built — Alias/Cast/WindowExpression —
    # zero py4j trips per warm construction for each; guide §5).
    cent = (
        e.groupBy(cexpr("bucket"))
        .agg(
            cexpr(
                "transform(array_sort(collect_list(struct(vec_id, embedding))),"
                " s -> s.embedding) AS ms"
            )
        )
        .select(
            cexpr("bucket"),
            cexpr(
                f"transform(sequence(0, {DIM - 1}), i ->"
                " aggregate(ms, cast(0.0 as double),"
                " (acc, x) -> acc + cast(x[i] as double)) / size(ms))"
                " AS centroid"
            ),
            # cast: size() is INT but this column has always been the
            # BIGINT count — the driver hash-checks the schema too.
            cexpr("cast(size(ms) as bigint) AS n_members"),
        )
    )
    scored = e.join(broadcast(cent), "bucket").select(
        cexpr("bucket"),
        cexpr("vec_id"),
        cexpr("n_members"),
        cexpr(
            f"{_dot_spark_cols('embedding', 'centroid')}"
            f" / (sqrt({_dot_spark_cols('embedding', 'embedding')})"
            f" * sqrt({_dot_spark_cols('centroid', 'centroid')}))"
            " AS cos"
        ),
    )
    return (
        scored.select(
            cexpr("bucket"),
            cexpr("vec_id"),
            cexpr("n_members"),
            cexpr("cos"),
            cexpr(
                "row_number() OVER (PARTITION BY bucket"
                " ORDER BY cos DESC, vec_id) AS rn"
            ),
        )
        .filter(cexpr("rn = 1"))
        .select(
            cexpr("bucket"),
            cexpr("vec_id AS rep_vec_id"),
            cexpr("n_members"),
            cexpr("round(cos, 4) AS rep_cos"),
        )
        .orderBy(cexpr("bucket"))
    )


@register(
    "t_mix_temperature_weights",
    f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({TOK_DUCK})) AS BIGINT) AS tokens
      FROM documents GROUP BY source),
    shares AS (
      SELECT source, n_docs, tokens,
             CAST(tokens AS DOUBLE) / SUM(tokens) OVER () AS p,
             CAST(ROUND(sqrt(CAST(tokens AS DOUBLE) / SUM(tokens) OVER ()), 9)
                  AS DECIMAL(18,9)) AS w9
      FROM per_src)
    SELECT source, n_docs, tokens,
           ROUND(p, 6) AS raw_share,
           ROUND(CAST(w9 AS DOUBLE)
                 / CAST(SUM(w9) OVER () AS DOUBLE), 6) AS temp_weight
    FROM shares
    ORDER BY source
    """,
)
def t_mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data-mixture weights (T=2): per-source sampling
    weight ∝ sqrt(token share), normalized — the up-weight-the-tail
    mixing rule multilingual/multi-domain pretraining uses so small
    sources are not drowned by the head. sqrt (unlike pow/log) is
    IEEE-correctly-rounded on both engines, so the per-source weight is
    bit-identical; the normalizing sum runs over weights rounded to 9
    decimals and cast to DECIMAL — exact, order-independent — and only
    the final division returns to double.

    Scale shape: the corpus collapses to |sources| rows in one
    partial-agg pass; everything after is window arithmetic on that tiny
    table."""
    d = t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr(f"size({TOK_SPARK})")).cast("bigint").alias("tokens"),
    )
    wall = Window.partitionBy()
    p = F.col("tokens").cast("double") / F.sum("tokens").over(wall)
    shares = per_src.select(
        "source",
        "n_docs",
        "tokens",
        p.alias("p"),
        F.round(F.sqrt(p), 9).cast("decimal(18,9)").alias("w9"),
    )
    return shares.select(
        "source",
        "n_docs",
        "tokens",
        F.round("p", 6).alias("raw_share"),
        F.round(
            F.col("w9").cast("double")
            / F.sum("w9").over(wall).cast("double"),
            6,
        ).alias("temp_weight"),
    ).orderBy("source")


@register(
    "t_char_class_profile",
    """
    SELECT source,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS chars_total,
           CAST(SUM(LENGTH(text)
                - LENGTH(regexp_replace(text, '[a-zA-Z]', '', 'g')))
             AS BIGINT) AS chars_alpha,
           CAST(SUM(LENGTH(text)
                - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))
             AS BIGINT) AS chars_digit,
           CAST(SUM(LENGTH(text)
                - LENGTH(regexp_replace(text, '\\s', '', 'g')))
             AS BIGINT) AS chars_space,
           ROUND(CAST(SUM(LENGTH(text)
                 - LENGTH(regexp_replace(text, '[a-zA-Z]', '', 'g')))
                 AS DOUBLE) / SUM(LENGTH(text)), 6) AS alpha_ratio
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def t_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class profile per source (alpha / digit / whitespace
    counts and the alpha ratio) — the encoding-sanity check a corpus
    audit runs before tokenizer training (mojibake, number-dump, and
    whitespace-art sources stand out immediately). Counts are
    length-difference integer arithmetic; the only division is the final
    ratio.

    Scale shape: narrow per-doc regex counting inside codegen, one
    low-cardinality aggregate — never shuffles the corpus."""
    d = t(spark, sf_dir, "documents")
    def cnt(pat):
        return F.length("text") - F.length(
            F.regexp_replace("text", pat, "")
        )
    return (
        d.groupBy("source")
        .agg(
            F.sum(F.length("text")).cast("bigint").alias("chars_total"),
            F.sum(cnt("[a-zA-Z]")).cast("bigint").alias("chars_alpha"),
            F.sum(cnt("[0-9]")).cast("bigint").alias("chars_digit"),
            F.sum(cnt(r"\s")).cast("bigint").alias("chars_space"),
            F.round(
                F.sum(cnt("[a-zA-Z]")).cast("double")
                / F.sum(F.length("text")),
                6,
            ).alias("alpha_ratio"),
        )
        .orderBy("source")
    )


@register(
    "t_token_coverage_topk",
    f"""
    WITH tok AS (
      SELECT u.t AS token FROM documents, UNNEST({TOK_DUCK}) AS u(t)),
    counts AS (
      SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    ranked AS (
      SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk,
             SUM(n) OVER () AS total
      FROM counts)
    SELECT CAST(k.k AS INT) AS k,
           CAST(SUM(n) FILTER (WHERE rk <= k.k) AS BIGINT) AS covered_tokens,
           CAST(MAX(total) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(n) FILTER (WHERE rk <= k.k) AS DOUBLE)
                 / MAX(total), 6) AS coverage
    FROM ranked, (VALUES (10), (100), (1000)) k(k)
    GROUP BY k.k
    ORDER BY k
    """,
)
def t_token_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens the
    top-k most frequent token types cover, at k = 10 / 100 / 1000 — the
    number that sizes a tokenizer vocabulary (complement of the OOV
    rate). Pure integer arithmetic until the final ratio; ranking ties
    break on the token string so ranks are total-ordered.

    Scale shape: one token-grain aggregate (shuffle bounded by vocab
    after partial agg — the Zipf head is exactly what map-side combine
    absorbs), then window ranking over the vocab-sized count table."""
    d = t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.expr(TOK_SPARK)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = Window.partitionBy()
    ranked = counts.select(
        "token",
        "n",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), "token"))
        .alias("rk"),
        F.sum("n").over(wall).alias("total"),
    )
    ks = ranked.select(
        "n",
        "rk",
        "total",
        F.explode(F.array(F.lit(10), F.lit(100), F.lit(1000))).alias("k"),
    )
    return (
        ks.groupBy("k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("n")))
            .cast("bigint")
            .alias("covered_tokens"),
            F.max("total").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum(F.when(F.col("rk") <= F.col("k"), F.col("n"))).cast(
                    "double"
                )
                / F.max("total"),
                6,
            ).alias("coverage"),
        )
        .orderBy("k")
    )


@register(
    "t_pretrain_pipeline_e2e",
    f"""
    WITH norm AS (
      SELECT doc_id, source,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      FROM documents),
    dedup AS (
      SELECT * FROM (
        SELECT doc_id, source, norm,
               ROW_NUMBER() OVER (PARTITION BY md5(norm)
                                  ORDER BY doc_id) AS rn
        FROM norm)
      WHERE rn = 1),
    kept AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(norm, '\\s+')) AS n_tok
      FROM dedup
      WHERE len(regexp_replace(norm, '\\s+', '', 'g'))
              >= 3 * len(regexp_split_to_array(norm, '\\s+'))
        AND len(regexp_replace(norm, '\\s+', '', 'g'))
              <= 10 * len(regexp_split_to_array(norm, '\\s+'))),
    packed AS (
      SELECT source, doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 256
               AS BIGINT) AS seq_id
      FROM kept)
    SELECT source,
           COUNT(*) AS n_docs_kept,
           COUNT(DISTINCT seq_id) AS n_seqs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY source
    ORDER BY source
    """,
)
def t_pretrain_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining data pipeline as ONE composable lazy plan:
    normalize (lowercase, strip non-alphanumerics, collapse whitespace) →
    exact-dedup on the normalized hash (keep lowest doc_id) → heuristic
    quality filter (mean word length in [3, 10], the Gopher band, on the
    normalized text) → pack survivors into 256-token training sequences
    per source → per-source shard report. This is the composition every
    data pipeline ships: each stage is an operator this repo also exposes
    individually (t_text_normalize / t_exact_dedup_* /
    t_gopher_quality_rules / t_pack_sequences), and because all stages
    are declarative the whole chain optimizes as one Catalyst plan — the
    dedup window, packing window, and final aggregate are the only
    shuffles; normalization and filtering fuse into the scan.

    Scale shape: dedup partitions on the content hash (uniform);
    packing partitions on source (the giant-source guard is the same
    shard-key extension t_pack_sequences documents); report is
    |sources| rows."""
    d = t(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        "source",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
        ).alias("norm"),
    )
    wdup = Window.partitionBy(F.md5(F.col("norm").cast("binary"))).orderBy(
        "doc_id"
    )
    dedup = (
        norm.withColumn("rn", F.row_number().over(wdup))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    n_tok = F.expr(r"size(split(norm, '\\s+'))")
    n_char = F.length(F.regexp_replace("norm", r"\s+", ""))
    kept = dedup.where(
        (n_char >= 3 * n_tok) & (n_char <= 10 * n_tok)
    ).select("doc_id", "source", n_tok.alias("n_tok"))
    wpack = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = kept.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("n_tok").over(wpack), F.lit(0)) / 256
        ).cast("bigint"),
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.count_distinct("seq_id").alias("n_seqs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Per-source document cap (staged round 11 -> round-12/13 registration
# candidate: t_source_cap_sample)
# ---------------------------------------------------------------------------

_CAP_K = 10


def source_cap_sample(docs: DataFrame, k: int = _CAP_K) -> DataFrame:
    """The web-corpus "domain cap": keep at most ``k`` documents per
    source, selected by a DETERMINISTIC hash rank — md5 of the doc_id
    (the ivf_train seeding rule: DuckDB md5(CAST(x AS VARCHAR)) ==
    Spark md5(cast(string as binary)), hex-for-hex), tie-broken on
    doc_id — so the "random" cap is reproducible at any parallelism
    and any arrival order, unlike rand()-based sampling. Returns the
    KEPT rows (doc_id, source, cap_rank) so downstream stages consume
    the capped corpus directly.

    Scale (100 TB): ONE shuffle — the window partitions by source; a
    pathological mega-source serializes its partition's sort, the same
    hot-key class as the percentile filter above, and routes through
    the two-level segmentation guard (twolevel.py) the same way. The
    hash rank needs no global state, so map-side nothing precedes the
    single exchange."""
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source")
        .withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= k)
        .orderBy("source", "cap_rank")
    )


def source_cap_oracle_sql(k: int = _CAP_K) -> str:
    """DuckDB twin of ``source_cap_sample`` (staged for registration):
    the same md5 rank restated with QUALIFY."""
    return f"""
    SELECT doc_id, source, CAST(rnk AS BIGINT) AS cap_rank FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents)
    WHERE rnk <= {k}
    ORDER BY source, cap_rank
    """


@register("t_source_cap_sample", source_cap_oracle_sql())
def t_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap registered as a FULL hash row (staged
    round 11, registered round 12): the deterministic md5-ranked
    "domain cap" over the REAL documents corpus — the one r12
    registration that reads ``sf_dir`` rather than a shipped fixture.
    Pytest-proven against the QUALIFY twin at BOTH shipped SFs and
    partitioning-invariant (tests/test_trainprep_staged.py)."""
    return source_cap_sample(t(spark, sf_dir, "documents"))
