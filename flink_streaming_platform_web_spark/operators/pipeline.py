"""Composed training-data pipeline: the end-to-end preprocessing job a
corpus actually runs, wired from the individually-gated stages —

    quality filter (tx10)  →  exact dedup (dd01's shape)  →
    stratified sample (tx08's shape)  →  mix accounting

pp01 exists to prove the stages COMPOSE: each is oracle-gated alone,
and the composition is oracle-gated as one query (the oracle nests the
tx10 oracle verbatim as a subquery, then mirrors dedup + sample +
roll-up CTE by CTE).

Scale shape (the point at 100 TB): one scan, two shuffles, ZERO joins —
- the quality gate is a per-row predicate evaluated on the scan
  (quality_flags: every tx10 metric is array-side, so no keep-list
  self-join exists to shuffle);
- exact dedup is a min-doc_id window over md5(text), with the digest
  computed BEFORE the exchange so the shuffle carries 16 bytes + three
  small columns, never text (the earlier groupBy + LEFT SEMI pair
  shuffled survivors a second time on doc_id — and its broadcast side
  is corpus-sized at scale, where this window is a single bounded
  exchange);
- the sample is a pure per-row predicate on a salted portable hash
  (zero state, reproducible);
- the final per-(lang, source) roll-up is map-side combinable and
  stratum-sized.
Doc text never leaves the scan stage; the driver holds nothing.

Reference parity note: the reference platform has no data-pipeline
surface (it routes Flink SQL); this composition is the mandated
training-data extension exercised end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.text import (
    ORACLE_TX10,
    ORACLE_WS_TOKENS,
    quality_flags,
    stratified_keep,
    stratified_keep_where,
    ws_token_count,
)
from flink_streaming_platform_web_spark.tables import load


def pp01_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, two shuffles, zero joins: the quality gate is a
    per-row predicate evaluated inline on the scan (quality_flags —
    every tx10 metric is array-side since the r3 rewrite, so no
    keep-list join is needed); exact dedup is a min-doc_id window over
    the content digest (ONE exchange keyed by the digest — the old
    groupBy+left-semi pair shuffled the survivors a second time on
    doc_id); the sample predicate is stateless; the final roll-up's
    exchange carries |lang|×|source| combined rows."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    kept = quality_flags(docs).filter(F.col("keep")).select(
        "doc_id", "lang", "source", "n_chars",
        F.md5("text").alias("h"),  # digest BEFORE the exchange: the
        # dedup shuffle carries 16 bytes + 3 small columns, never text
    )
    w = Window.partitionBy("h")
    deduped = kept.withColumn(
        "first_id", F.min("doc_id").over(w)
    ).filter(F.col("doc_id") == F.col("first_id"))
    _, keep = stratified_keep("pp01")
    final = deduped.filter(keep)
    return final.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _oracle_pp01() -> str:
    where = stratified_keep_where("pp01")
    return f"""
WITH flt AS (
  SELECT doc_id FROM ({ORACLE_TX10}) WHERE keep
),
kept AS (
  SELECT d.* FROM documents d JOIN flt USING (doc_id)
),
surv AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
deduped AS (
  SELECT k.* FROM kept k JOIN surv USING (doc_id)
),
final AS (
  SELECT * FROM deduped WHERE {where}
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM final GROUP BY lang, source
"""


ORACLE_PP01 = _oracle_pp01()


# Tokens-per-shard budget. Small against the synthetic docs (~30
# whitespace tokens each) so every SF produces several shards per
# source; production sets this to the trainer's sequence length × rows
# per shard.
PACK_BUDGET = 512


def pp02_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing (concat-and-chunk): within each source,
    documents are laid out in doc_id order and cut into shards of
    ~PACK_BUDGET tokens — the standard sequence-packing layout step
    before tokenized corpus serialization. A doc belongs to the shard
    where its first token lands (shard = tokens-before-me DIV budget),
    so the assignment is a pure window cumsum: deterministic,
    order-stable, no greedy driver loop.

    Scale shape: ONE shuffle keyed by the pack partition (source), then
    the window cumsum runs sorted within each partition and the shard
    roll-up is map-side combinable. Skew knob at 100 TB: a dominant
    source serializes its own window — production packs per
    (source, hash-bucket) and offsets shard ids per bucket, same plan
    shape with B× the parallelism; the synthetic corpus' sources are
    balanced so the direct form is the honest benchmark."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        ws_token_count().alias("tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "tokens_before", F.coalesce(F.sum("tokens").over(w), F.lit(0))
    ).withColumn(
        "shard_id", F.expr(f"tokens_before DIV {PACK_BUDGET}")
    )
    return packed.groupBy("source", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_PP02 = f"""
WITH toks AS (
  SELECT doc_id, source,
         {ORACLE_WS_TOKENS} AS tokens
  FROM documents
), packed AS (
  SELECT doc_id, source, tokens,
         COALESCE(SUM(tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tokens_before
  FROM toks
)
SELECT source,
       CAST(tokens_before // {PACK_BUDGET} AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS shard_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, shard_id
"""

def pp03_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete corpus-preparation job, end to end:

        drop the eval split  →  drop contaminated docs (dc01)  →
        exact dedup (digest window)  →  pack per-source shards (pp02)

    — i.e. what actually runs before a tokenizer ever sees a corpus,
    composed from the individually-gated stages and gated as ONE
    nested-oracle query.

    Scale shape: the contamination verdicts come from dc01's broadcast
    probe (collision rows only); the drop is a LEFT ANTI join against
    that verdict set keyed by doc_id — bounded by the number of
    CONTAMINATED docs, which is eval-benchmark-sized, not
    corpus-sized, so the anti join broadcasts; dedup is pp01's narrow
    digest-window exchange; packing is pp02's single source-keyed
    exchange with the roll-up reusing its partitioning. Doc text never
    shuffles anywhere."""
    from pyspark.sql import Window

    from flink_streaming_platform_web_spark.operators.decontam import (
        dc01_contamination,
    )

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 != 7
    )
    bad_ids = (
        dc01_contamination(spark, sf_dir)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    clean = docs.join(F.broadcast(bad_ids), "doc_id", "left_anti")
    slim = clean.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        ws_token_count().alias("tokens"),
    )
    wd = Window.partitionBy("h")
    deduped = slim.withColumn(
        "first_id", F.min("doc_id").over(wd)
    ).filter(F.col("doc_id") == F.col("first_id"))
    wp = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = deduped.withColumn(
        "tokens_before", F.coalesce(F.sum("tokens").over(wp), F.lit(0))
    ).withColumn("shard_id", F.expr(f"tokens_before DIV {PACK_BUDGET}"))
    return packed.groupBy("source", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("shard_tokens"),
    )


def _oracle_pp03() -> str:
    from flink_streaming_platform_web_spark.operators.decontam import (
        ORACLE_DC01,
    )

    return f"""
WITH verdicts AS ({ORACLE_DC01}),
clean AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id % 20 <> 7
    AND NOT EXISTS (SELECT 1 FROM verdicts v
                    WHERE v.doc_id = d.doc_id AND v.contaminated)
),
slim AS (
  SELECT doc_id, source, md5(text) AS h,
         {ORACLE_WS_TOKENS} AS tokens
  FROM clean
),
deduped AS (
  SELECT * FROM (
    SELECT slim.*, MIN(doc_id) OVER (PARTITION BY h) AS first_id
    FROM slim
  ) WHERE doc_id = first_id
),
packed AS (
  SELECT doc_id, source, tokens,
         COALESCE(SUM(tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tokens_before
  FROM deduped
)
SELECT source,
       CAST(tokens_before // {PACK_BUDGET} AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY source, shard_id
"""


ORACLE_PP03 = _oracle_pp03()

QUERIES = {
    "pp01_training_mix": pp01_training_mix,
    "pp02_shard_packing": pp02_shard_packing,
    "pp03_prep_pipeline": pp03_prep_pipeline,
}
ORACLES = {
    "pp01_training_mix": ORACLE_PP01,
    "pp02_shard_packing": ORACLE_PP02,
    "pp03_prep_pipeline": ORACLE_PP03,
}


def pp04_neardup_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware corpus preparation — the stage pp03 lacks:

        drop near-dup losers (dd04's verified MinHash-LSH pairs)  →
        exact dedup (digest window)  →  quality gate (tx10)  →
        per-lang token accounting

    Near-dup removal keeps the EARLIEST doc of each verified pair
    (doc_a < doc_b, so losers = distinct doc_b) — the standard greedy
    keep-first rule; full transitive clustering is dd06's job and
    deliberately not repeated here.

    Scale shape: the pair product is session-memoized (dd04's LSH
    index — zero new corpus-sized stages; at 100 TB this is the
    materialized near-dup table every prep job reads); the loser drop
    is a LEFT ANTI join on doc_id with NO pinned broadcast — losers
    scale with the corpus dup fraction, so AQE picks broadcast vs
    shuffle from the runtime size (the tx12 lesson); dedup is the
    digest-window exchange; the quality gate is a scan-side predicate;
    the final roll-up is |lang|-sized."""
    from pyspark.sql import Window

    from flink_streaming_platform_web_spark.operators.dedup import (
        dd04_minhash_lsh_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    losers = (
        dd04_minhash_lsh_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept0 = docs.join(losers, "doc_id", "left_anti")
    flagged = quality_flags(kept0).filter(F.col("keep")).select(
        "doc_id", "lang",
        F.md5("text").alias("h"),
        ws_token_count().alias("tokens"),
    )
    wd = Window.partitionBy("h")
    deduped = flagged.withColumn(
        "first_id", F.min("doc_id").over(wd)
    ).filter(F.col("doc_id") == F.col("first_id"))
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("total_tokens"),
    )


def _oracle_pp04() -> str:
    from flink_streaming_platform_web_spark.operators.dedup import (
        ORACLE_DD04,
    )

    return f"""
WITH pairs AS ({ORACLE_DD04}),
losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
kept0 AS (
  SELECT d.* FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
),
q AS (SELECT doc_id FROM ({ORACLE_TX10}) WHERE keep),
flagged AS (
  SELECT k.doc_id, k.lang, md5(k.text) AS h,
         {ORACLE_WS_TOKENS.replace("text", "k.text")} AS tokens
  FROM kept0 k JOIN q USING (doc_id)
),
deduped AS (
  SELECT * FROM (
    SELECT flagged.*, MIN(doc_id) OVER (PARTITION BY h) AS first_id
    FROM flagged
  ) WHERE doc_id = first_id
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS total_tokens
FROM deduped GROUP BY lang
"""


QUERIES["pp04_neardup_prep"] = pp04_neardup_prep
ORACLES["pp04_neardup_prep"] = _oracle_pp04()


# Uniform target mixture in ppm — production passes the trainer's
# declared mixture; the math is share-agnostic.
PP05_TARGET_PPM = 200_000  # 5 languages → 20% each


def pp05_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture design: per-language sampling weights that
    steer the corpus toward a target mixture (the re-weighting step
    between corpus prep and tokenization — upsample rare languages,
    downsample dominant ones, cap at availability).

    weight = target_share / actual_share (shares carried as integer
    ppm so the cross-engine compare is exact; the weight itself is a
    single IEEE division); planned_tokens caps the plan at
    availability: floor(lang_tokens * min(1, weight)).

    Scale shape: one map-side-combined aggregation over the scan, a
    broadcast of the 1-row total, and a |lang|-sized result — the
    canonical mixture-accounting job at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("lang", ws_token_count().alias("tokens"))
    agg = toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("lang_tokens"),
    )
    total = agg.agg(
        F.sum("lang_tokens").cast("bigint").alias("total_tokens")
    )
    return (
        agg.crossJoin(F.broadcast(total))
        .withColumn(
            "actual_ppm",
            F.expr("lang_tokens * 1000000 DIV total_tokens"),
        )
        .withColumn(
            "weight",
            F.lit(float(PP05_TARGET_PPM))
            / F.col("actual_ppm").cast("double"),
        )
        .withColumn(
            "planned_tokens",
            F.floor(
                F.col("lang_tokens").cast("double")
                * F.least(F.lit(1.0), F.col("weight"))
            ).cast("bigint"),
        )
        .select(
            "lang", "n_docs", "lang_tokens", "actual_ppm",
            "weight", "planned_tokens",
        )
    )


ORACLE_PP05 = f"""
WITH toks AS (
  SELECT lang, {ORACLE_WS_TOKENS} AS tokens FROM documents
),
agg AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(tokens) AS BIGINT) AS lang_tokens
  FROM toks GROUP BY lang
),
tot AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens FROM agg)
SELECT lang, n_docs, lang_tokens,
       lang_tokens * 1000000 // total_tokens AS actual_ppm,
       CAST({PP05_TARGET_PPM} AS DOUBLE)
         / CAST(lang_tokens * 1000000 // total_tokens AS DOUBLE)
         AS weight,
       CAST(FLOOR(CAST(lang_tokens AS DOUBLE) * LEAST(1.0,
         CAST({PP05_TARGET_PPM} AS DOUBLE)
           / CAST(lang_tokens * 1000000 // total_tokens AS DOUBLE)))
         AS BIGINT) AS planned_tokens
FROM agg CROSS JOIN tot
"""

QUERIES["pp05_mixture_weights"] = pp05_mixture_weights
ORACLES["pp05_mixture_weights"] = ORACLE_PP05


def pp06_representative_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative-based dedup accounting — the RefinedWeb-flavor
    alternative to pp04's drop-all-losers rule: near-dup clusters keep
    their HIGHEST-QUALITY member (dd15), and the report shows, per
    language, what that decision keeps and what it reclaims
    (docs/tokens kept vs dropped). This is the number a training-mix
    owner actually reads before committing a dedup policy.

    Scale shape: dd15's cluster table (pair-graph-bounded components
    + one rank window) joins the corpus once on doc_id; the roll-up
    is |lang|-sized with map-side combine. Token counts are integer
    (ws_token_count), so the sums are exact cross-engine."""
    reps = __import__(
        "flink_streaming_platform_web_spark.operators.clusters",
        fromlist=["dd15_cluster_representatives"],
    ).dd15_cluster_representatives(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", ws_token_count().alias("tokens")
    )
    j = docs.join(reps.select("doc_id", "keep"), "doc_id")
    return j.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("keep") == 1, F.col("tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_kept"),
        F.sum(F.when(F.col("keep") == 0, F.col("tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_dropped"),
    )


def _oracle_pp06() -> str:
    from flink_streaming_platform_web_spark.operators.clusters import (
        ORACLE_DD15,
    )

    return f"""
WITH reps AS (SELECT doc_id, keep FROM ({ORACLE_DD15})),
toks AS (
  SELECT doc_id, lang, {ORACLE_WS_TOKENS} AS tokens FROM documents
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r.keep) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN r.keep = 1 THEN t.tokens ELSE 0 END)
            AS BIGINT) AS tokens_kept,
       CAST(SUM(CASE WHEN r.keep = 0 THEN t.tokens ELSE 0 END)
            AS BIGINT) AS tokens_dropped
FROM toks t JOIN reps r ON r.doc_id = t.doc_id
GROUP BY t.lang
"""


QUERIES["pp06_representative_prep"] = pp06_representative_prep
ORACLES["pp06_representative_prep"] = _oracle_pp06()


# --------------------------------------------------------------------------
# pp07 — cross-MODAL prep (round 8): the REAL image decode gates
# geometry while the tx10 text-quality gate filters content, then the
# mix is accounted per (lang, format). The decode runs for real
# (render → stdlib PNG/BMP parse in mapInPandas); the oracle replays
# the geometry arithmetically (mm02's closed-form synthesis rule) and
# nests ORACLE_TX10 for the keep set — the composition a multimodal
# training-data pipeline runs before committing a mix.
# --------------------------------------------------------------------------

PP07_MIN_PIXELS = 600


def pp07_multimodal_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: the quality gate stays a per-row scan predicate (zero
    shuffles); the decoded geometry joins back on the PRIMARY KEY
    doc_id (co-partitioned corpus join — the standard
    annotate-by-key exchange); the roll-up exchange carries
    |lang|x|format| combined rows."""
    from flink_streaming_platform_web_spark.operators.multimodal import (
        decode_metadata,
        with_image_payload,
    )

    docs = load(spark, sf_dir, "documents")
    geom = decode_metadata(with_image_payload(docs)).select(
        "doc_id", "width", "height", "format"
    )
    kept = quality_flags(docs).filter(F.col("keep")).select(
        "doc_id", "lang", "n_tokens"
    )
    joined = kept.join(geom, "doc_id").filter(
        F.col("width") * F.col("height") >= PP07_MIN_PIXELS
    )
    return joined.groupBy("lang", "format").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.col("width") * F.col("height"))
        .cast("bigint")
        .alias("total_pixels"),
    )


def _oracle_pp07() -> str:
    from flink_streaming_platform_web_spark.operators.text import (
        ORACLE_TX10,
    )

    return f"""
WITH flt AS (
  SELECT doc_id, n_tokens FROM ({ORACLE_TX10}) WHERE keep
),
geom AS (
  SELECT doc_id,
         octet_length(encode(text)) % 64 + 1 AS w,
         octet_length(encode(text)) % 48 + 1 AS h,
         CASE WHEN octet_length(encode(text)) % 2 = 0
              THEN 'png' ELSE 'bmp' END AS format
  FROM documents
)
SELECT d.lang, g.format,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(g.w * g.h) AS BIGINT) AS total_pixels
FROM documents d
JOIN flt f USING (doc_id)
JOIN geom g USING (doc_id)
WHERE g.w * g.h >= {PP07_MIN_PIXELS}
GROUP BY d.lang, g.format
"""


QUERIES["pp07_multimodal_prep"] = pp07_multimodal_prep
ORACLES["pp07_multimodal_prep"] = _oracle_pp07()


# --------------------------------------------------------------------------
# pp08 — temperature-smoothed source sampling (round 12): the EXECUTING
# half of mixture design. pp05 computes per-language weights; pp08
# applies a temperature policy to SOURCES (p_i ∝ n_i^α, α = 0.5 — the
# standard multilingual-corpus smoothing: upsample rare sources,
# damp dominant ones) and performs the actual deterministic selection.
# --------------------------------------------------------------------------

PP08_BUDGET_DEN = 2  # sample half the corpus
PP08_PPM = 1_000_000


def pp08_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling report under a sqrt-temperature mix: the
    per-source target is budget * sqrt(n_i)/Σ sqrt(n_j) (fixed-point:
    floor(sqrt(n)*1e6) as BIGINT, so the only IEEE op is the sqrt both
    engines compute bit-identically and every division is integer);
    selection is a DETERMINISTIC hash gate — a doc is kept iff
    portable_hash(doc_id || ':pp08') mod 1e6 < target_ppm — so the
    sample is reproducible, engine-portable, and requires NO
    per-source ordering.

    Scale shape (100 TB): one map-side-combined count per source, a
    |sources|-sized threshold table broadcast back onto the corpus,
    one scan-speed filter + final per-source roll-up. Zero wide
    shuffles, zero ranking — hash-gate sampling is how production
    mixers avoid the per-group sort that ROW_NUMBER-based sampling
    pays."""
    from flink_streaming_platform_web_spark.operators._portable import (
        portable_hash,
    )

    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    sc_ = counts.withColumn(
        "s_i",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1e6).cast(
            "bigint"
        ),
    )
    tot = sc_.agg(
        F.sum("s_i").alias("s_sum"),
        F.sum("n_docs").alias("n_total"),
    )
    thr = (
        sc_.crossJoin(F.broadcast(tot))
        .withColumn(
            # budget * s_i runs through a DECIMAL(38,0) intermediate:
            # with s_i = floor(sqrt(n)*1e6) the BIGINT product
            # overflows int64 once the corpus reaches ~1e9 docs —
            # inside the 100 TB posture (ADVICE r12). DIV on the
            # decimal product returns BIGINT integral division,
            # bit-identical to the oracle's HUGEINT // (verified
            # cross-engine at 1e10 docs). target_docs itself and
            # target_docs * 1e6 stay in int64 up to ~9e12 docs.
            "target_docs",
            F.expr(
                f"CAST(CAST(n_total DIV {PP08_BUDGET_DEN} AS"
                " DECIMAL(38,0)) * s_i DIV s_sum AS BIGINT)"
            ),
        )
        .withColumn(
            "thr_ppm",
            F.expr(f"target_docs * {PP08_PPM} DIV n_docs"),
        )
        .select("source", "n_docs", "target_docs", "thr_ppm")
    )
    gate = portable_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":pp08"))
    ) % PP08_PPM
    picked = (
        docs.select("doc_id", "source")
        .join(F.broadcast(thr), "source")
        .where(gate < F.col("thr_ppm"))
        .groupBy("source")
        .agg(F.count("*").alias("n_selected"))
    )
    return (
        thr.join(picked, "source", "left")
        .select(
            "source",
            "n_docs",
            "target_docs",
            "thr_ppm",
            F.coalesce(F.col("n_selected"), F.lit(0))
            .cast("bigint")
            .alias("n_selected"),
        )
    )


def _oracle_pp08() -> str:
    from flink_streaming_platform_web_spark.operators._portable import (
        oracle_portable_hash,
    )

    gate = oracle_portable_hash(
        "(CAST(doc_id AS VARCHAR) || ':pp08')"
    )
    return f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
sc AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)
           AS s_i
  FROM counts
),
tot AS (SELECT SUM(s_i) AS s_sum, SUM(n_docs) AS n_total FROM sc),
thr AS (
  SELECT source, n_docs,
         CAST(n_total::HUGEINT // {PP08_BUDGET_DEN} * s_i // s_sum
              AS BIGINT) AS target_docs,
         CAST((n_total::HUGEINT // {PP08_BUDGET_DEN} * s_i // s_sum)
           * {PP08_PPM} // n_docs AS BIGINT) AS thr_ppm
  FROM sc CROSS JOIN tot
),
picked AS (
  SELECT d.source, COUNT(*) AS n_selected
  FROM documents d JOIN thr USING (source)
  WHERE {gate} % {PP08_PPM} < thr_ppm
  GROUP BY d.source
)
SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(t.target_docs AS BIGINT) AS target_docs,
       CAST(t.thr_ppm AS BIGINT) AS thr_ppm,
       CAST(COALESCE(p.n_selected, 0) AS BIGINT) AS n_selected
FROM thr t LEFT JOIN picked p USING (source)
"""


QUERIES["pp08_temperature_sample"] = pp08_temperature_sample
ORACLES["pp08_temperature_sample"] = _oracle_pp08()
