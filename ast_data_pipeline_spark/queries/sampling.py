"""Deterministic sampling for training-data pipelines.

At 100 TB you never sample with ``rand()`` — re-runs must select the
same rows (resumable jobs, reproducible ablations), and sampling must
be a pushdown-friendly filter, not a shuffle.  The standard trick is a
*hash gate*: keep a row iff ``md5(key)`` falls below a threshold.
md5's hex digits are uniform, the filter is embarrassingly parallel,
needs no state, and both engines compute the identical digest, so the
DuckDB oracle replays the exact row selection.

Threshold arithmetic: the first two hex chars are uniform over 256
values, so a lexicographic cutoff ``< '40'`` keeps 64/256 = 25%,
``< '80'`` keeps 50%, ``< '1a'`` keeps ~10.2%.

The reference has no sampling operator (it slices dataframes by
position, e.g. verification-set allocation src/az_proc.py:760-781);
the hash gate is its scalable replacement and also powers the F7-style
allocation split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..functions.exact import dsum_sql
from ..operators.spatial import morton_key, morton_key_sql
from ..registry import register
from ..sources.catalog import load


def hash_gate(key_col, threshold_hex: str):
    """True iff the row is inside the sample: first 2 md5 hex chars of
    the key are below ``threshold_hex`` (2 lowercase hex digits)."""
    return F.substring(F.md5(key_col.cast("string")), 1, 2) < threshold_hex


def hash_gate_sql(key_expr: str, threshold_hex: str) -> str:
    return f"substr(md5(({key_expr})::VARCHAR), 1, 2) < '{threshold_hex}'"


@register(
    "x_hash_sample",
    oracle=f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE {hash_gate_sql('doc_id', '1a')}
""",
    doc="Deterministic ~10% sample of documents via md5 hash gate — "
    "stateless, re-runnable, pushes down as a plain filter.",
    tags=("sampling", "extension"),
)
def x_hash_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.filter(hash_gate(F.col("doc_id"), "1a")).select(
        "doc_id", "source", "n_chars"
    )


@register(
    "x_stratified_sample",
    oracle=f"""
WITH rates AS (
  SELECT source, CASE WHEN (substr(source, 4)::INT) % 2 = 0
                      THEN '40' ELSE '80' END AS cutoff
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN rates r USING (source)
WHERE substr(md5(d.doc_id::VARCHAR), 1, 2) < r.cutoff
""",
    doc="Stratified deterministic sample: per-stratum rates (25% for "
    "even-numbered sources, 50% for odd) via a broadcast-joined rates "
    "dim + hash gate — the reproducible form of df.sampleBy().",
    tags=("sampling", "extension"),
)
def x_stratified_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rates = (
        docs.select("source")
        .distinct()
        .withColumn(
            "cutoff",
            F.when(
                F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit("40")
            ).otherwise(F.lit("80")),
        )
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < F.col("cutoff"))
        .select("doc_id", "source", "lang")
    )


@register(
    "x_train_split",
    oracle="""
SELECT source,
       CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cc' THEN 'train'
            WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM documents
GROUP BY source, split
""",
    doc="Deterministic train/val/test assignment via md5 hash ranges "
    "(~80/10/10: cc=204, e6=230 of 256) — the reproducible split every "
    "training pipeline needs: stateless, leakage-free (a doc's split "
    "never depends on the rest of the corpus), identical on re-runs "
    "and across engines. Reported as per-source split counts.",
    tags=("sampling", "extension"),
)
def x_train_split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return docs.groupBy("source", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


RANGE_N_BUCKETS = 8
# Sample budget per output bucket (VERDICT r5 #2): the gate fraction is
# derived from this, never fixed. 64k sample rows per boundary is far
# above Spark's own RangePartitioner default (samplePointsPerPartition
# = 20) — boundary error shrinks as 1/sqrt(rows per bucket).
RANGE_TARGET_ROWS_PER_BUCKET = 65536


RANGE_GATE_SPACE = 16**6  # 6 hex chars: gate granularity 1/16.7M


def range_sample_cut(n_rows: int, n_buckets: int, target_per_bucket: int) -> int:
    """First-6-hex-chars cutoff (1..16^6) keeping ~n_buckets*target rows.

    16^6 means "keep everything" (no gate). Six chars, not two: a
    2-char gate floors at 1/256, which at 1e11 rows is still a 390M-row
    sample; 1/16.7M granularity keeps the sample within ~2x of target
    at any realistic row count. Pure integer ceil-division so the
    DuckDB oracle reproduces it bit-exactly from the same count.
    """
    if n_rows <= 0:
        return RANGE_GATE_SPACE
    target = n_buckets * target_per_bucket
    return min(RANGE_GATE_SPACE, max(1, (RANGE_GATE_SPACE * target + n_rows - 1) // n_rows))


def range_partition_bounds(orders, n_buckets: int, cut: int):
    """Boundary table from a hash-gated sample via a TWO-LEVEL rank.

    A single ``row_number() OVER (ORDER BY price, key)`` is one reducer
    over the whole sample; instead the sample is bucketed by the
    monotone value prefix ``vb = floor(price/4096)`` (~hundreds of
    buckets over the TPC-H price range), per-vb counts form a tiny
    table whose exclusive prefix sum is broadcast back as each bucket's
    rank offset, and the global rank is offset + a LOCAL row_number
    inside vb. Bit-identical to the one-window form because vb is a
    prefix of the ordering (p1 < p2 implies vb1 <= vb2; ties stay in
    one vb and are broken by the unique key).
    """
    from pyspark.sql import Window

    sample = orders.select("o_orderkey", "o_totalprice")
    if cut < RANGE_GATE_SPACE:
        # literal cutoff => plain pushdown-able filter, no join
        sample = sample.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6)
            < format(cut, "06x")
        )
    sample = sample.withColumn(
        "vb", F.floor(F.col("o_totalprice") / F.lit(4096.0))
    )
    counts = sample.groupBy("vb").agg(F.count(F.lit(1)).alias("n_rows"))
    w_off = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "vb",
        F.coalesce(F.sum("n_rows").over(w_off), F.lit(0)).alias("rank_offset"),
        F.sum("n_rows").over(Window.partitionBy()).alias("n"),
    )
    w_loc = Window.partitionBy("vb").orderBy("o_totalprice", "o_orderkey")
    ranked = (
        sample.withColumn("local_rn", F.row_number().over(w_loc))
        .join(F.broadcast(offsets), "vb")
        .withColumn("rn", F.col("rank_offset") + F.col("local_rn"))
    )
    # integer division on both sides (Spark `div` == DuckDB `//`):
    # never float-divide then floor/cast — DuckDB's double->int cast
    # ROUNDS while Spark's truncates
    bucket = F.expr(f"(rn * {n_buckets}) div n").cast("int")
    return (
        ranked.withColumn("bucket_id", bucket)
        .filter(F.col("bucket_id") < n_buckets)
        .groupBy("bucket_id")
        .agg(
            F.max("o_totalprice").alias("upper_bound"),
            F.count(F.lit(1)).alias("sample_rows"),
        )
    )


@register(
    "x_range_partition_bounds",
    oracle=f"""
WITH gate AS (
  SELECT least({RANGE_GATE_SPACE}, greatest(1,
           ({RANGE_GATE_SPACE * RANGE_N_BUCKETS * RANGE_TARGET_ROWS_PER_BUCKET}
            + count(*) - 1) // count(*)))::BIGINT AS cut
  FROM orders
),
sample AS (
  SELECT o_orderkey, o_totalprice
  FROM orders, gate
  WHERE cut >= {RANGE_GATE_SPACE}
     OR substr(md5((o_orderkey)::VARCHAR), 1, 6) < printf('%06x', cut)
),
ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM sample
)
SELECT ((rn * {RANGE_N_BUCKETS}) // n)::INTEGER AS bucket_id,
       max(o_totalprice) AS upper_bound,
       count(*)::BIGINT AS sample_rows
FROM ranked
WHERE (rn * {RANGE_N_BUCKETS}) // n < {RANGE_N_BUCKETS}
GROUP BY bucket_id
""",
    doc="Range-partitioning boundary computation — the planning step "
    "behind repartitionByRange / global sort at scale. The gate "
    "fraction is SCALE-AWARE: a count pass sizes the md5 hash-gate "
    "cutoff so the sample holds ~64k rows per bucket regardless of "
    "input size (12.5% of 100 TB through one sort was the r5 weak "
    "spot; 12.5% of sf0.01 is too few for tight bounds — both fixed "
    "by deriving the fraction from the count, mirrored integer-exactly "
    "in the oracle). The sample is ranked by a TWO-LEVEL prefix rank "
    "(value-bucket offsets + local row_number — no single-reducer "
    "window even if the gate under-shrinks), and the 100 TB fact is "
    "then range-routed by the resulting bounds as a stateless filter — "
    "exactly Spark's RangePartitioner, made reproducible and "
    "oracle-checkable. Never rand(): re-runs must pick the same rows.",
    tags=("sampling", "extension"),
)
def x_range_partition_bounds(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    # one scalar to the driver (the planning pass's count), so the
    # gate stays a literal pushdown filter instead of a join
    cut = range_sample_cut(
        orders.count(), RANGE_N_BUCKETS, RANGE_TARGET_ROWS_PER_BUCKET
    )
    return range_partition_bounds(orders, RANGE_N_BUCKETS, cut)


@register(
    "x_data_mixture",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS doc_tokens
  FROM documents
),
tgt AS (
  SELECT min(source_tokens)::BIGINT AS target_tokens
  FROM (SELECT sum(doc_tokens) AS source_tokens FROM tok GROUP BY source)
),
ranked AS (
  SELECT doc_id, source, doc_tokens,
         sum(doc_tokens) OVER (
           PARTITION BY source
           ORDER BY md5(doc_id::VARCHAR), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS cum_tokens,
         sum(doc_tokens) OVER (PARTITION BY source)::BIGINT AS source_tokens
  FROM tok
)
SELECT r.doc_id, r.source, r.doc_tokens, r.cum_tokens,
       r.source_tokens, g.target_tokens
FROM ranked r CROSS JOIN tgt g
WHERE r.cum_tokens <= g.target_tokens
""",
    doc="Data-mixture balancing: every source contributes the same "
    "token budget (the smallest source's total), selecting docs per "
    "source in deterministic md5-hash order until the running token "
    "sum hits the budget — the source-weighting pass a pretraining "
    "pipeline runs before sequence packing. All-integer arithmetic "
    "(token counts, running sums; no float rates to drift across "
    "engines), hash order instead of rand() so re-runs and the oracle "
    "pick identical rows. Plan: TWO-LEVEL prefix sum — a naive "
    "cumulative window partitioned by source serializes each source "
    "through one reducer (multi-TB per task at 100 TB with ~20 "
    "sources), so instead the wide data is bucketed by (source, first "
    "2 md5 hex chars) = |sources|x256 partitions; per-bucket token "
    "totals form a tiny table whose exclusive prefix sum (window over "
    "~5k rows) is broadcast back as each bucket's offset, and the "
    "running sum is offset + a LOCAL cumsum inside the (source, "
    "bucket) window. Bit-identical to the single-window form because "
    "the bucket is a PREFIX of the ordering key (md5 hex), so bucket "
    "order + within-bucket order == global per-source hash order. "
    "source_tokens and the scalar target both derive from the same "
    "tiny bucket-totals table — the full fact is shuffled exactly "
    "once, on (source, bucket).",
    tags=("sampling", "extension"),
)
def x_data_mixture(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("doc_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("mix_hx"),
    ).withColumn("mix_bucket", F.substring("mix_hx", 1, 2))
    # Tiny side: per-(source, bucket) token totals -> exclusive prefix
    # offsets + per-source totals + the global scalar target. <= 20x256
    # rows, so the single-partition windows here are free.
    bucket_tot = tok.groupBy("source", "mix_bucket").agg(
        F.sum("doc_tokens").alias("bucket_tokens")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("mix_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        "source",
        "mix_bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0)).alias("bucket_offset"),
        F.sum("bucket_tokens").over(Window.partitionBy("source")).alias("source_tokens"),
    )
    tgt = (
        bucket_tot.groupBy("source")
        .agg(F.sum("bucket_tokens").alias("st"))
        .agg(F.min("st").alias("target_tokens"))
    )
    # Wide side: ONE shuffle on (source, bucket); local cumsum + offset.
    w_loc = (
        Window.partitionBy("source", "mix_bucket")
        .orderBy("mix_hx", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        tok.withColumn("local_cum", F.sum("doc_tokens").over(w_loc))
        .join(F.broadcast(offsets), ["source", "mix_bucket"])
        .withColumn("cum_tokens", F.col("bucket_offset") + F.col("local_cum"))
    )
    return (
        ranked.crossJoin(F.broadcast(tgt))
        .filter(F.col("cum_tokens") <= F.col("target_tokens"))
        .select(
            "doc_id",
            "source",
            "doc_tokens",
            "cum_tokens",
            "source_tokens",
            "target_tokens",
        )
    )


N_SHARDS = 16  # one hex digit of the shard hash; a power of two like real runs


@register(
    "x_shard_assign",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source,
         len(string_split(text, ' '))::BIGINT AS doc_tokens,
         md5('shard|' || doc_id::VARCHAR) AS hx
  FROM documents
)
SELECT doc_id, source, doc_tokens,
       (instr('0123456789abcdef', substr(hx, 1, 1)) - 1)::INT AS shard_id,
       (row_number() OVER (
          PARTITION BY substr(hx, 1, 1) ORDER BY hx, doc_id) - 1)::BIGINT AS pos
FROM h
""",
    doc="Training-order manifest: the reproducible global shuffle + "
    "sharding pass a pretraining pipeline ends with. Each doc's shard "
    "is the first hex digit of a salted md5 (a pure stateless filter "
    "-- NO global sort anywhere), and its position within the shard is "
    "a window rank over the hash order, so the (shard_id, pos) order "
    "is uniformly shuffled yet bit-reproducible across re-runs and "
    "engines (never rand() or monotonically_increasing_id, both of "
    "which are partition-layout-dependent). Plan: TWO-LEVEL rank — a "
    "row_number partitioned by the shard digit alone is 16 reducers "
    "total (each dragging 1/16th of 100 TB through one task), so the "
    "wide shuffle instead partitions by (digit, next-2-hex-chars) = "
    "16x256 partitions; per-sub-bucket counts form a tiny table whose "
    "exclusive prefix sum per digit is broadcast back as the rank "
    "offset, pos = offset + local row_number - 1. Bit-identical to "
    "the one-window form because the sub-bucket is a PREFIX of the "
    "ordering key (hx). At 100 TB the physical write is "
    "write.partitionBy(shard_id) + sortWithinPartitions(pos), one "
    "file stream per shard.",
    tags=("sampling", "extension"),
)
def x_shard_assign(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("doc_tokens"),
        F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))).alias("hx"),
    ).withColumn("shard_digit", F.substring("hx", 1, 1)).withColumn(
        "shard_sub", F.substring("hx", 2, 2)
    )
    # Tiny side: per-(digit, sub-bucket) row counts -> exclusive prefix
    # offsets within each digit (16x256 rows max).
    counts = h.groupBy("shard_digit", "shard_sub").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w_off = (
        Window.partitionBy("shard_digit")
        .orderBy("shard_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "shard_digit",
        "shard_sub",
        F.coalesce(F.sum("n_rows").over(w_off), F.lit(0)).alias("rank_offset"),
    )
    # Wide side: ONE shuffle on (digit, sub); local rank + offset.
    w_loc = Window.partitionBy("shard_digit", "shard_sub").orderBy("hx", "doc_id")
    return (
        h.withColumn("local_rn", F.row_number().over(w_loc))
        .join(F.broadcast(offsets), ["shard_digit", "shard_sub"])
        .select(
            "doc_id",
            "source",
            "doc_tokens",
            (F.expr("instr('0123456789abcdef', shard_digit)") - 1)
            .cast("int")
            .alias("shard_id"),
            (F.col("rank_offset") + F.col("local_rn") - 1).cast("long").alias("pos"),
        )
    )


N_NEGATIVES = 3  # negatives per anchor


@register(
    "x_negative_sampling",
    oracle=f"""
WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
anchors AS (
  SELECT d.doc_id, d.source, k,
         ('0x' || substr(md5('neg|' || d.doc_id::VARCHAR || '|' || k::VARCHAR), 1, 8))::BIGINT
           % n.n_docs AS raw_partner
  FROM documents d, n, unnest(generate_series(0, {N_NEGATIVES - 1})) t(k)
),
resolved AS (
  SELECT doc_id, source, k::INT AS k,
         CASE WHEN raw_partner = doc_id THEN (raw_partner + 1) % (SELECT n_docs FROM n)
              ELSE raw_partner END AS partner_id
  FROM anchors
)
SELECT r.doc_id, r.k, r.partner_id,
       r.source AS anchor_source, p.source AS partner_source,
       (r.source <> p.source) AS cross_source
FROM resolved r JOIN documents p ON r.partner_id = p.doc_id
""",
    doc="Deterministic negative sampling for contrastive training: each "
    "anchor doc gets K pseudo-random partner docs via a salted md5 "
    "ranged over the corpus size — never rand(), so re-runs, resumed "
    "jobs, and the oracle draw identical negatives, and a doc's "
    "negatives don't depend on partitioning. Self-collisions remap to "
    "the next id. Plan: one scalar count broadcast, a K-way explode "
    "(map-side), and ONE shuffle join on partner_id to fetch partner "
    "metadata — at 100 TB the join is the only wide stage and "
    "partner ids are uniform, so no skew.",
    tags=("sampling", "extension"),
)
def x_negative_sampling(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = (
        docs.select("doc_id", "source")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "source",
            "n_docs",
            F.explode(F.sequence(F.lit(0), F.lit(N_NEGATIVES - 1))).alias("k"),
        )
        .withColumn(
            "raw_partner",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("neg|"),
                            F.col("doc_id").cast("string"),
                            F.lit("|"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("n_docs"),
        )
        .withColumn(
            "partner_id",
            F.when(
                F.col("raw_partner") == F.col("doc_id"),
                (F.col("raw_partner") + 1) % F.col("n_docs"),
            ).otherwise(F.col("raw_partner")),
        )
    )
    partners = docs.select(
        F.col("doc_id").alias("partner_id"), F.col("source").alias("partner_source")
    )
    return (
        anchors.join(partners, "partner_id")
        .select(
            "doc_id",
            F.col("k").cast("int").alias("k"),
            "partner_id",
            F.col("source").alias("anchor_source"),
            "partner_source",
            (F.col("source") != F.col("partner_source")).alias("cross_source"),
        )
    )


N_FOLDS = 5


@register(
    "x_kfold_assign",
    # Deterministic k-fold cross-validation assignment: fold =
    # int(md5(doc_id)[:4], 16) % k — stateless, reproducible, and
    # independent of row order / partitioning, like every split in
    # this module. The census proves fold balance per source (the
    # check a CV harness runs before trusting the folds).
    oracle=f"""
SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % {N_FOLDS} AS fold,
       source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM documents
GROUP BY 1, 2
""",
    doc=f"{N_FOLDS}-fold CV assignment via md5 hash mod — a stateless "
    "projection (no shuffle until the census aggregate), so fold "
    "filtering pushes down as a plain predicate and any executor "
    "count reproduces identical folds.",
    tags=("sampling", "extension"),
)
def x_kfold_assign(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .cast("int")
        % N_FOLDS
    )
    return (
        docs.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "x_gini_source_concentration",
    # Gini coefficient of character mass across sources — the
    # mixture-diversity scalar (0 = perfectly even corpus, 1 = one
    # source owns everything). Computed on the |sources|-row totals
    # table with the sorted-cumulative formula
    #   G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n,
    # all integer until two final divisions evaluated in identical
    # order. The rank is over the unique (mass, source) chain.
    oracle="""
WITH s AS (
  SELECT source, sum(n_chars)::BIGINT AS mass
  FROM documents GROUP BY source
),
r AS (
  SELECT source, mass,
         row_number() OVER (ORDER BY mass, source) AS i,
         count(*) OVER ()::BIGINT AS n,
         sum(mass) OVER ()::BIGINT AS total
  FROM s
)
SELECT n AS n_sources, total AS total_chars,
       2::DOUBLE * sum(i * mass) / (n * total)
         - (n + 1)::DOUBLE / n AS gini
FROM r
GROUP BY n, total
""",
    doc="Source-concentration Gini over character mass: one "
    "|sources|-key aggregate from the fact scan, then the closed-form "
    "Gini on the tiny totals table (rank window over 20 rows — "
    "driver-scale by construction, not a corpus window). The "
    "diversity number next to x_data_mixture's balancing.",
    tags=("sampling", "stats", "extension"),
)
def x_gini_source_concentration(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.sum("n_chars").alias("mass"))
    w = Window.orderBy("mass", "source")
    r = s.select(
        "mass",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("mass").over(Window.partitionBy()).alias("total"),
    )
    return r.groupBy("n", "total").agg(
        (
            F.lit(2.0) * F.sum(F.col("i") * F.col("mass")) / (F.col("n") * F.col("total"))
            - (F.col("n") + 1).cast("double") / F.col("n")
        ).alias("gini")
    ).select(
        F.col("n").alias("n_sources"),
        F.col("total").alias("total_chars"),
        "gini",
    )


MIX_ALPHA = "0.7"  # temperature exponent, as literal text for both engines


@register(
    "x_mixture_temperature",
    # Temperature-scaled mixture weights (the mC4/XLM-R alpha-sampling
    # rule): w_i = p_i^a / sum_j p_j^a with a = 0.7 — upweights
    # low-resource sources without letting the head dominate. p_i is
    # an exact integer division; pow() is engine-divergent, so each
    # source's p^a is quantized at 7 dp (20 values) before the
    # exact-decimal normalizer; the final weight is one division of
    # identical doubles.
    oracle=f"""
WITH s AS (
  SELECT source, sum(n_chars)::BIGINT AS mass FROM documents GROUP BY 1
),
t AS (SELECT sum(mass)::BIGINT AS total FROM s),
p AS (
  SELECT source, mass,
         printf('%.7f', pow(mass::DOUBLE / total, {MIX_ALPHA}::DOUBLE))::DOUBLE
           AS pa
  FROM s, t
),
z AS (SELECT {dsum_sql('pa')} AS norm FROM p)
SELECT p.source, p.mass, p.pa / z.norm AS weight
FROM p, z
""",
    doc="Alpha-sampling mixture weights per source (temperature 0.7): "
    "one |sources|-key aggregate touches the fact; the 20-row share "
    "table gets quantized powers, an exact-decimal normalizer, and "
    "one division — deterministic across engines and cluster sizes. "
    "The multilingual-balancing rule next to x_data_mixture's "
    "token-budget mixing.",
    tags=("sampling", "extension"),
)
def x_mixture_temperature(spark, sf_dir):
    from ..functions.exact import dsum

    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.sum("n_chars").alias("mass"))
    t = s.agg(F.sum("mass").alias("total"))
    p = s.crossJoin(F.broadcast(t)).select(
        "source",
        "mass",
        F.format_string(
            "%.7f",
            F.pow(
                F.col("mass").cast("double") / F.col("total"),
                F.lit(MIX_ALPHA).cast("double"),
            ),
        )
        .cast("double")
        .alias("pa"),
    )
    z = p.agg(dsum("pa").alias("norm"))
    return p.crossJoin(F.broadcast(z)).select(
        "source", "mass", (F.col("pa") / F.col("norm")).alias("weight")
    )


def _qw_oracle() -> str:
    from ..operators.text import quality_score_sql

    q = "(" + quality_score_sql("w", "text") + ")"
    return f"""
SELECT doc_id, source,
       {q} AS quality_score,
       ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT AS hash_byte
FROM (SELECT doc_id, source, text,
             string_split(lower(text), ' ') AS w FROM documents)
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT
      < floor({q} * 256::DOUBLE)
"""


@register(
    "x_quality_weighted_sample",
    # Quality-proportional retention (FineWeb-style curation): doc i
    # survives iff hash_byte(doc_id) < floor(quality_i * 256) — a
    # deterministic coin whose acceptance probability IS the quality
    # score. Stateless and reproducible like every sampler here; the
    # comparison is integer vs integer (the score is bit-exact across
    # engines, floor of its scaling likewise), so the kept set is
    # identical everywhere.
    oracle=_qw_oracle(),
    doc="Quality-weighted deterministic sampling: acceptance "
    "probability equals the Gopher/C4 quality score, implemented as "
    "an md5-byte threshold — a pure pushdown-able filter, no state, "
    "no shuffle; re-running at any scale keeps exactly the same "
    "documents. The retention rule between hard filtering (drop "
    "below cutoff) and uniform sampling.",
    tags=("sampling", "extension"),
)
def x_quality_weighted_sample(spark, sf_dir):
    from ..operators.text import quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    q = quality_score("w", F.col("text"))
    hb = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return (
        docs.select(
            "doc_id", "source", q.alias("quality_score"), hb.alias("hash_byte")
        )
        .filter(F.col("hash_byte") < F.floor(F.col("quality_score") * F.lit(256.0)))
    )


ES_SAMPLE_K = 50


def _es_oracle() -> str:
    from ..operators.text import quality_score_sql

    return f"""
WITH w AS (
  SELECT doc_id, source,
         {quality_score_sql('w', 'text')} + 0.01::DOUBLE AS wt,
         (('0x' || substr(md5('es|' || doc_id::VARCHAR), 1, 12))::BIGINT + 1)::DOUBLE
           / 281474976710657.0 AS u
  FROM (SELECT doc_id, source, text,
               string_split(lower(text), ' ') AS w FROM documents)
),
ekeyed AS (
  SELECT doc_id, source, wt,
         printf('%.7f', pow(u, 1.0::DOUBLE / wt))::DOUBLE AS es_key
  FROM w
)
SELECT doc_id, source, wt, es_key
FROM ekeyed
ORDER BY es_key DESC, doc_id
LIMIT {ES_SAMPLE_K}
"""


@register(
    "x_weighted_sample_es",
    # Efraimidis-Spirakis weighted sampling WITHOUT replacement: each
    # doc draws u ~ U(0,1) from a keyed md5 and gets key u^(1/w); the
    # k largest keys are the sample — inclusion probability
    # proportional to weight, one pass, mergeable (union shard top-ks,
    # keep the global top-k: the same heap shape as TakeOrdered).
    # pow(double, double) is 1-ulp across engines, so the key is
    # quantized at 7 dp (per row — the smallest frame) before the
    # rank; the (key DESC, doc_id) chain breaks quantized ties.
    oracle=_es_oracle(),
    doc="Weighted sampling without replacement (Efraimidis-Spirakis): "
    "top-{k} docs by u^(1/quality_weight) with a keyed-hash u — the "
    "fixed-SIZE counterpart to the Bernoulli quality-weighted sampler, "
    "reproducible across re-runs and engines. Compiles to "
    "TakeOrderedAndProject (per-partition heaps), never a global "
    "sort.".format(k=ES_SAMPLE_K),
    tags=("sampling", "extension"),
)
def x_weighted_sample_es(spark, sf_dir):
    from ..operators.text import quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    wt = quality_score("w", F.col("text")) + F.lit(0.01)
    u = (
        (
            F.expr(
                "cast(conv(substring(md5(concat('es|', cast(doc_id as string))),"
                " 1, 12), 16, 10) as bigint)"
            )
            + F.lit(1)
        ).cast("double")
        / F.lit(281474976710657.0)
    )
    keyed = docs.select(
        "doc_id",
        "source",
        wt.alias("wt"),
        F.format_string("%.7f", F.pow(u, F.lit(1.0) / wt)).cast("double").alias(
            "es_key"
        ),
    )
    return keyed.orderBy(F.col("es_key").desc(), "doc_id").limit(ES_SAMPLE_K)


N_SUBSAMPLES = 50


def _subsample_ci_oracle() -> str:
    from ..operators.text import quality_score_sql

    return f"""
WITH q AS (
  SELECT doc_id, {quality_score_sql('w', 'text')} AS quality
  FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents)
),
reps AS (
  SELECT b.b,
         round(sum(CASE WHEN ('0x' || substr(md5(b.b::VARCHAR || '|' || q.doc_id::VARCHAR), 1, 2))::INT < 128
                        THEN (q.quality)::DECIMAL(30,10) END), 4)::DOUBLE
           / sum(CASE WHEN ('0x' || substr(md5(b.b::VARCHAR || '|' || q.doc_id::VARCHAR), 1, 2))::INT < 128
                      THEN 1 ELSE 0 END) AS m
  FROM q, unnest(generate_series(0, {N_SUBSAMPLES - 1})) b(b)
  GROUP BY b.b
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM reps
),
full_mean AS (
  SELECT round(sum(quality::DECIMAL(30,10)), 4)::DOUBLE / count(*) AS mu FROM q
)
SELECT (SELECT mu FROM full_mean) AS point_estimate,
       min(CASE WHEN rn = 2 THEN m END) AS ci_lo,
       min(CASE WHEN rn = {N_SUBSAMPLES - 1} THEN m END) AS ci_hi,
       {N_SUBSAMPLES}::INT AS n_replicates
FROM ranked
"""


@register(
    "x_subsample_ci",
    oracle=_subsample_ci_oracle(),
    doc="Subsampling confidence interval (Politis-Romano) for the mean "
    "quality score: 50 deterministic half-samples via keyed md5 gates "
    "(replicate membership is a stateless per-(replicate, doc) "
    "expression — one explode + one aggregate, no rand(), identical "
    "in re-runs and both engines), replicate means through the exact "
    "decimal path, CI endpoints by rank selection over the 50-row "
    "frame. The uncertainty quantification every corpus health number "
    "should ship with.",
    tags=("sampling", "stats", "extension"),
)
def x_subsample_ci(spark, sf_dir):
    from ..functions.exact import DEC
    from ..operators.text import quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    q = docs.select("doc_id", quality_score("w", F.col("text")).alias("quality"))
    reps = (
        q.select(
            "doc_id",
            "quality",
            F.explode(F.sequence(F.lit(0), F.lit(N_SUBSAMPLES - 1))).alias("b"),
        )
        .withColumn(
            "inb",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("b").cast("string"),
                            F.lit("|"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("int")
            < 128,
        )
        .groupBy("b")
        .agg(
            (
                F.round(
                    F.sum(F.when(F.col("inb"), F.col("quality").cast(DEC))), 4
                ).cast("double")
                / F.sum(F.when(F.col("inb"), 1).otherwise(0))
            ).alias("m")
        )
    )
    from pyspark.sql import Window

    ranked = reps.withColumn(
        "rn", F.row_number().over(Window.orderBy("m", "b"))
    )
    fm = q.agg(
        (F.round(F.sum(F.col("quality").cast(DEC)), 4).cast("double") / F.count(F.lit(1))).alias("mu")
    )
    ci = ranked.agg(
        F.min(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == N_SUBSAMPLES - 1, F.col("m"))).alias("ci_hi"),
    )
    return fm.crossJoin(F.broadcast(ci)).select(
        F.col("mu").alias("point_estimate"),
        "ci_lo",
        "ci_hi",
        F.lit(N_SUBSAMPLES).cast("int").alias("n_replicates"),
    )


STRAT_NUM, STRAT_DEN = 1, 10  # exact 10% allocation per stratum


@register(
    "x_stratified_sample_exact",
    # Exact-allocation stratified sampling: every source contributes
    # EXACTLY ceil(n_g / 10) documents (the hash-gate samplers above
    # are probabilistic — binomial counts around the rate; ablation
    # protocols and eval-set builds need fixed per-stratum counts).
    # Selection is the first ceil(n_g/10) docs by md5 rank within the
    # stratum — deterministic, re-runnable, and engine-identical
    # (lowercase-hex string order), with doc_id closing the unique
    # order chain.
    oracle=f"""
WITH counted AS (
  SELECT source, count(*)::BIGINT AS n_total FROM documents GROUP BY 1
),
ranked AS (
  SELECT d.doc_id, d.source, c.n_total,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5('strat|' || d.doc_id::VARCHAR),
                                     d.doc_id) AS rk
  FROM documents d JOIN counted c USING (source)
)
SELECT source, doc_id, rk::BIGINT AS sample_rank, n_total,
       ((n_total * {STRAT_NUM} + {STRAT_DEN - 1}) // {STRAT_DEN})::BIGINT
         AS n_target
FROM ranked
WHERE rk <= (n_total * {STRAT_NUM} + {STRAT_DEN - 1}) // {STRAT_DEN}
""",
    doc="Exact-count stratified sample: ceil(10%) of every source by "
    "deterministic md5 rank — the fixed-allocation eval/ablation "
    "split that probabilistic hash gates cannot give. One broadcast "
    "of the per-source counts plus one source-PARTITIONED rank "
    "window (the per-stratum bound is a column, so Spark's "
    "WindowGroupLimit literal-limit pruning does not apply — each "
    "stratum sorts within its partition, which scales with stratum "
    "size); for a pathologically hot stratum swap in the two-level "
    "value-bucket rank used by x_range_partition_bounds.",
    tags=("sampling", "extension"),
)
def x_stratified_sample_exact(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    counted = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    target = F.expr(
        f"(n_total * {STRAT_NUM} + {STRAT_DEN - 1}) div {STRAT_DEN}"
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("strat|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.join(F.broadcast(counted), "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("n_target", target.cast("long"))
        .filter(F.col("rk") <= F.col("n_target"))
        .select(
            "source",
            "doc_id",
            F.col("rk").alias("sample_rank"),
            "n_total",
            "n_target",
        )
    )


ZORDER_BUCKETS_LOG2 = 4  # 16 files per layout
# Morton math shared with the spatial domain (operators/spatial.py:
# morton_key / morton_key_sql — magic-mask bit spreading, x in even
# bits, y in odd; bit-identical in both engines).


@register(
    "x_zorder_layout",
    # Z-order vs linear data layout, measured: events normalize to a
    # 16-bit (user, time) grid; the z-order layout buckets rows by the
    # top-4 Morton-key bits, the linear layout by the top-4 time bits.
    # Per layout the report is the average per-file min-max extent in
    # EACH dimension — the numbers that decide how much a file-skipping
    # scan (parquet zone maps / Delta-Iceberg data skipping) can prune
    # for single-dimension predicates. Linear time layout: perfect
    # time extents, full-range user extents (user predicates prune
    # nothing); z-order: both dimensions at ~1/4 range. All integer
    # arithmetic; the Morton expression text is shared verbatim.
    oracle=f"""
WITH b AS (
  SELECT min(user_id)::BIGINT AS x0, max(user_id)::BIGINT AS x1,
         min(floor(epoch(ts)))::BIGINT AS y0, max(floor(epoch(ts)))::BIGINT AS y1
  FROM events
),
norm AS (
  SELECT least(65535, ((user_id - b.x0) * 65535) // greatest(b.x1 - b.x0, 1))
           AS xn,
         least(65535, ((floor(epoch(ts))::BIGINT - b.y0) * 65535)
                        // greatest(b.y1 - b.y0, 1)) AS yn
  FROM events, b
),
keyed AS (
  SELECT xn, yn, {morton_key_sql('xn', 'yn')} AS zkey FROM norm
),
layouts AS (
  SELECT 'zorder' AS layout, zkey >> {32 - ZORDER_BUCKETS_LOG2} AS bucket,
         xn, yn FROM keyed
  UNION ALL
  SELECT 'linear_time' AS layout, yn >> {16 - ZORDER_BUCKETS_LOG2} AS bucket,
         xn, yn FROM keyed
),
per_bucket AS (
  SELECT layout, bucket,
         max(xn) - min(xn) AS ext_x,
         max(yn) - min(yn) AS ext_y,
         count(*)::BIGINT AS n_rows
  FROM layouts GROUP BY 1, 2
)
SELECT layout,
       count(*)::BIGINT AS n_files,
       sum(n_rows)::BIGINT AS n_rows,
       sum(ext_x)::DOUBLE / count(*) AS avg_user_extent,
       sum(ext_y)::DOUBLE / count(*) AS avg_time_extent,
       sum(ext_x * ext_y)::DOUBLE / count(*) AS avg_cell_area
FROM per_bucket
GROUP BY layout
""",
    doc="Z-order layout evaluation: Morton-interleave the normalized "
    "(user, time) coordinates, bucket by the key's top bits, and "
    "compare per-file min-max extents against the linear time layout "
    "— the data-skipping math behind Delta/Iceberg Z-ORDER at 100 TB "
    "(a file's min-max extent IS what zone-map pruning can skip). "
    "Pure integer bit arithmetic via the shared morton_key/morton_key_sql "
    "pair from the spatial domain; one min-max pass plus one "
    "bucket aggregate.",
    tags=("sampling", "extension"),
)
def x_zorder_layout(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.min("user_id").alias("x0"),
        F.max("user_id").alias("x1"),
        F.min(F.col("ts").cast("long")).alias("y0"),
        F.max(F.col("ts").cast("long")).alias("y1"),
    )
    norm = ev.crossJoin(F.broadcast(b)).select(
        F.least(
            F.lit(65535),
            F.expr("((user_id - x0) * 65535) div greatest(x1 - x0, 1)"),
        ).alias("xn"),
        F.least(
            F.lit(65535),
            F.expr("((cast(ts as long) - y0) * 65535) div greatest(y1 - y0, 1)"),
        ).alias("yn"),
    )
    keyed = norm.withColumn("zkey", morton_key(F.col("xn"), F.col("yn")))
    z = keyed.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"zkey >> {32 - ZORDER_BUCKETS_LOG2}").alias("bucket"),
        "xn",
        "yn",
    )
    lin = keyed.select(
        F.lit("linear_time").alias("layout"),
        F.expr(f"yn >> {16 - ZORDER_BUCKETS_LOG2}").alias("bucket"),
        "xn",
        "yn",
    )
    per_bucket = (
        z.unionByName(lin)
        .groupBy("layout", "bucket")
        .agg(
            (F.max("xn") - F.min("xn")).alias("ext_x"),
            (F.max("yn") - F.min("yn")).alias("ext_y"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return per_bucket.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        (F.sum("ext_x").cast("double") / F.count(F.lit(1))).alias(
            "avg_user_extent"
        ),
        (F.sum("ext_y").cast("double") / F.count(F.lit(1))).alias(
            "avg_time_extent"
        ),
        (
            F.sum(F.col("ext_x") * F.col("ext_y")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_cell_area"),
    )


@register(
    "x_percentile_normalize",
    # Cross-source score calibration: raw quality scores are not
    # comparable across heterogeneous sources (each source has its own
    # score distribution), so mixture weighting and thresholding use
    # the WITHIN-SOURCE percentile instead — rank / n over a
    # (source)-partitioned window with the unique (score, doc_id)
    # chain. Integer rank over integer count: one IEEE division,
    # engine-identical. The rank-based twin of z-scoring that needs no
    # distributional assumption.
    oracle="""
WITH w AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source, n_chars::BIGINT AS n_chars,
       rk::BIGINT AS rank_in_source,
       rk::DOUBLE / n AS percentile
FROM w
""",
    doc="Within-source percentile normalization of the document length "
    "score: rank/n over a source-partitioned window (unique order "
    "chain), producing the cross-source-comparable [0,1] score that "
    "mixture weighting and global thresholds need — heterogeneous "
    "sources can't share a raw-score cut. Partitioned window only; "
    "for a pathologically hot source the two-level value-bucket rank "
    "applies as everywhere else.",
    tags=("sampling", "extension"),
)
def x_percentile_normalize(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    n = Window.partitionBy("source")
    return docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(w).cast("long").alias("rank_in_source"),
        (
            F.row_number().over(w).cast("double")
            / F.count(F.lit(1)).over(n)
        ).alias("percentile"),
    )


DSIR_B = 64  # hashed-feature buckets (the dimensionality cap)
DSIR_TOPK = 20


@register(
    "x_dsir_importance",
    # DSIR — Data Selection via Importance Resampling (Xie et al.
    # 2023, public): select raw-pool documents that look like a target
    # distribution by importance weight under hashed n-gram bag
    # models. Bigrams hash into B=64 buckets (the DSIR trick: model
    # size is B regardless of vocabulary — broadcastable at any
    # corpus scale); target = lang 'en' docs, raw pool = the rest;
    # per-bucket log-ratio ln p_b - ln q_b with add-one smoothing,
    # each ln quantized %.7f (the repo's 1-ulp recipe) so both
    # engines subtract identical doubles; per-doc weight = decimal
    # sum of its occurrences' ratios; TakeOrdered top-20 under a
    # unique (weight DESC, doc_id) chain. The corpus is never
    # re-shuffled: scoring is a broadcast join of the gram stream to
    # the 64-row ratio table, then one groupBy(doc).
    oracle=f"""
WITH grams AS (
  SELECT doc_id, source, lang,
         ('0x' || substr(md5(a[i - 1] || ' ' || a[i]), 1, 6))::INT % {DSIR_B} AS b
  FROM (SELECT doc_id, source, lang, string_split(lower(text), ' ') AS a
        FROM documents),
       LATERAL unnest(generate_series(2, len(a))) t(i)
  WHERE a[i - 1] <> '' AND a[i] <> ''
),
tgt AS (SELECT b, count(*)::BIGINT AS c FROM grams WHERE lang = 'en' GROUP BY 1),
raw AS (SELECT b, count(*)::BIGINT AS c FROM grams WHERE lang <> 'en' GROUP BY 1),
tot AS (
  SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS t_n,
         sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS r_n
  FROM grams
),
ratio AS (
  SELECT s.b,
         printf('%.7f', ln((coalesce(t.c, 0) + 1)::DOUBLE
                           / (tot.t_n + {DSIR_B})))::DOUBLE
           - printf('%.7f', ln((coalesce(r.c, 0) + 1)::DOUBLE
                               / (tot.r_n + {DSIR_B})))::DOUBLE AS lr
  FROM (SELECT unnest(generate_series(0, {DSIR_B - 1})) AS b) s
  CROSS JOIN tot
  LEFT JOIN tgt t ON t.b = s.b
  LEFT JOIN raw r ON r.b = s.b
),
scored AS (
  SELECT g.doc_id, g.source, g.lang,
         count(*)::BIGINT AS n_bigrams,
         {dsum_sql('ratio.lr')} AS dsir_logweight
  FROM grams g JOIN ratio ON ratio.b = g.b
  WHERE g.lang <> 'en'
  GROUP BY 1, 2, 3
)
SELECT doc_id, source, lang, n_bigrams, dsir_logweight
FROM scored
ORDER BY dsir_logweight DESC, doc_id
LIMIT {DSIR_TOPK}
""",
    doc="DSIR importance resampling (hashed bigram bag models): score "
    "every raw-pool document by how target-like its hashed-feature "
    "counts are (sum of per-bucket smoothed log-probability ratios) "
    "and take the top-20 — the published importance-resampling "
    "selector behind domain-matched pretraining data. The two "
    "B=64-bucket models broadcast at any corpus size; scoring never "
    "shuffles the corpus (broadcast ratio join + one per-doc agg).",
    tags=("sampling", "text", "extension"),
)
def x_dsir_importance(spark, sf_dir):
    from ..functions.exact import dsum

    docs = load(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id", "source", "lang", F.split(F.lower("text"), " ").alias("a")
        )
        .filter(F.size("a") >= 2)  # sequence(2, n) descends for n < 2
        .select(
            "doc_id",
            "source",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(a)), i -> "
                    "struct(a[i - 2] AS w1, a[i - 1] AS w2))"
                )
            ).alias("p"),
        )
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .select(
            "doc_id",
            "source",
            "lang",
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(" ", "p.w1", "p.w2")), 1, 6),
                    16,
                    10,
                ).cast("int")
                % DSIR_B
            ).alias("b"),
        )
        .transform(lineage_cut_lazy)  # consumed by tgt, raw, tot, scoring
    )
    tgt = grams.filter(F.col("lang") == "en").groupBy("b").agg(
        F.count(F.lit(1)).alias("tc")
    )
    raw = grams.filter(F.col("lang") != "en").groupBy("b").agg(
        F.count(F.lit(1)).alias("rc")
    )
    tot = grams.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_n"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("r_n"),
    )
    qln = lambda num, den: F.format_string(
        "%.7f", F.log(num.cast("double") / den.cast("double"))
    ).cast("double")
    ratio = (
        spark.range(DSIR_B)
        .select(F.col("id").cast("int").alias("b"))
        .crossJoin(F.broadcast(tot))
        .join(tgt, "b", "left")
        .join(raw, "b", "left")
        .select(
            "b",
            (
                qln(F.coalesce("tc", F.lit(0)) + 1, F.col("t_n") + DSIR_B)
                - qln(F.coalesce("rc", F.lit(0)) + 1, F.col("r_n") + DSIR_B)
            ).alias("lr"),
        )
    )
    return (
        grams.filter(F.col("lang") != "en")
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            dsum("lr").alias("dsir_logweight"),
        )
        .orderBy(F.col("dsir_logweight").desc(), "doc_id")
        .limit(DSIR_TOPK)
    )


HILBERT_ORDER = 4  # 16x16 grid -> 256-entry lookup, small enough to inline


def _hilbert_list() -> list[int]:
    from ..operators.spatial import hilbert_table

    return hilbert_table(HILBERT_ORDER)


@register(
    "x_hilbert_layout",
    # Hilbert vs Z-order layout locality, measured on real data: the
    # classic result is that Hilbert's every step is Manhattan-1 while
    # Morton takes long diagonal jumps between quadrants, so
    # Hilbert-sorted files have tighter min-max extents. Events map to
    # a 16x16 (user, time) grid; the Hilbert index comes from a
    # 256-entry lookup PRECOMPUTED in Python and inlined verbatim into
    # both engines (the per-bit rotation state of hilbert_xy2d doesn't
    # fold into SQL the way Morton's independent bit-spreads do —
    # operators/spatial.hilbert_table); Morton uses the shared
    # morton_key expression. Per curve: (a) per-file min-max extents
    # under a 16-file layout (the zone-map pruning number, as in
    # x_zorder_layout) and (b) the mean/max Manhattan step between
    # consecutive OCCUPIED cells in curve order — the locality the
    # curve actually delivers on this dataset. All integer arithmetic.
    oracle=f"""
WITH b AS (
  SELECT min(user_id)::BIGINT AS x0, max(user_id)::BIGINT AS x1,
         min(floor(epoch(ts)))::BIGINT AS y0, max(floor(epoch(ts)))::BIGINT AS y1
  FROM events
),
norm AS (
  SELECT least(15, ((user_id - b.x0) * 15) // greatest(b.x1 - b.x0, 1)) AS xn,
         least(15, ((floor(epoch(ts))::BIGINT - b.y0) * 15)
                     // greatest(b.y1 - b.y0, 1)) AS yn
  FROM events, b
),
keyed AS (
  SELECT xn, yn,
         ({_hilbert_list()!r})[(xn * 16 + yn) + 1] AS hkey,
         {{morton}} AS zkey
  FROM norm
),
curves AS (
  SELECT 'hilbert' AS curve, hkey AS k, xn, yn FROM keyed
  UNION ALL
  SELECT 'zorder' AS curve, zkey AS k, xn, yn FROM keyed
),
cells AS (
  SELECT curve, k, min(xn) AS xn, min(yn) AS yn, count(*)::BIGINT AS n_events
  FROM curves GROUP BY curve, k
),
steps AS (
  SELECT curve,
         abs(xn - lag(xn) OVER w) + abs(yn - lag(yn) OVER w) AS step
  FROM cells
  WINDOW w AS (PARTITION BY curve ORDER BY k)
),
files AS (
  SELECT curve, k >> 4 AS file_id,
         max(xn) - min(xn) AS ext_x, max(yn) - min(yn) AS ext_y
  FROM curves GROUP BY 1, 2
)
SELECT s.curve,
       (SELECT count(*) FROM cells c WHERE c.curve = s.curve)::BIGINT AS n_cells,
       sum(s.step)::DOUBLE / count(s.step) AS avg_step_manhattan,
       max(s.step)::BIGINT AS max_step_manhattan,
       (SELECT sum(f.ext_x * f.ext_y)::DOUBLE / count(*)
        FROM files f WHERE f.curve = s.curve) AS avg_file_cell_area
FROM steps s
GROUP BY s.curve
""".replace("{morton}", morton_key_sql("xn", "yn")),
    doc="Space-filling-curve locality eval: Hilbert (precomputed "
    "256-entry lookup shared verbatim across engines) vs Morton on "
    "the normalized (user, time) event grid — mean/max Manhattan step "
    "between consecutive occupied cells plus per-file extent area "
    "under a 16-file layout. The measured basis for choosing a "
    "Z-ORDER vs Hilbert clustering key at 100 TB: smaller steps = "
    "tighter zone maps = more skipped files.",
    tags=("sampling", "spatial", "extension"),
)
def x_hilbert_layout(spark, sf_dir):
    from ..operators.spatial import morton_key

    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.min("user_id").alias("x0"),
        F.max("user_id").alias("x1"),
        F.min(F.col("ts").cast("long")).alias("y0"),
        F.max(F.col("ts").cast("long")).alias("y1"),
    )
    norm = ev.crossJoin(F.broadcast(b)).select(
        F.least(
            F.lit(15),
            ((F.col("user_id") - F.col("x0")) * 15)
            / F.greatest(F.col("x1") - F.col("x0"), F.lit(1)),
        )
        .cast("long")
        .alias("xn"),
        F.least(
            F.lit(15),
            ((F.col("ts").cast("long") - F.col("y0")) * 15)
            / F.greatest(F.col("y1") - F.col("y0"), F.lit(1)),
        )
        .cast("long")
        .alias("yn"),
    )
    hlut = F.array(*[F.lit(v) for v in _hilbert_list()])
    keyed = norm.select(
        "xn",
        "yn",
        F.element_at(hlut, (F.col("xn") * 16 + F.col("yn") + 1).cast("int")).alias(
            "hkey"
        ),
        morton_key(F.col("xn"), F.col("yn")).alias("zkey"),
    )
    curves = keyed.select(
        F.lit("hilbert").alias("curve"), F.col("hkey").alias("k"), "xn", "yn"
    ).unionByName(
        keyed.select(
            F.lit("zorder").alias("curve"), F.col("zkey").alias("k"), "xn", "yn"
        )
    ).transform(lineage_cut_lazy)  # consumed by cells and files
    cells = curves.groupBy("curve", "k").agg(
        F.min("xn").alias("xn"),
        F.min("yn").alias("yn"),
        F.count(F.lit(1)).alias("n_events"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("curve").orderBy("k")
    steps = cells.select(
        "curve",
        (
            F.abs(F.col("xn") - F.lag("xn").over(w))
            + F.abs(F.col("yn") - F.lag("yn").over(w))
        ).alias("step"),
    )
    files = curves.groupBy(
        "curve", F.shiftright(F.col("k").cast("long"), 4).alias("file_id")
    ).agg(
        (F.max("xn") - F.min("xn")).alias("ext_x"),
        (F.max("yn") - F.min("yn")).alias("ext_y"),
    )
    n_cells = cells.groupBy("curve").agg(F.count(F.lit(1)).alias("n_cells"))
    area = files.groupBy("curve").agg(
        (F.sum(F.col("ext_x") * F.col("ext_y")).cast("double") / F.count(F.lit(1))).alias(
            "avg_file_cell_area"
        )
    )
    return (
        steps.groupBy("curve")
        .agg(
            (F.sum("step").cast("double") / F.count("step")).alias(
                "avg_step_manhattan"
            ),
            F.max("step").cast("long").alias("max_step_manhattan"),
        )
        .join(n_cells, "curve")
        .join(area, "curve")
        .select(
            "curve", "n_cells", "avg_step_manhattan",
            "max_step_manhattan", "avg_file_cell_area",
        )
    )


RDV_K = 8  # shard count before the expansion step


@register(
    "x_rendezvous_shards",
    # Rendezvous (highest-random-weight) sharding — the stateless
    # assignment rule whose defining property is MINIMAL MOVEMENT on
    # resharding: doc -> argmax over shards of md5(doc || shard). When
    # a 9th shard is added, a doc moves iff the NEW shard wins its
    # argmax, so (a) every moved doc moves INTO shard 8 and (b) the
    # expected moved share is exactly 1/9 — vs hash-mod sharding where
    # ~8/9 of a 100 TB corpus would relocate. Both properties are
    # visible in the output: n_moved_in = 0 for shards 0..7, and the
    # shard-8 arrival count is ~n_docs/9. The argmax is an 8/9-way
    # per-doc max (the shard axis is a tiny explode, never a shuffle);
    # the tie chain is the full hex digest + shard id, strictly unique
    # per (doc, shard). Oracle mirrors the same md5 strings.
    oracle=f"""
WITH weights AS (
  SELECT doc_id, s,
         md5('rdv|' || doc_id::VARCHAR || '|' || s::VARCHAR) || '-' || s::VARCHAR
           AS hkey
  FROM documents, unnest(generate_series(0, {RDV_K})) t(s)
),
assign AS (
  SELECT doc_id,
         arg_max(s, CASE WHEN s < {RDV_K} THEN hkey END)
           FILTER (WHERE s < {RDV_K}) AS shard_k8,
         arg_max(s, hkey) AS shard_k9
  FROM weights GROUP BY doc_id
)
SELECT s.s::INT AS shard,
       count(*) FILTER (WHERE a.shard_k8 = s.s)::BIGINT AS n_docs_k8,
       count(*) FILTER (WHERE a.shard_k9 = s.s)::BIGINT AS n_docs_k9,
       count(*) FILTER (WHERE a.shard_k9 = s.s AND a.shard_k8 <> a.shard_k9)::BIGINT
         AS n_moved_in
FROM unnest(generate_series(0, {RDV_K})) s(s), assign a
GROUP BY s.s
""",
    doc="Rendezvous-hash sharding with a resharding-movement audit: "
    "per-shard doc counts at k=8 and k=9 plus arrivals per shard when "
    "the 9th is added — zero arrivals anywhere but the new shard and "
    "~1/9 total movement, the consistent-hashing property that makes "
    "resharding a 100 TB corpus an O(N/k) copy instead of a full "
    "rewrite. Stateless md5 argmax per doc, no shuffle on the shard "
    "axis.",
    tags=("sampling", "extension"),
)
def x_rendezvous_shards(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    weights = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(RDV_K))).alias("s"),
    ).withColumn(
        "hkey",
        F.concat(
            F.md5(
                F.concat(
                    F.lit("rdv|"),
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("s").cast("string"),
                )
            ),
            F.lit("-"),
            F.col("s").cast("string"),
        ),
    )
    assign = weights.groupBy("doc_id").agg(
        F.max_by("s", F.when(F.col("s") < RDV_K, F.col("hkey"))).alias("shard_k8"),
        F.max_by("s", "hkey").alias("shard_k9"),
    )
    shards = spark.range(RDV_K + 1).select(F.col("id").cast("int").alias("shard"))
    return (
        shards.crossJoin(assign)
        .groupBy("shard")
        .agg(
            F.sum(F.when(F.col("shard_k8") == F.col("shard"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_k8"),
            F.sum(F.when(F.col("shard_k9") == F.col("shard"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_k9"),
            F.sum(
                F.when(
                    (F.col("shard_k9") == F.col("shard"))
                    & (F.col("shard_k8") != F.col("shard_k9")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_moved_in"),
        )
    )


GREEDY_K = 5


def _greedy_oracle() -> str:
    """Unrolled greedy max-coverage (K levels): recursive CTEs cannot
    aggregate over their own recursive term, so each pick is its own
    CTE pair (gains excluding covered -> argmax) — the same unrolling
    trick as the k-core and BFS oracles."""
    parts = [
        """b AS (
  SELECT DISTINCT doc_id, bg FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS bg
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents))
),
vocab AS (SELECT count(DISTINCT bg)::BIGINT AS v FROM b),
g1 AS (SELECT doc_id, count(*)::BIGINT AS gain FROM b GROUP BY doc_id),
p1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
c1 AS (SELECT DISTINCT bg FROM b WHERE doc_id IN (SELECT doc_id FROM p1))"""
    ]
    for k in range(2, GREEDY_K + 1):
        picked = " UNION ALL ".join(
            f"SELECT doc_id FROM p{j}" for j in range(1, k)
        )
        parts.append(f"""g{k} AS (
  SELECT doc_id, count(*)::BIGINT AS gain FROM b
  WHERE bg NOT IN (SELECT bg FROM c{k - 1})
    AND doc_id NOT IN ({picked})
  GROUP BY doc_id
),
p{k} AS (SELECT doc_id, gain FROM g{k} ORDER BY gain DESC, doc_id LIMIT 1),
c{k} AS (SELECT bg FROM c{k - 1}
         UNION SELECT bg FROM b WHERE doc_id IN (SELECT doc_id FROM p{k}))""")
    rows = " UNION ALL ".join(
        f"""SELECT {k} AS k, doc_id, gain,
       (SELECT count(*) FROM c{k})::BIGINT AS cum_covered FROM p{k}"""
        for k in range(1, GREEDY_K + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT k, doc_id, gain, cum_covered,
       cum_covered::DOUBLE / (SELECT v FROM vocab) AS coverage_share
FROM ({rows}) ORDER BY k"""
    )


@register(
    "x_greedy_coverage",
    # Greedy maximum-coverage data selection (the classic submodular
    # curation primitive — Nemhauser/Wolsey's greedy carries the
    # (1 - 1/e) guarantee, and "pick the K docs that together cover
    # the most vocabulary" is the textbook instance used for
    # data-subset selection): K rounds, each computing every
    # remaining doc's marginal gain (its bigrams not yet covered — an
    # anti-join, never a quadratic) and taking the argmax. The
    # universe is BIGRAMS (the unigram vocab saturates in one pick on
    # this corpus — same reason x_vocab_growth uses bigrams).
    # Iterative-by-nature: K driver rounds, one scalar row collected
    # per round, covered-set lineage cut each round; the oracle
    # unrolls the K picks as CTE pairs. Reported gains must be
    # strictly non-increasing (submodularity) — visible in the gated
    # output.
    oracle=_greedy_oracle(),
    doc="Greedy max-coverage selection of K=5 docs over the bigram "
    "universe: per-round marginal gains via anti-join against the "
    "covered set, deterministic argmax, cumulative coverage share "
    "reported per pick. The submodular data-subset-selection "
    "primitive with its non-increasing gain curve under the oracle "
    "gate.",
    tags=("sampling", "curation", "extension"),
)
def x_greedy_coverage(spark, sf_dir):
    from ..lineage import lineage_cut

    docs = load(spark, sf_dir, "documents")
    b = (
        docs.select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
                )
            ).alias("bg"),
        )
        .distinct()
        .transform(lineage_cut_lazy)  # K gain passes + covered updates
    )
    vocab = b.select("bg").distinct().count()
    covered = None
    picked: list[int] = []
    out_rows = []
    cum = 0
    for k in range(1, GREEDY_K + 1):
        cand = b.filter(~F.col("doc_id").isin(picked)) if picked else b
        fresh = (
            cand.join(covered, "bg", "left_anti") if covered is not None else cand
        )
        gains = fresh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
        top = gains.orderBy(F.col("gain").desc(), "doc_id").limit(1).collect()[0]
        picked.append(int(top["doc_id"]))
        new_cov = b.filter(F.col("doc_id") == int(top["doc_id"])).select("bg")
        covered = (
            new_cov if covered is None else covered.unionByName(new_cov).distinct()
        ).transform(lineage_cut)
        cum = covered.count()
        out_rows.append((k, int(top["doc_id"]), int(top["gain"]), cum, cum / vocab))
    return spark.createDataFrame(
        out_rows, "k int, doc_id long, gain long, cum_covered long, coverage_share double"
    )


SOURCE_CAP = 15      # max docs kept per source
SOURCE_CAP_SALTS = 8  # phase-1 prefilter fan-out per source


@register(
    "x_source_cap",
    # Per-source document cap (the CommonCrawl-pipeline staple: no
    # single domain may dominate the corpus — C4, Gopher and RefinedWeb
    # all cap per-domain document counts; here "keep the CAP
    # best-quality docs per source"). The SKEW problem at 100 TB: a
    # single hot source holds millions of docs, so one
    # Window.partitionBy(source) rank puts an entire domain in one
    # task. The scale-correct plan is TWO-PHASE top-N (the classic
    # distributed-heap trick): phase 1 ranks within (source, salt)
    # partitions — doc_id % NSALT splits a hot source across NSALT
    # tasks — and keeps each local top-CAP (any global top-CAP row is
    # necessarily in its salt's local top-CAP: a row beaten by >= CAP
    # rows in its own salt is beaten by >= CAP rows globally); phase 2
    # ranks the <= NSALT*CAP survivors per source. The quality order
    # chain (q DESC, doc_id) is unique, so both phases are
    # deterministic; q is the bit-identical Gopher/C4 composite
    # (operators/text.quality_score, SQL-mirrored term for term). The
    # oracle needs no salt: rank <= CAP per source is the semantics,
    # the salting is pure plan shape. Report grain: per source, kept /
    # dropped counts, the admission threshold (min kept quality), and
    # kept token volume.
    oracle=f"""
WITH q AS (
  SELECT doc_id, source,
         len(string_split(text, ' '))::BIGINT AS n_words,
         (CASE WHEN len(wlist) >= 20 AND len(wlist) <= 400 THEN 1.0 ELSE 0.0 END) * 0.4
         + least(len(list_filter(wlist, w -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is'], w)))::DOUBLE / len(wlist)::DOUBLE * 2.0, 1.0) * 0.4
         + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text)::DOUBLE * 10.0, 1.0)) * 0.2 AS q
  FROM (SELECT doc_id, source, text,
               string_split(lower(text), ' ') AS wlist
        FROM documents)
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY source ORDER BY q DESC, doc_id) AS rk
  FROM q
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN rk <= {SOURCE_CAP} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN rk > {SOURCE_CAP} THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       min(CASE WHEN rk <= {SOURCE_CAP} THEN q END) AS admission_threshold,
       sum(CASE WHEN rk <= {SOURCE_CAP} THEN n_words ELSE 0 END)::BIGINT
         AS kept_words
FROM ranked GROUP BY source ORDER BY source
""",
    doc="Per-source document cap (keep the CAP best-quality docs per "
    "source — the C4/Gopher/RefinedWeb domain-cap rule) via two-phase "
    "top-N: salted local ranks prefilter hot sources across tasks, "
    "then the bounded survivor set ranks per source. Reports kept/"
    "dropped counts, the admission quality threshold and kept token "
    "volume per source.",
    tags=("sampling", "curation", "extension"),
)
def x_source_cap(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..operators.text import quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    q = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        quality_score("w", F.col("text")).alias("q"),
    )
    # phase 1: salted local top-CAP (a row with >= CAP better rows in
    # its own salt has >= CAP better rows globally -> safe to drop)
    w_salt = W.partitionBy(
        "source", (F.col("doc_id") % SOURCE_CAP_SALTS)
    ).orderBy(F.col("q").desc(), "doc_id")
    local = q.withColumn("lrk", F.row_number().over(w_salt)).filter(
        F.col("lrk") <= SOURCE_CAP
    )
    # phase 2: exact rank over <= NSALT*CAP survivors per source
    w_src = W.partitionBy("source").orderBy(F.col("q").desc(), "doc_id")
    ranked = local.withColumn("rk", F.row_number().over(w_src))
    kept = ranked.filter(F.col("rk") <= SOURCE_CAP)
    per_kept = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("q").alias("admission_threshold"),
        F.sum("n_words").alias("kept_words"),
    )
    per_all = q.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        per_all.join(per_kept, "source")
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            "admission_threshold",
            "kept_words",
        )
        .orderBy("source")
    )
