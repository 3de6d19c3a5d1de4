"""Mathematical invariants of the r5 statistics/eval operators.

The oracle hash gate proves cross-engine equality; these pin the
MATH — bounds and identities that hold for any input — so a future
refactor that stays self-consistent across engines but breaks the
statistic itself still fails fast.
"""

from __future__ import annotations

import math

from ast_data_pipeline_spark.registry import load_all


def _run(spark, sf_dir, name):
    return load_all()[name].fn(spark, sf_dir).toPandas()


def test_ks_statistic_in_unit_interval(spark, sf_dir):
    row = _run(spark, sf_dir, "a_ks_two_sample").iloc[0]
    assert 0.0 <= row.ks_d <= 1.0
    assert row.n_a > 0 and row.n_b > 0


def test_gini_in_unit_interval(spark, sf_dir):
    row = _run(spark, sf_dir, "x_gini_source_concentration").iloc[0]
    # 20 near-equal sources -> small but non-negative concentration
    assert 0.0 <= row.gini < 1.0


def test_recall_bounds_and_monotonicity(spark, sf_dir):
    df = _run(spark, sf_dir, "x_ann_recall_eval")
    assert ((df.recall >= 0) & (df.recall <= 1)).all()
    assert (df.n_hits <= df.n_truth).all()
    assert (df.n_hits <= df.n_retrieved.clip(lower=0) + 0).all() or True
    assert (df.n_hits <= df.n_retrieved).all()


def test_mixture_temperature_is_distribution(spark, sf_dir):
    df = _run(spark, sf_dir, "x_mixture_temperature")
    assert (df.weight > 0).all()
    # the normalizer goes through dsum's 4-dp decimal rounding on a
    # sum of ~2.45, so the weight total is 1.0 to ~2e-5, not 1e-9
    assert math.isclose(df.weight.sum(), 1.0, rel_tol=1e-4)
    # temperature < 1 compresses the range vs raw shares
    raw = df.mass / df.mass.sum()
    assert df.weight.max() - df.weight.min() <= raw.max() - raw.min() + 1e-12


def test_entropy_bounds(spark, sf_dir):
    df = _run(spark, sf_dir, "x_char_entropy")
    assert (df.entropy_bits >= 0).all()
    # bounded by log2(alphabet); the corpus is ASCII-ish
    assert (df.entropy_bits <= 8.0).all()


def test_corr_matrix_bounds_and_symmetric_inputs(spark, sf_dir):
    df = _run(spark, sf_dir, "a_corr_matrix")
    assert len(df) == 6
    c = df["corr"]  # attribute access collides with DataFrame.corr
    assert ((c >= -1.0 - 1e-9) & (c <= 1.0 + 1e-9)).all()


def test_benford_fractions_sum_to_one(spark, sf_dir):
    df = _run(spark, sf_dir, "a_benford_digits")
    assert math.isclose(df.obs_frac.sum(), 1.0, rel_tol=1e-9)
    assert (df.chi2_total >= 0).all()
    assert df.chi2_total.nunique() == 1


def test_mad_and_iqr_fences_ordered(spark, sf_dir):
    mad = _run(spark, sf_dir, "a_mad_robust_z")
    assert (mad["mad"] >= 0).all()
    assert (mad.n_anomalies <= mad.n_total).all()
    iqr = _run(spark, sf_dir, "a_iqr_outliers")
    assert (iqr.lo_fence <= iqr.p25).all()
    assert (iqr.p25 <= iqr.p75).all()
    assert (iqr.p75 <= iqr.hi_fence).all()


def test_ohlc_high_low_envelope(spark, sf_dir):
    df = _run(spark, sf_dir, "t_downsample_ohlc")
    assert (df.low <= df.high).all()
    assert ((df.open >= df.low) & (df.open <= df.high)).all()
    assert ((df.close >= df.low) & (df.close <= df.high)).all()
    # streaming twin must agree row-for-row
    st = _run(spark, sf_dir, "s_stream_ohlc")
    key = ["user_id", "day"]
    a = df.sort_values(key).reset_index(drop=True)
    b = st.sort_values(key).reset_index(drop=True)[a.columns]
    assert a.equals(b)


def test_interval_union_vs_brute_force(spark, sf_dir):
    import duckdb

    df = _run(spark, sf_dir, "t_interval_union_length")
    con = duckdb.connect()
    brute = con.execute(f"""
        WITH iv AS (
          SELECT user_id, floor(epoch(ts))::BIGINT AS s
          FROM '{sf_dir}/events.parquet'
        ),
        secs AS (
          SELECT DISTINCT user_id, s + o AS sec
          FROM iv, unnest(range(0, 1800)) t(o)
        )
        SELECT user_id, count(*)::BIGINT AS covered
        FROM secs GROUP BY user_id
    """).df()
    m = df.merge(brute, on="user_id")
    assert len(m) == len(df)
    assert (m.covered_seconds == m.covered).all()


def test_power_iteration_unit_norm_and_positive_scale(spark, sf_dir):
    from ast_data_pipeline_spark.registry import load_all

    pc = load_all()["x_power_iteration_pc1"].fn(spark, sf_dir).toPandas()
    assert len(pc) == 64
    assert abs((pc.loading ** 2).sum() - 1.0) < 1e-9  # unit eigenvector
    assert (pc.sigma > 0).all()
    # iterating must not diverge: sigma (||X'Xv|| for unit v) is
    # bounded by the largest eigenvalue of X'X <= trace = total sum of
    # squared entries
    from pyspark.sql import functions as F

    from ast_data_pipeline_spark.sources.catalog import load

    trace = (
        load(spark, sf_dir, "embeddings")
        .select(
            F.aggregate(
                F.expr("transform(embedding, x -> cast(x as double))"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            ).alias("sq")
        )
        .agg(F.sum("sq"))
        .collect()[0][0]
    )
    assert 0 < pc.sigma.iloc[0] <= trace


def test_kneser_ney_beats_addone_with_unseen_mass(spark, tmp_path):
    """The synthetic corpus's train half covers every eval bigram, so
    x_lm_kneser_ney honestly reports a hair of discounting cost there.
    This pins the textbook property on a corpus WITH unseen mass: a
    train half with a rich bigram inventory and an eval half whose
    bigrams are plausible-but-unseen recombinations must score better
    under interpolated KN than under add-one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 200-word vocab: add-one's +V smoothing tax on SEEN bigrams is
    # what KN's absolute discount avoids — a tiny vocab hides the
    # effect entirely (first attempt with 12 words had add-one win)
    words = [f"w{i}" for i in range(200)]
    train_rows = []
    # train: chain bigrams (w_i, w_{i+1 mod 200}), repeated
    for rep in range(3):
        for i in range(200):
            train_rows.append(" ".join([words[i], words[(i + 1) % 200]] * 3))
    # eval: half seen chains (token mass where add-one pays the +V
    # tax), half skip-one recombinations (unseen bigrams exercising
    # the continuation backoff / max(c-d, 0) = 0 branch)
    eval_rows = [
        " ".join([words[i], words[(i + 1) % 200]] * 3) for i in range(100)
    ] + [" ".join([words[i], words[(i + 2) % 200]] * 3) for i in range(100)]
    texts = train_rows + eval_rows
    # doc ids chosen so the md5 gate puts train_rows in train ('< cc')
    # and eval_rows in eval: brute-force ids per side
    import hashlib

    def gate(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:2] < "cc"

    train_ids = [i for i in range(10000) if gate(i)][: len(train_rows)]
    eval_ids = [i for i in range(10000) if not gate(i)][: len(eval_rows)]
    ids = train_ids + eval_ids
    d = tmp_path / "kn"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(["s"] * len(ids)),
                "lang": pa.array(["en"] * len(ids)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "documents.parquet"),
    )
    from ast_data_pipeline_spark.registry import load_all

    out = load_all()["x_lm_kneser_ney"].fn(spark, str(d)).toPandas()
    assert int(out.n_unseen_bigrams.iloc[0]) > 0, "constructed unseen mass missing"
    # measured ~0.146 bits on this construction; pin the sign with margin
    assert float(out.kn_advantage_bits.iloc[0]) > 0.1, out.to_dict()


def test_welch_df_bounds(spark, sf_dir):
    """Welch-Satterthwaite df lies in [min(n1,n2)-1, n1+n2-2]."""
    from ast_data_pipeline_spark.registry import load_all

    for r in load_all()["a_welch_ttest"].fn(spark, sf_dir).collect():
        lo = min(r.n_weekend, r.n_weekday) - 1
        hi = r.n_weekend + r.n_weekday - 2
        assert lo <= r.welch_df <= hi, (r.event_type, r.welch_df, lo, hi)


def test_mannwhitney_u_bounds(spark, sf_dir):
    """U in [0, n1*n2]; with average ranks U is a multiple of 0.5."""
    from ast_data_pipeline_spark.registry import load_all

    for r in load_all()["a_mannwhitney_u"].fn(spark, sf_dir).collect():
        assert 0 <= r.u_stat <= r.n_weekend * r.n_weekday
        assert (r.u_stat * 2) == int(r.u_stat * 2)


def test_acf_bounds(spark, sf_dir):
    """|acf| <= 1 at every lag (Cauchy-Schwarz)."""
    from ast_data_pipeline_spark.registry import load_all

    rows = load_all()["t_autocorrelation"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.acf is not None:
            assert -1.0 <= r.acf <= 1.0, (r.event_type, r.lag, r.acf)


def test_kappa_bounds_and_po_pe(spark, sf_dir):
    """kappa <= 1, po/pe are probabilities, kappa formula consistent."""
    from ast_data_pipeline_spark.registry import load_all

    (r,) = load_all()["a_cohens_kappa"].fn(spark, sf_dir).collect()
    assert 0.0 <= r.po <= 1.0 and 0.0 < r.pe < 1.0
    assert r.kappa <= 1.0
    assert abs(r.kappa - (r.po - r.pe) / (1 - r.pe)) < 1e-12


def test_greedy_coverage_gains_non_increasing(spark, sf_dir):
    """Submodularity: marginal gains never increase; cumulative
    coverage equals the gain prefix sum (picks never overlap)."""
    from ast_data_pipeline_spark.registry import load_all

    rows = sorted(
        load_all()["x_greedy_coverage"].fn(spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    gains = [r.gain for r in rows]
    assert gains == sorted(gains, reverse=True), gains
    assert rows[-1].cum_covered == sum(gains)
    assert 0 < rows[-1].coverage_share <= 1.0


def test_theil_additivity_residual_tiny(spark, sf_dir):
    """Theil decomposition: residual bounded by ln quantization."""
    from ast_data_pipeline_spark.registry import load_all

    (r,) = load_all()["a_theil_decomposition"].fn(spark, sf_dir).collect()
    assert r.t_total >= 0 and r.t_within >= 0
    assert abs(r.additivity_residual) < 1e-6
