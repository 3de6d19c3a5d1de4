"""Cross-query consistency: relationships that must hold BETWEEN
operators' outputs. Each query is individually oracle-proven; these
pin that the family tells one coherent story (a bug that shifts two
related queries in the same direction would slip past both oracles'
self-consistency but break these)."""

from __future__ import annotations

import pandas as pd

from ast_data_pipeline_spark.registry import load_all


def _run(spark, sf_dir, name):
    return load_all()[name].fn(spark, sf_dir).toPandas()


def test_nearest_is_at_least_as_close_as_backward(spark, sf_dir):
    near = _run(spark, sf_dir, "t_asof_nearest")
    back = _run(spark, sf_dir, "t_asof_join")
    m = near.merge(
        back[["event_id", "purchase_event_id"]], on="event_id", how="inner"
    )
    # wherever backward found a match, nearest must have one too
    has_back = m.purchase_event_id.notna()
    assert m.loc[has_back, "p_event_id"].notna().all()
    # the nearest |dt| can never exceed the backward gap, because the
    # backward match is one of nearest's two candidates
    import duckdb

    ev = duckdb.sql(
        f"SELECT event_id, epoch_us(ts) AS t_us FROM '{sf_dir}/events.parquet'"
    ).df()
    g = (
        m[has_back]
        .merge(ev.rename(columns={"event_id": "event_id", "t_us": "click_us"}), on="event_id")
        .merge(
            ev.rename(
                columns={"event_id": "purchase_event_id", "t_us": "purch_us"}
            ),
            on="purchase_event_id",
        )
    )
    back_gap = g.click_us - g.purch_us
    assert (back_gap >= 0).all()
    assert (g.dt_us.abs() <= back_gap).all()


def test_rolling_wau_bounds_dau(spark, sf_dir):
    df = _run(spark, sf_dir, "e_rolling_wau")
    assert (df.wau >= df.dau).all()
    assert ((df.dau_wau_ratio > 0) & (df.dau_wau_ratio <= 1)).all()


def test_kfold_census_covers_every_document(spark, sf_dir):
    folds = _run(spark, sf_dir, "x_kfold_assign")
    health = _run(spark, sf_dir, "x_corpus_health")
    assert folds.n_docs.sum() == health.n_docs.sum()
    assert folds.total_chars.sum() == health.total_chars.sum()
    assert set(folds.fold) == set(range(5))


def test_containment_at_least_jaccard_scale(spark, sf_dir):
    cont = _run(spark, sf_dir, "x_containment_neardup")
    # c/min(n_a,n_b) >= c/(n_a+n_b-c) always; sanity on real rows
    jac = cont.n_common / (cont.n_a + cont.n_b - cont.n_common)
    assert (cont.containment >= jac - 1e-12).all()


def test_peak_concurrency_bounded_by_opens(spark, sf_dir):
    pk = _run(spark, sf_dir, "t_peak_concurrency")
    # a day's peak cannot exceed total opens that day plus yesterday's
    # possible carry (30-min spans -> carry is bounded by yesterday's
    # opens); the loose but structural bound: peak <= cumulative opens
    pk = pk.sort_values("day").reset_index(drop=True)
    cum = pk.n_opens.cumsum()
    assert (pk.peak_concurrency <= cum).all()
    assert (pk.peak_concurrency >= 1).all()


def test_quality_sample_is_subset_with_matching_scores(spark, sf_dir):
    kept = _run(spark, sf_dir, "x_quality_weighted_sample")
    quality = _run(spark, sf_dir, "x_text_quality")
    m = kept.merge(quality[["doc_id", "quality_score"]], on="doc_id")
    assert len(m) == len(kept)
    assert (m.quality_score_x == m.quality_score_y).all()
    # acceptance coin < quality*256 by construction
    assert (m.hash_byte < (m.quality_score_x * 256)).all()


def test_dedup_survivors_one_per_cluster(spark, sf_dir):
    kb = _run(spark, sf_dir, "x_dedup_keep_best")
    per = kb.groupby("cluster_id")["keep"].sum()
    assert (per == 1).all()
    clusters = _run(spark, sf_dir, "x_dedup_clusters")
    assert set(kb.doc_id) == set(clusters.doc_id)


def test_transition_violation_totals_match_event_count(spark, sf_dir):
    tv = _run(spark, sf_dir, "e_transition_violations")
    import duckdb

    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    # one transition row per event (the first event's prev is NULL but
    # still emits a row)
    assert tv.n_transitions.sum() == n_events
    assert (tv.n_violations <= tv.n_transitions).all()
