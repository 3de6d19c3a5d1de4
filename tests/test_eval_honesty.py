"""Constructed-corpus discrimination tests for the honesty evals
(VERDICT r8 #9).

``x_vocab_coverage`` and ``x_langid_confusion`` honestly document their
degeneracies on the 31-word synthetic corpus (coverage saturates past
k=31; the stopword classifier is near-chance on word salad). These
tests pin the NON-degenerate case on corpora built to have structure —
the ``x_lm_kneser_ney`` pattern — so the evals are known to measure the
real thing, not just hash-match a degenerate table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_documents(tmp_path, texts, langs):
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "source": pa.array(["s"] * len(texts)),
                "lang": pa.array(langs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_vocab_coverage_curve_discriminates_on_zipf_corpus(spark, tmp_path):
    """On a Zipf corpus with >1000 distinct words the coverage curve
    must have real structure: strictly increasing in k, far from 0 at
    k=10 (the head carries mass) and strictly below 1 at k=1000 (the
    tail exists) — none of which the 31-word production corpus can
    show (it saturates at k>=31, as the query doc records)."""
    # word_i appears ~N/i times (Zipf); 1500 words so k=1000 < vocab
    words = [f"zipf{i:04d}" for i in range(1, 1501)]
    tokens = []
    for i, w in enumerate(words, start=1):
        tokens.extend([w] * (1500 // i + 1))
    # pack into docs of 50 tokens; interleave so frequency, not
    # position, drives the head
    docs = [" ".join(tokens[j : j + 50]) for j in range(0, len(tokens), 50)]
    sf = _write_documents(tmp_path, docs, ["en"] * len(docs))

    from ast_data_pipeline_spark.registry import load_all

    out = (
        load_all()["x_vocab_coverage"].fn(spark, sf).toPandas().set_index("k")
    )
    c10, c100, c1000 = (
        float(out.loc[k, "coverage_share"]) for k in (10, 100, 1000)
    )
    assert 0.2 < c10 < c100 < c1000 < 1.0, (c10, c100, c1000)
    assert int(out.loc[1000, "n_vocab_used"]) == 1000  # vocab NOT exhausted


def test_langid_confusion_diagonal_on_discriminative_corpus(spark, tmp_path):
    """On a corpus where each doc is dominated by stopwords UNIQUE to
    its labeled language, the confusion matrix must be diagonal-heavy
    (per-language recall >= 0.9) — the discriminative regime the
    word-salad production corpus cannot produce (near-chance, ties to
    the lexicographically first language, as the query doc records)."""
    # per-language stopwords that appear in NO other language's list
    unique = {
        "en": ["the", "and", "to", "is"],
        "es": ["que", "los"],
        "fr": ["et", "les", "des", "un"],
        "de": ["der", "die", "das", "und"],
        "zh": ["shi", "wo", "zai", "you"],
    }
    texts, langs = [], []
    for lang, sw in unique.items():
        for i in range(40):
            # 8 unique-stopword tokens + 2 neutral fillers per doc
            body = (sw * 8)[:8] + [f"noise{i}", "content"]
            texts.append(" ".join(body))
            langs.append(lang)
    sf = _write_documents(tmp_path, texts, langs)

    from ast_data_pipeline_spark.registry import load_all

    out = load_all()["x_langid_confusion"].fn(spark, sf).toPandas()
    recall = (
        out.groupby("actual_lang")["recall_contrib"].sum().to_dict()
    )
    assert set(recall) == set(unique)
    for lang, r in recall.items():
        assert r >= 0.9, (lang, r, out.to_dict())
