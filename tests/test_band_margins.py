"""Executable margin assertions for dataset-derived band-cut literals.

Three banding queries (a_cohens_kappa, a_mcnemar_test, a_fleiss_kappa)
classify documents with CUT LITERALS that were *measured against the
current synthetic corpus*: the cuts are placed inside inter-document
gaps so that engine-side quantization (the dsum 4-dp recipe, the %.7f
ln quantizer, plain IEEE wobble) can never flip a document across a
band boundary. Until r12 that placement was a comment
(``queries/aggregates.py`` FLEISS_E_LOW note); VERDICT r11 #3 asked
for the assumption to be EXECUTABLE — if TESTDATA generation ever
changes and a document lands inside a margin, this file fails loudly
instead of the oracle gate going silently fragile.

Margins asserted (per family, from the documented quantization):

- char entropy (FLEISS_E_LOW/MID): the engine's per-doc entropy is
  round4(true + eps_ln) — the dsum 4-dp final round dominates the
  wobble at 5e-5, the %.7f ln term quantizer adds <= 5e-8 — so
  engine-vs-numpy banding agreement needs |true - cut| > ~5e-5; the
  floor here is 6e-5 and the r12 cut placement measures >= 8.8e-5 in
  the union of all three corpora (tests/test_value_parity.py's
  unquantized numpy recompute relies on this).
- quality score (KAPPA_Q_LOW/MID) and top-word share (KAPPA_R_LOW/MID):
  pure rational arithmetic evaluated in doubles, wobble ~1e-12; a
  1e-6 margin keeps three decades of headroom while still detecting a
  regenerated corpus that collides with a cut.

Checked at every SF the gates touch: sf0.001 (value parity), sf0.01
(driver/oracle gate), sf0.1 (bench + sweep inputs).
"""

from __future__ import annotations

from collections import Counter

import math

import numpy as np
import pandas as pd
import pytest

from ast_data_pipeline_spark.queries.aggregates import (
    FLEISS_E_LOW,
    FLEISS_E_MID,
    KAPPA_Q_LOW,
    KAPPA_Q_MID,
    KAPPA_R_LOW,
    KAPPA_R_MID,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

STOP = {"the", "a", "of", "and", "to", "in", "is"}
PUNCT = set(".,;:!?")

# (metric computer, [cuts], required margin)
ENTROPY_MARGIN = 6e-5
RATIONAL_MARGIN = 1e-6


def _quality(text: str) -> float:
    w = text.lower().split(" ")
    nw = len(w)
    return (
        (1.0 if 20 <= nw <= 400 else 0.0) * 0.4
        + min(sum(1 for t in w if t in STOP) / nw * 2.0, 1.0) * 0.4
        + (1.0 - min(sum(1 for ch in text if ch in PUNCT) / len(text) * 10.0, 1.0)) * 0.2
    )


def _top_share(text: str) -> float:
    w = text.lower().split(" ")
    return Counter(w).most_common(1)[0][1] / len(w)


def _entropy(text: str) -> float:
    c = np.array(list(Counter(text).values()), dtype=float)
    p = c / c.sum()
    return float(-(p * np.log2(p)).sum())


@pytest.mark.parametrize("sf" , SF_DIRS, ids=[d.rsplit("/", 1)[1] for d in SF_DIRS])
@pytest.mark.parametrize(
    "metric,cuts,margin",
    [
        (_quality, (KAPPA_Q_LOW, KAPPA_Q_MID), RATIONAL_MARGIN),
        (_top_share, (KAPPA_R_LOW, KAPPA_R_MID), RATIONAL_MARGIN),
        (_entropy, (FLEISS_E_LOW, FLEISS_E_MID), ENTROPY_MARGIN),
    ],
    ids=["quality_score", "top_share", "char_entropy"],
)
def test_band_cut_margins(sf, metric, cuts, margin):
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    vals = docs.text.map(metric).to_numpy()
    for cut in cuts:
        gap = float(np.abs(vals - cut).min())
        assert gap > margin, (
            f"band cut {cut} for {metric.__name__} at {sf}: nearest doc "
            f"is {gap:.3e} away (< required margin {margin:.0e}) — the "
            "corpus has a document inside the quantization-safety gap; "
            "re-place the cut (see queries/aggregates.py band-cut notes)"
        )


def test_entropy_margin_dominates_quantizer():
    """The asserted entropy margin must stay above the engine's total
    per-doc wobble (dsum 4-dp round 5e-5 + ln %.7f terms 5e-8) — if
    someone tightens ENTROPY_MARGIN below that, the margin test would
    pass while engine-vs-numpy banding could still flip."""
    DSUM_ROUND_WOBBLE = 5e-5  # half of the 4-dp grid, functions/exact.py
    LN_TERM_WOBBLE = 5e-8     # %.7f quantizer, operators/text.py
    assert ENTROPY_MARGIN > DSUM_ROUND_WOBBLE + LN_TERM_WOBBLE
    assert math.isfinite(FLEISS_E_LOW) and FLEISS_E_LOW < FLEISS_E_MID
