"""Text-analysis operators for training-data pipelines (north-star
extension): language-ID heuristic, quality scoring, token counting,
document fingerprinting. All native column expressions — the hot path
stays inside whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "zh": ["de", "le", "shi", "wo", "zai", "you", "he"],
}

EN_STOPWORDS = STOPWORDS["en"]

BPE_ISH = r"\w+|[^\w\s]"  # word pieces + standalone punctuation


def _arr(vals: list[str]) -> str:
    return "array(" + ", ".join(f"'{v}'" for v in vals) + ")"


def _list_sql(vals: list[str]) -> str:
    return "[" + ", ".join(f"'{v}'" for v in vals) + "]"


def hit_ratio(words: str, vals: list[str]) -> Column:
    """Fraction of tokens (with multiplicity) in ``vals``."""
    return F.expr(
        f"size(filter({words}, w -> array_contains({_arr(vals)}, w)))"
    ).cast("double") / F.expr(f"size({words})").cast("double")


def hit_ratio_sql(words: str, vals: list[str]) -> str:
    return (
        f"len(list_filter({words}, w -> list_contains({_list_sql(vals)}, w)))::DOUBLE"
        f" / len({words})::DOUBLE"
    )


def punct_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double") / F.length(
        text
    ).cast("double")


def punct_ratio_sql(text: str) -> str:
    return (
        f"length(regexp_replace({text}, '[^.,;:!?]', '', 'g'))::DOUBLE"
        f" / length({text})::DOUBLE"
    )


def token_counts(text: Column) -> tuple[Column, Column]:
    ws = F.size(F.split(text, r"\s+"))
    bpe = F.regexp_count(text, F.lit(BPE_ISH))
    return ws, bpe


def winnow_fingerprint(words: str, k: int = 5) -> Column:
    """Document fingerprint: min md5 over word k-grams (the winnowing
    min-hash flavor of rolling-hash fingerprinting)."""
    joined = " || ' ' || ".join(f"{words}[i + {j}]" for j in range(k))
    return F.expr(
        f"array_min(transform(sequence(0, size({words}) - {k}), i -> md5({joined})))"
    )


def winnow_fingerprint_sql(words: str, k: int = 5) -> str:
    joined = " || ' ' || ".join(f"{words}[i + {j}]" for j in range(k))
    return (
        f"list_min(list_transform(generate_series(1, len({words}) - {k - 1}),"
        f" i -> md5({joined})))"
    )


# TRUE winnowing (Schleimer/Wilkerson/Aiken, MOSS): hash every word
# k-gram, then keep the MIN hash of every sliding window of ``win``
# consecutive k-gram hashes — the distinct selected set. Guarantee:
# any shared run of >= win + k - 1 words between two documents shares
# at least one selected fingerprint, while expected density stays
# 2/(win+1) — the local, position-robust dedup primitive a single
# whole-document min-hash (``winnow_fingerprint``) cannot provide.
# Two stages so the k-gram hash list is computed ONCE per doc (inlining
# it in the per-window lambda would re-hash the doc per window =
# O(n^2) md5 calls in both engines). Hashes are the first 8 md5 hex
# digits as BIGINT (engine-identical); the plain value min is
# deterministic because equal hashes select the same value. Pure
# expression code — per-row, no shuffle.


def gram_hashes(words: str, k: int = 4) -> Column:
    """BIGINT hash per overlapping word k-gram, in position order."""
    joined = " || ' ' || ".join(f"{words}[i + {j}]" for j in range(k))
    return F.expr(
        f"transform(sequence(0, size({words}) - {k}), "
        f"i -> cast(conv(substring(md5({joined}), 1, 8), 16, 10) as bigint))"
    )


def gram_hashes_sql(words: str, k: int = 4) -> str:
    joined = " || ' ' || ".join(f"{words}[i + {j}]" for j in range(k))
    return (
        f"list_transform(generate_series(1, len({words}) - {k - 1}), "
        f"i -> ('0x' || substr(md5({joined}), 1, 8))::BIGINT)"
    )


def winnow_from_hashes(hs: str, win: int = 4) -> Column:
    """Distinct window-min selection over a precomputed hash array."""
    return F.expr(
        f"array_distinct(transform(sequence(1, size({hs}) - {win - 1}), "
        f"j -> array_min(slice({hs}, j, {win}))))"
    )


def winnow_from_hashes_sql(hs: str, win: int = 4) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, len({hs}) - {win - 1}), "
        f"j -> list_min({hs}[j:j + {win - 1}])))"
    )


def quality_score(words: str, text: Column) -> Column:
    """The [0,1] Gopher/C4-style quality score used by x_text_quality:
    0.4*length-in-range + 0.4*capped stopword signal + 0.2*inverse
    punctuation density. ``words`` is the name of a lowercased
    space-split token array column. Expression order matches
    ``quality_score_sql`` term for term, so the double is bit-identical
    across engines."""
    n_tok = F.expr(f"size({words})").cast("long")
    stop = hit_ratio(words, EN_STOPWORDS)
    punct = punct_ratio(text)
    length_ok = F.when((n_tok >= 20) & (n_tok <= 400), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        length_ok * 0.4
        + F.least(stop * 2.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct * 10.0, F.lit(1.0))) * 0.2
    )


def quality_score_sql(words: str, text: str) -> str:
    return (
        f"(CASE WHEN len({words}) >= 20 AND len({words}) <= 400 THEN 1.0 ELSE 0.0 END) * 0.4\n"
        f"         + least({hit_ratio_sql(words, EN_STOPWORDS)} * 2.0, 1.0) * 0.4\n"
        f"         + (1.0 - least({punct_ratio_sql(text)} * 10.0, 1.0)) * 0.2"
    )


def char_entropy_frame(docs) -> "DataFrame":  # noqa: F821
    """(doc_id, entropy_bits): Shannon entropy of each doc's character
    distribution. p_c is an exact integer division; log2 (1-ulp
    engine-divergent) is quantized at 7 dp per distinct (doc, char)
    level before the exact-decimal sum — see x_char_entropy."""
    from ..functions.exact import dsum

    ch = docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("c"))
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("doc_id").agg(F.sum("n").alias("len"))
    p = F.col("n").cast("double") / F.col("len")
    term = cnt.join(tot, "doc_id").select(
        "doc_id",
        (p * F.format_string("%.7f", F.log2(p)).cast("double")).alias("t"),
    )
    return term.groupBy("doc_id").agg((-dsum("t")).alias("entropy_bits"))


CHAR_ENTROPY_CTES = """ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
ccnt AS (SELECT doc_id, c, count(*)::BIGINT AS n FROM ch GROUP BY 1, 2),
ctot AS (SELECT doc_id, sum(n)::BIGINT AS len FROM ccnt GROUP BY 1),
cterm AS (
  SELECT ccnt.doc_id,
         (ccnt.n::DOUBLE / ctot.len)
           * printf('%.7f', log2(ccnt.n::DOUBLE / ctot.len))::DOUBLE AS t
  FROM ccnt JOIN ctot ON ccnt.doc_id = ctot.doc_id
),
ent AS (
  SELECT doc_id,
         -(round(sum((t)::DECIMAL(30,10)), 4)::DOUBLE) AS entropy_bits
  FROM cterm GROUP BY doc_id
)"""


def aho_corasick_build(keywords: list[str]) -> list[tuple[dict, int | None, int]]:
    """Build an Aho-Corasick automaton (public algorithm, CACM 1975):
    list of nodes ``(goto: {ch: state}, fail: state, out: bitmask of
    keyword indexes ending here)``. Pure Python + tiny — the automaton
    is O(sum of keyword lengths) regardless of corpus size, so it
    broadcasts to every executor inside the mapInPandas closure and
    tags k keywords in ONE text pass (vs k per-keyword scans)."""
    goto: list[dict] = [{}]
    out: list[int] = [0]
    for ki, kw in enumerate(keywords):
        s = 0
        for ch in kw:
            s_next = goto[s].get(ch)
            if s_next is None:
                goto.append({})
                out.append(0)
                s_next = len(goto) - 1
                goto[s][ch] = s_next
            s = s_next
        out[s] |= 1 << ki
    fail = [0] * len(goto)
    from collections import deque

    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            # textbook construction: fail links always land on strictly
            # shallower nodes, so goto[f][ch] can never be t itself —
            # no self-link guard needed (ADVICE r8)
            fail[t] = goto[f].get(ch, 0)
            out[t] |= out[fail[t]]
    return list(zip(goto, fail, out))


def aho_corasick_count(text: str, automaton, n_keywords: int) -> list[int]:
    """All-occurrence match counts per keyword in one pass."""
    counts = [0] * n_keywords
    s = 0
    for ch in text:
        node = automaton[s]
        while s and ch not in node[0]:
            s = node[1]
            node = automaton[s]
        s = node[0].get(ch, 0)
        o = automaton[s][2]
        while o:
            low = o & -o
            counts[low.bit_length() - 1] += 1
            o ^= low
    return counts
