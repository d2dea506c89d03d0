"""Prefix-doubling suffix-class machinery (r14-staged; see
functions/suffixes.py) — verified against a pure-Python reference on
both handcrafted corpora and the documents fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoopwebgraph_spark.functions.suffixes import (
    duplicated_span_intervals,
    substring_classes,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_classes(texts, length):
    """substring -> set of (doc_id, pos) with that exact substring."""
    groups = {}
    for d, t in enumerate(texts):
        for p in range(len(t) - length + 1):
            groups.setdefault(t[p : p + length], set()).add((d, p))
    return groups


def _ref_intervals(texts, length):
    """Merged per-doc intervals covered by corpus-duplicated windows."""
    groups = _ref_classes(texts, length)
    starts = {}
    for sub, members in groups.items():
        if len(members) > 1:
            for d, p in members:
                starts.setdefault(d, set()).add(p)
    out = set()
    for d, ps in starts.items():
        cur_s = cur_e = None
        for p in sorted(ps):
            if cur_s is None or p > cur_e:
                if cur_s is not None:
                    out.add((d, cur_s, cur_e))
                cur_s, cur_e = p, p + length
            else:
                cur_e = p + length
        out.add((d, cur_s, cur_e))
    return out


CORPORA = [
    ["banana", "bandana"],
    ["aaaaaaa", "aa", "a"],
    ["abcdefgh", "xyzabcde", "qqqq"],
    ["the cat sat on the mat", "a cat sat", "the mat the cat"],
    ["", "ab", "ab"],
]


# lengths pick the three composition shapes: single round (pow2),
# composed non-pow2 (extra overlap join), exact-pow2 multi-round
@pytest.mark.parametrize("length", [2, 5, 8])
def test_substring_classes_match_reference(spark, length):
    texts = CORPORA[0] + CORPORA[2] + CORPORA[3]
    cls = substring_classes(_docs_df(spark, texts), length).collect()
    got = {}
    for r in cls:
        got.setdefault(r.cls, set()).add((r.doc_id, r.pos))
    ref = _ref_classes(texts, length)
    # same partition of positions into substring-equality classes
    assert sorted(map(sorted, got.values())) == sorted(
        map(sorted, ref.values())
    )
    # and every class member really has the same substring
    for members in got.values():
        subs = {texts[d][p : p + length] for d, p in members}
        assert len(subs) == 1


# with _SEED_POW=4 the 16-char seed covers every L<=32 without a real
# doubling round — these lengths force rounds k=4 (and k=5 at L=65) so
# the doubling path itself stays reference-verified
@pytest.mark.parametrize("length", [33, 40, 65])
def test_substring_classes_doubling_rounds(spark, length):
    base = (
        "the quick brown fox jumps over the lazy dog and then "
        "the quick brown fox jumps over the lazy dog again today"
    )
    texts = [base, base[7:] + " tail", base * 2, "short", base[:40]]
    cls = substring_classes(_docs_df(spark, texts), length).collect()
    got = {}
    for r in cls:
        got.setdefault(r.cls, set()).add((r.doc_id, r.pos))
    ref = _ref_classes(texts, length)
    # same partition of positions into substring-equality classes
    assert sorted(map(sorted, got.values())) == sorted(
        map(sorted, ref.values())
    )
    # and every class member really has the same substring
    for members in got.values():
        subs = {texts[d][p : p + length] for d, p in members}
        assert len(subs) == 1


@pytest.mark.parametrize(
    "corpus,length",
    [
        (CORPORA[0], 3),  # overlapping repeats (banana)
        (CORPORA[1], 2),  # run of one char: islands merge wall-to-wall
        (CORPORA[1], 4),  # window longer than some docs
        (CORPORA[2], 4),  # cross-doc repeat mid-string
        (CORPORA[3], 3),  # natural text, within- and cross-doc
        (CORPORA[4], 2),  # empty doc + identical docs
    ],
)
def test_duplicated_span_intervals_match_reference(spark, corpus, length):
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_span_intervals(
            _docs_df(spark, corpus), length
        ).collect()
    }
    assert got == _ref_intervals(corpus, length)


def test_spans_on_documents_fixture(spark, sf_small):
    """Fixture smoke at a q119-like threshold: spans exist, stay
    in-bounds, and every span's leading window really is duplicated."""
    from hadoopwebgraph_spark.catalog import load

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    L = 20
    spans = duplicated_span_intervals(docs, L)
    rows = spans.collect()
    assert rows, "vocabulary-generated fixture must contain duplicate spans"
    texts = {r.doc_id: r.text for r in docs.collect()}
    counts = {}
    for d, t in texts.items():
        for p in range(len(t) - L + 1):
            counts[t[p : p + L]] = counts.get(t[p : p + L], 0) + 1
    for r in rows:
        assert 0 <= r.span_start < r.span_end <= len(texts[r.doc_id])
        assert r.span_end - r.span_start >= L
        lead = texts[r.doc_id][r.span_start : r.span_start + L]
        assert counts[lead] > 1


def test_span_plan_has_no_single_partition(spark, sf_small):
    """Census pin (r14-ready): nothing corpus-scale funnels through one
    task — class ids come from groupBy representatives (never an ordered
    global rank) and the interval merge windows are per-document."""
    from hadoopwebgraph_spark.catalog import load

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    df = duplicated_span_intervals(docs, 8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan
    assert 'Window' in plan or 'window' in plan  # the per-doc island merge


def test_gpos_packing_violation_raises(spark):
    """A doc longer than the packing stride must fail loudly at
    execution, never silently merge classes (review r13)."""
    from hadoopwebgraph_spark.functions import suffixes as X

    long_doc = _docs_df(spark, ["abc"])  # pos=1 survives the window filter
    # shrink the stride instead of building a 16M-char fixture
    orig = X._DOC_STRIDE
    X._DOC_STRIDE = 1
    try:
        with pytest.raises(Exception, match="chunk long documents"):
            duplicated_span_intervals(long_doc, 2).collect()
    finally:
        X._DOC_STRIDE = orig


# ---------------------------------------------------------------------------
# The r13-staged dry-run pair was promoted verbatim to
# @register("q163_suffix_span_dedup") in round 14 — the registry entry
# is now the single source of truth, and the full-registry parity sweep
# (tests/test_oracle_parity.py) plus the driver's own t2 loop run it.
# ---------------------------------------------------------------------------


def test_q163_registered_pair_parity(spark, sf_small):
    from hadoopwebgraph_spark.registry import all_queries

    from tests.oracle_util import compare

    q = all_queries()["q163_suffix_span_dedup"]
    assert q.oracle is not None
    compare(spark, sf_small, q.name, q.fn, q.oracle)


# ---------------------------------------------------------------------------
# Multi-threshold spans off one build (r15-staged candidate) — the
# structure's differentiator over per-L gram hashing.
# ---------------------------------------------------------------------------


def test_multi_threshold_spans_match_reference(spark):
    from hadoopwebgraph_spark.functions.suffixes import (
        duplicated_span_intervals_multi,
    )

    texts = CORPORA[0] + CORPORA[2] + CORPORA[3]
    lengths = [2, 3, 5, 8]
    rows = duplicated_span_intervals_multi(
        _docs_df(spark, texts), lengths
    ).collect()
    got = {
        L: {(r.doc_id, r.span_start, r.span_end) for r in rows
            if r.span_len == L}
        for L in lengths
    }
    for L in lengths:
        assert got[L] == _ref_intervals(texts, L), L


def test_multi_threshold_matches_single_threshold(spark, sf_small):
    """The shared-build path must equal the per-L path row-for-row on
    the fixture (exact pow-of-two, composed, and doubling-round shapes
    in one call)."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.suffixes import (
        duplicated_span_intervals,
        duplicated_span_intervals_multi,
    )

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    lengths = [16, 20, 33]
    rows = duplicated_span_intervals_multi(docs, lengths).collect()
    for L in lengths:
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in rows
            if r.span_len == L
        }
        want = {
            (r.doc_id, r.span_start, r.span_end)
            for r in duplicated_span_intervals(docs, L).collect()
        }
        assert got == want, L


# r15 registration dry-run: three thresholds (exact-pow, composed, and
# composed-above-seed) off one build; the oracle unions the q163 shape
# per threshold.
_Q166_LENGTHS = (16, 20, 33)


def _q166_oracle() -> str:
    # built from the SAME generator as the registered q163 oracle
    # (review r14: a hand-kept copy would silently drift)
    from hadoopwebgraph_spark.functions.suffixes import span_oracle_sql

    return " UNION ALL ".join(
        span_oracle_sql(L, with_len=True) for L in _Q166_LENGTHS
    )


def _q166_spans_multi(spark, sf_dir):
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.suffixes import (
        duplicated_span_intervals_multi,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    df = duplicated_span_intervals_multi(docs, list(_Q166_LENGTHS))
    return df.select(
        "span_len",
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
    )


def test_q166_draft_oracle_parity(spark, sf_small):
    from tests.oracle_util import compare

    compare(spark, sf_small, "q166_draft", _q166_spans_multi, _q166_oracle())
