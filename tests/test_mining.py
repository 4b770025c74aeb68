"""Corpus-structure mining ops: digit-mask template keys, Heaps-curve
first-occurrence accounting, and Markov modal-successor tie-breaks on tiny
crafted frames (the DuckDB oracle covers them end-to-end at sf0.01)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.textops import mining as mi


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_log_templates_masks_digits_and_counts(spark):
    df = _docs(spark, [
        "Error 123 at line 456 of worker 7 retrying now",   # 10 tokens
        "Error 999 at line 8 of worker 12 retrying later",  # same template
        "ok",                                               # short doc
        "   ",                                              # dropped
    ])
    rows = {r["template"]: r for r in mi.log_templates(df).collect()}
    assert len(rows) == 2
    t = rows["error 0 at line 0 of"]
    assert t["n_docs"] == 2 and t["n_tokens"] == 20
    assert rows["ok"]["n_docs"] == 1 and rows["ok"]["n_tokens"] == 1


def test_log_templates_order_and_topk(spark):
    df = _docs(spark, ["b b", "a a", "a a", "c c"])
    out = mi.log_templates(df, topk=2).collect()
    # n_docs DESC then template ASC; topk truncates
    assert [(r["template"], r["n_docs"]) for r in out] == [("a a", 2),
                                                           ("b b", 1)]


def test_vocab_growth_first_occurrence_only(spark):
    # doc 0: {a,b}; doc 1: {b,c}; doc 60: {c,d} -> bucket 0 has 3 new
    # tokens (a,b,c), bucket 50 has 1 (d); cum = 3, 4.
    df = spark.createDataFrame(
        [(0, "a b"), (1, "b c"), (60, "c d")], "doc_id long, text string")
    out = mi.vocab_growth(df, shingle_k=1).collect()
    assert [(r["bucket_start"], r["new_tokens"], r["vocab_cum"])
            for r in out] == [(0, 3, 3), (50, 1, 4)]


def test_vocab_growth_case_folds(spark):
    df = _docs(spark, ["Foo", "foo FOO"])
    out = mi.vocab_growth(df, shingle_k=1).collect()
    assert [(r["bucket_start"], r["vocab_cum"]) for r in out] == [(0, 1)]


def test_vocab_growth_shingle_unit(spark):
    # default unit is the word 3-gram: "a b c d" -> {"a b c", "b c d"};
    # doc 1 repeats one of them and adds one new; short docs contribute 0.
    df = _docs(spark, ["a b c d", "b c d e", "tiny"])
    out = mi.vocab_growth(df).collect()
    assert [(r["bucket_start"], r["new_tokens"], r["vocab_cum"])
            for r in out] == [(0, 3, 3)]


def test_markov_modal_tie_breaks_lexicographic(spark):
    # user 1: a->b, b->a, a->c ; user 2: a->c, c->a, a->b.
    # successors of 'a' across users: b,c,c,b -> 2-2 tie -> lexicographic.
    rows = [
        (1, 10, "a"), (1, 11, "b"), (1, 12, "a"), (1, 13, "c"),
        (2, 20, "a"), (2, 21, "c"), (2, 22, "a"), (2, 23, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string")
    out = {r["prev_type"]: r for r in mi.markov_next_event(df).collect()}
    # from 'a': successors b,c,c,b -> tie 2/2 -> lexicographic 'b'
    a = out["a"]
    assert (a["n_trans"], a["top_next"], a["top_n"]) == (4, "b", 2)
    assert a["hit_permille"] == 500
    # sequences never cross users: 'c' (user1 end) -> only user2's c->a
    assert (out["c"]["n_trans"], out["c"]["top_next"]) == (1, "a")


def test_markov_no_transitions_for_singleton_users(spark):
    df = spark.createDataFrame(
        [(1, 1, "x"), (2, 2, "y")],
        "user_id long, event_id long, event_type string")
    assert mi.markov_next_event(df).collect() == []
