"""JVM-free property tests for the continuation-VI..X integer kernels:
the winnowing detection guarantee, BM25 monotonicity and int64 headroom
at 10^12-doc extremes, and the consistent-hash ring's movement bound.
(The Spark plumbing of each operator is pinned separately by its
DuckDB-checked registry entry; these pin the MATH.)"""

from __future__ import annotations

import hashlib
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators.order import (
    DELETE_MOD, RING_BITS, SHARDS_AFTER, SHARDS_BEFORE, _vnode_packed)
from log_collector_spark.textops.analysis import (
    BM25_B_MILLI, BM25_IDF_CAP, BM25_K1_MILLI)
from log_collector_spark.textops.dedup import WINNOW_K, WINNOW_W


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_fps(tokens: list[str], k: int = WINNOW_K,
                w: int = WINNOW_W) -> set[int]:
    """The exact selection rule winnowing_pairs implements in Catalyst."""
    sh = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    hs = [_h60(s) for s in sh]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}


_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=4)


@given(shared=st.lists(_tok, min_size=WINNOW_W + WINNOW_K - 1,
                       max_size=WINNOW_W + WINNOW_K + 4),
       pre_a=st.lists(_tok, max_size=6), post_a=st.lists(_tok, max_size=6),
       pre_b=st.lists(_tok, max_size=6), post_b=st.lists(_tok, max_size=6))
@settings(max_examples=200, deadline=None)
def test_winnowing_guarantee_shared_run_shares_fingerprint(
        shared, pre_a, post_a, pre_b, post_b):
    # Schleimer et al. theorem: any shared run of >= w+k-1 tokens yields
    # at least one shared fingerprint — regardless of surrounding text
    a = _winnow_fps(pre_a + shared + post_a)
    b = _winnow_fps(pre_b + shared + post_b)
    assert a & b


def _bm25_term(n_docs: int, df: int, tf: int, dl: int, avgdl_milli: int):
    k1, b, cap = BM25_K1_MILLI, BM25_B_MILLI, BM25_IDF_CAP
    idf = min(cap, (n_docs - df + 1) * 1_000_000 // (df + 1))
    norm = (1000 - b) + b * dl * 1000 // avgdl_milli
    return idf * tf * (1000 + k1) // (tf * 1000 + k1 * norm // 1000)


@given(n_docs=st.integers(2, 10**12), tf=st.integers(1, 10**6),
       dl=st.integers(1, 10**9), avg=st.integers(1000, 10**12),
       df1=st.integers(1, 10**6))
@settings(max_examples=300, deadline=None)
def test_bm25_int64_headroom_and_df_monotonicity(n_docs, tf, dl, avg, df1):
    df1 = min(df1, n_docs)
    s1 = _bm25_term(n_docs, df1, tf, dl, avg)
    # every intermediate stays far inside int64 even at 10^12 docs
    assert 0 <= s1 < 2**63
    if df1 + 1 <= n_docs:
        s2 = _bm25_term(n_docs, df1 + 1, tf, dl, avg)
        assert s2 <= s1            # rarer term never scores lower


@given(tf=st.integers(1, 10**5))
@settings(max_examples=100, deadline=None)
def test_bm25_tf_saturates_monotonically(tf):
    lo = _bm25_term(10**6, 10, tf, 100, 100_000)
    hi = _bm25_term(10**6, 10, tf + 1, 100, 100_000)
    assert hi >= lo                # k1 saturation never inverts tf order


@given(key=st.integers(0, 2**60 - 1))
@settings(max_examples=300, deadline=None)
def test_ring_owner_stable_unless_new_shard_wins(key):
    # consistent hashing's defining property: adding a shard only ever
    # moves a key TO the new shard — owners among old shards never change
    ring = 1 << RING_BITS
    p = key >> 8

    def owner(vnodes):
        return min(((v // 32 - p) % ring) * 32 + v % 32
                   for v in vnodes) % 32

    before = owner(_vnode_packed(SHARDS_BEFORE))
    after = owner(_vnode_packed(SHARDS_AFTER))
    assert after == before or after == SHARDS_AFTER - 1


def test_delete_mod_is_five_percent():
    hits = sum(1 for k in range(20_000)
               if _h60(str(k)) % DELETE_MOD == 0)
    assert 800 <= hits <= 1200     # ~5% of 20k, md5-uniform
