"""X29 chunking, X30 semantic decontamination, V16 k-center coreset.

DuckDB hash parity is covered by test_relational_parity (they are
SQL-oracled registry entries); these tests pin the SEMANTICS against
independent numpy/pure-Python mirrors and structural laws.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pcd_spark.relational import REGISTRY
from pcd_spark.relational.queries import load
from pcd_spark.relational.textops import (
    _CHUNK_S,
    _CHUNK_W,
    _DECON_BENCH,
    _DECON_TAU,
    _KCENTER_K,
)


# ------------------------------------------------------------------- x29


def test_x29_chunks_reconstruct_documents(spark, sf_dir):
    """De-overlapped chunk concatenation must reproduce every document's
    token stream exactly (stride < window => full coverage, and the law
    n<=w -> 1 chunk else ceil((n-w)/s)+1 leaves no gap and no missing
    tail)."""
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    out = REGISTRY["x29_chunk_documents"]["spark"](spark, sf_dir).collect()
    seen: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        toks = docs[r["doc_id"]]
        start = r["chunk_id"] * _CHUNK_S
        ctoks = toks[start : start + _CHUNK_W]
        assert r["n_tokens"] == len(ctoks)
        import hashlib

        assert r["chunk_md5"] == hashlib.md5(" ".join(ctoks).encode()).hexdigest()
        seen.setdefault(r["doc_id"], []).append(r["chunk_id"])
    for doc_id, toks in docs.items():
        n = len(toks)
        exp = 1 if n <= _CHUNK_W else math.ceil((n - _CHUNK_W) / _CHUNK_S) + 1
        assert sorted(seen[doc_id]) == list(range(exp)), doc_id


# ------------------------------------------------------------------- x30


def test_x30_matches_numpy_max_cosine(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    M = np.array([r["embedding"] for r in emb], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    bench = M[ids < _DECON_BENCH]
    corpus_ids = ids[ids >= _DECON_BENCH]
    corpus = M[ids >= _DECON_BENCH]
    sims = np.round(corpus @ bench.T, 6).max(axis=1)
    exp = dict(zip(corpus_ids.tolist(), sims.tolist()))

    out = REGISTRY["x30_semantic_decontamination"]["spark"](spark, sf_dir).collect()
    assert len(out) == len(exp)
    for r in out:
        assert r["max_cos"] == pytest.approx(exp[r["vec_id"]], abs=2e-6)
        assert r["contaminated"] == int(r["max_cos"] >= _DECON_TAU)
    assert any(r["contaminated"] for r in out), "threshold should flag someone"


# ------------------------------------------------------------------- v16


def _kcenter_numpy(ids, M, k):
    """Independent greedy k-center: same rounded-distance + min-id
    tie-break contract."""
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    centers = [(1, int(ids[0]), 0.0)]
    md = np.round(np.linalg.norm(M - M[0], axis=1), 6)
    for i in range(2, k + 1):
        best = np.lexsort((ids, -md))[0]
        centers.append((i, int(ids[best]), float(md[best])))
        if i < k:
            md = np.minimum(md, np.round(np.linalg.norm(M - M[best], axis=1), 6))
    return centers


def test_v16_matches_numpy_greedy(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    M = np.array([r["embedding"] for r in emb], dtype=np.float64)
    exp = _kcenter_numpy(ids, M, _KCENTER_K)
    got = [
        (r["sel_rank"], r["vec_id"], r["sel_dist"])
        for r in REGISTRY["v16_kcenter_coreset"]["spark"](spark, sf_dir)
        .orderBy("sel_rank")
        .collect()
    ]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp]
    for g, e in zip(got, exp):
        assert g[2] == pytest.approx(e[2], abs=2e-6)


def test_v16_radii_monotone_nonincreasing(spark, sf_dir):
    got = (
        REGISTRY["v16_kcenter_coreset"]["spark"](spark, sf_dir)
        .orderBy("sel_rank")
        .collect()
    )
    dists = [r["sel_dist"] for r in got[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert len({r["vec_id"] for r in got}) == _KCENTER_K


# ------------------------------------------------------------------- x31


def test_x31_consistent_with_x4_truth_and_bounds(spark, sf_dir):
    """n_true must equal x4's pair count at the same sf (same slice, same
    threshold, same shingles — x31's truth arm IS x4); hit <= min(cand,
    true); ratios in [0,1] and equal to their integer quotients."""
    row = REGISTRY["x31_lsh_calibration"]["spark"](spark, sf_dir).collect()[0]
    x4_n = REGISTRY["x4_ngram_jaccard_pairs"]["spark"](spark, sf_dir).count()
    assert row["n_true"] == x4_n
    assert row["n_hit"] <= min(row["n_cand"], row["n_true"])
    if row["n_cand"]:
        assert row["precision_lsh"] == pytest.approx(
            round(row["n_hit"] / row["n_cand"], 6)
        )
    if row["n_true"]:
        assert row["recall_lsh"] == pytest.approx(
            round(row["n_hit"] / row["n_true"], 6)
        )


# ------------------------------------------------------------------- x32


def test_x32_matches_pure_python_hash_rank_and_binds(spark, sf_dir):
    import hashlib

    from pcd_spark.relational.textops import _SOURCE_CAP

    docs = load(spark, sf_dir, "documents").select("doc_id", "source").collect()
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    exp = {}
    binds = False
    for src, ids in by_src.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        if len(ranked) > _SOURCE_CAP:
            binds = True
        for rank, doc in enumerate(ranked[:_SOURCE_CAP], start=1):
            exp[(doc, src)] = rank
    got = {
        (r["doc_id"], r["source"]): r["src_rank"]
        for r in REGISTRY["x32_source_caps"]["spark"](spark, sf_dir).collect()
    }
    assert got == exp
    assert binds, "cap must actually bind on the test corpus"
