"""K2 + J1 — CSR adjacency blocks and numpy gather-scatter kernels.

BASELINE.json:6: "Each superstep is a gather-scatter message exchange
expressed as grouped pandas/Arrow UDFs over edge partitions (no per-row
Python)". This module is that path:

  build:  edges hash-partitioned by src (part = pmod(xxhash64(src), P)) →
          ONE CSR block row per partition via applyInPandas:
          sorted unique sources, indptr, per-edge transition prob, and a
          partition-local destination dictionary (dst_uniq + dst_inv) so the
          kernel can combine messages per dst with a single bincount.
  step:   blocks cogroup state on part → numpy kernel emits PARTIAL
          aggregates per (partition, dst) — the map-side combine is explicit,
          so the shuffle carries O(distinct dst per partition) rows instead
          of O(edges) messages. One global agg by dst finishes the superstep.

Compared with the pure-DataFrame path (pagerank.py / lpa.py) this cuts
shuffle width on hub-heavy graphs at the cost of an Arrow hop per superstep;
bench.py measures both (SURVEY §4.3 "keep the faster as default").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize, vertices_of
from pcd_spark.graph.partition import default_num_parts, part_expr
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore

BLOCK_SCHEMA = (
    "part int, src array<long>, indptr array<long>, p array<double>, "
    "labels_src array<long>, dst_uniq array<long>, dst_inv array<int>"
)


def build_csr_blocks(
    edges: DataFrame,
    num_parts: int | None = None,
    weight_col: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """One CSR block per hash partition of the edge table.

    normalize=True stores per-edge transition prob w/out_strength(src)
    (PageRank); normalize=False stores raw weights (LPA ignores them).
    All out-edges of a src share its partition, so out-strength computed
    block-locally equals the global value.
    """
    p = num_parts or default_num_parts(edges)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        "src", "dst", w.alias("w"), part_expr("src", p).alias("part")
    )

    def make_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        wv = pdf["w"].to_numpy(np.float64)
        uniq_src, counts = np.unique(src, return_counts=True)
        indptr = np.concatenate([[0], np.cumsum(counts)])
        if normalize:
            out_s = np.repeat(np.add.reduceat(wv, indptr[:-1]), counts)
            pv = wv / out_s
        else:
            pv = wv
        dst_uniq, dst_inv = np.unique(dst, return_inverse=True)
        return pd.DataFrame(
            {
                "part": [int(pdf["part"].iloc[0])],
                "src": [uniq_src],
                "indptr": [indptr],
                "p": [pv],
                "labels_src": [np.repeat(uniq_src, counts)],  # per-edge src vid
                "dst_uniq": [dst_uniq],
                "dst_inv": [dst_inv.astype(np.int32)],
            }
        )

    blocks = e.groupBy("part").applyInPandas(make_block, BLOCK_SCHEMA)
    blocks = blocks.repartition(p, "part").persist()
    blocks.count()
    return blocks


# ---------------------------------------------------------------------------
# PageRank on CSR blocks
# ---------------------------------------------------------------------------

def pagerank_csr(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 200,
    weight_col: str | None = None,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Identical semantics to pagerank(); CSR-kernel execution path."""
    p = num_parts or default_num_parts(edges)
    verts = vertices_of(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("pagerank_csr: edge table is empty")

    blocks = build_csr_blocks(edges, p, weight_col, normalize=True)
    danglers = verts.join(
        edges.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
    )
    has_danglers = danglers.count() > 0

    teleport = (1.0 - damping) / n
    if has_danglers:
        init = (
            verts.join(danglers.select("vid", F.lit(True).alias("dang")), "vid", "left")
            .select(
                "vid",
                F.lit(1.0 / n).alias("rank"),
                F.coalesce("dang", F.lit(False)).alias("dang"),
                F.lit(1.0).alias("_delta"),
            )
        )
    else:
        init = verts.select(
            "vid", F.lit(1.0 / n).alias("rank"), F.lit(1.0).alias("_delta")
        )
    extras: dict = {}

    def kernel(key, block_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if block_pdf.empty or state_pdf.empty:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"),
                                 "partial": pd.Series(dtype="float64")})
        b = block_pdf.iloc[0]
        ranks = pd.Series(
            state_pdf["rank"].to_numpy(np.float64),
            index=state_pdf["vid"].to_numpy(np.int64),
        )
        src = np.asarray(b["src"], dtype=np.int64)
        indptr = np.asarray(b["indptr"], dtype=np.int64)
        pv = np.asarray(b["p"], dtype=np.float64)
        dst_uniq = np.asarray(b["dst_uniq"], dtype=np.int64)
        dst_inv = np.asarray(b["dst_inv"], dtype=np.int64)
        counts = np.diff(indptr)
        r_src = ranks.reindex(src).fillna(0.0).to_numpy()
        contrib = np.repeat(r_src, counts) * pv
        partial = np.bincount(dst_inv, weights=contrib, minlength=len(dst_uniq))
        return pd.DataFrame({"dst": dst_uniq, "partial": partial})

    def step(state: DataFrame, _i: int) -> DataFrame:
        st = state.select("vid", "rank").withColumn("part", part_expr("vid", p))
        partials = (
            blocks.groupBy("part")
            .cogroup(st.groupBy("part"))
            .applyInPandas(kernel, "dst long, partial double")
        )
        contribs = (
            partials.repartition(p, "dst")
            .groupBy("dst").agg(F.sum("partial").alias("contrib"))
            .withColumnRenamed("dst", "vid")
        )
        keep = ["vid", F.col("rank").alias("old")] + (
            ["dang"] if has_danglers else []
        )
        base = state.select(*keep).join(
            contribs.hint("shuffle_hash"), "vid", "left"
        )
        extra = (
            F.lit(float(extras.get("dmass") or 0.0) / n)
            if has_danglers
            else F.lit(0.0)
        )
        new_rank = F.lit(teleport) + F.lit(damping) * (
            F.coalesce("contrib", F.lit(0.0)) + extra
        )
        out_cols = [
            F.col("vid"),
            new_rank.alias("rank"),
            F.abs(new_rank - F.col("old")).alias("_delta"),
        ]
        if has_danglers:
            out_cols.insert(2, F.col("dang"))
        return base.select(*out_cols)

    def resume_fix(state: DataFrame) -> DataFrame:
        # pre-'dang' checkpoint compatibility — same as pagerank.resume_fix
        if has_danglers and "dang" not in state.columns:
            state = state.join(
                danglers.select("vid", F.lit(True).alias("dang")), "vid", "left"
            ).select(
                "vid", "rank", F.coalesce("dang", F.lit(False)).alias("dang"),
                "_delta",
            )
        return state

    _secs: list[float] = []
    extra_aggs = (
        {"dmass": F.sum(F.when(F.col("dang"), F.col("rank")).otherwise(F.lit(0.0)))}
        if has_danglers
        else None
    )
    final, iters, metrics = run_supersteps(
        init, step, tol=tol, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, step_secs=_secs,
        extra_aggs=extra_aggs, extras_out=extras, resume_fix=resume_fix,
        disable_aqe=True,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
        stats_out["step_secs"] = _secs
    out = final.select("vid", "rank")
    blocks.unpersist()
    verts.unpersist()
    return out


# ---------------------------------------------------------------------------
# LPA on CSR blocks
# ---------------------------------------------------------------------------

def label_propagation_csr(
    edges: DataFrame,
    max_iter: int = 30,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    stats_out: dict | None = None,
) -> DataFrame:
    """Identical semantics to label_propagation(); CSR-kernel path.
    Kernel emits per-partition (dst, label, cnt) partial histograms — the
    explicit map-side combine for hub vertices (salting made structural)."""
    from pcd_spark.graph.lpa import _ENC_LIMIT, argmax_label, argmax_label_encoded

    p = num_parts or default_num_parts(edges)
    sym = symmetrize(edges)
    blocks = build_csr_blocks(sym, p, weight_col=None, normalize=False)
    verts = vertices_of(sym).persist()

    # offset-encoded bounds: labels are vertex ids, which are SIGNED on the
    # prod xxhash64 path — same guard/offset as label_propagation()
    bounds = verts.agg(F.min("vid").alias("lo"), F.max("vid").alias("hi")).first()
    min_vid = int(bounds["lo"] or 0)
    enc_k = int(bounds["hi"] or 0) - min_vid + 1
    dmax_row = (
        sym.groupBy("dst").agg(F.count("*").alias("d")).agg(F.max("d").alias("m")).first()
    )
    use_encoded = enc_k > 0 and (int(dmax_row["m"] or 1) + 1) * enc_k < _ENC_LIMIT

    init = verts.select(
        "vid", F.col("vid").alias("label"), F.lit(1.0).alias("_delta")
    )

    def kernel(key, block_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if block_pdf.empty or state_pdf.empty:
            return pd.DataFrame(
                {"dst": pd.Series(dtype="int64"),
                 "label": pd.Series(dtype="int64"),
                 "cnt": pd.Series(dtype="int64")}
            )
        b = block_pdf.iloc[0]
        labels = pd.Series(
            state_pdf["label"].to_numpy(np.int64),
            index=state_pdf["vid"].to_numpy(np.int64),
        )
        edge_src = np.asarray(b["labels_src"], dtype=np.int64)
        dst_uniq = np.asarray(b["dst_uniq"], dtype=np.int64)
        dst_inv = np.asarray(b["dst_inv"], dtype=np.int64)
        lab = labels.reindex(edge_src).to_numpy(np.int64)
        # per-partition histogram of (dst, label)
        key2 = np.stack([dst_inv, lab], axis=1)
        uniq, cnt = np.unique(key2, axis=0, return_counts=True)
        return pd.DataFrame(
            {"dst": dst_uniq[uniq[:, 0]], "label": uniq[:, 1], "cnt": cnt}
        )

    def step(state: DataFrame, _i: int) -> DataFrame:
        st = state.select("vid", "label").withColumn("part", part_expr("vid", p))
        partials = (
            blocks.groupBy("part")
            .cogroup(st.groupBy("part"))
            .applyInPandas(kernel, "dst long, label long, cnt long")
        )
        # one wide shuffle on dst; the (dst,label) sum and the per-dst argmax
        # both run partition-locally (HashPartitioning(dst) satisfies both)
        counts = (
            partials.repartition(p, "dst")
            .groupBy("dst", "label")
            .agg(F.sum("cnt").alias("cnt"))
            .withColumnRenamed("dst", "vid")
        )
        best = (
            argmax_label_encoded(counts, enc_k, min_vid)
            if use_encoded
            else argmax_label(counts)
        )
        new_label = F.coalesce("new_label", "label")
        return (
            state.select("vid", "label")
            .join(best.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                new_label.alias("label"),
                (new_label != F.col("label")).cast("double").alias("_delta"),
            )
        )

    _secs: list[float] = []
    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, step_secs=_secs,
        disable_aqe=True,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
        stats_out["step_secs"] = _secs
    out = final.select("vid", "label")
    blocks.unpersist()
    verts.unpersist()
    return out
