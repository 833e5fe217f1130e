"""K5 — synchronous label propagation (SURVEY.md §2 K5; Raghavan et al. 2007).

Pinned deterministic rule (== pcd_spark.oracle.lpa_numpy, the test oracle):
  init label = vid; each superstep every vertex with >=1 neighbor takes the
  most frequent label among its neighbors' PREVIOUS labels, ties -> smallest
  label; isolated vertices keep theirs; stop on no change or max_iter.

Physical shape per superstep (ONE wide shuffle, all-JVM hash aggregation):

  gather: symmetrized edges (partitioned on src once, persisted) SHUFFLE_HASH-
  join labels -> messages (dst, label), 2|E| rows.

  scatter: messages are repartition(p, dst)-ed — the single wide shuffle —
  and because HashPartitioning(dst) satisfies the clustering requirement of
  BOTH downstream aggregations, the (dst,label) count AND the per-dst argmax
  run partition-locally in the same stage with zero further exchanges.

  argmax: the deterministic rule (max cnt, ties -> smallest label) is encoded
  as one max over a single long, score = cnt*K - label with K = max_vid+1,
  decoded via pmod — never min(struct(...)): struct aggregation buffers are
  not hash-agg-compatible, so that form silently degrades to SortAggregate
  and sorts the full 2|E| message stream twice per superstep (measured: this
  was the dominant LPA cost). Overflow guard: the encoding is used only when
  max_in_degree * K < 2^62 (checked once at setup). When the RAW vid domain
  is too wide for that (the production xxhash64 scheme spans ~2^64), vids
  are first dense-ranked [0, V) with one order-preserving distributed rank
  (monotone bijection -> identical tie semantics), the fixpoint runs on
  ranks, and one final equi-join decodes them; only when even
  max_in_degree * V overflows does the struct-min fallback carry exactness.

  update: left-join the winners back onto the previous labels; the changed
  flag `_delta` is computed in the same select (zero-extra-join convergence,
  superstep.py rule 2).

Optional two-phase salting (C10) for extreme hub skew — partial histograms
by (dst, salt, label) spread a hub's fan-in across salt_buckets reducers;
results identical to unsalted (tests/test_csr_kernels.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize, vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import drop_views, fresh_view, run_supersteps
from pcd_spark.storage import CheckpointStore

_ENC_LIMIT = 2**62


def argmax_label(counts: DataFrame, vid_col: str = "vid") -> DataFrame:
    """D6: per-vertex deterministic argmax over (label, cnt) rows: highest
    cnt wins, ties -> smallest label. Portable struct-min form (used by the
    relational surface and as the overflow fallback; the LPA hot path uses
    the hash-agg-friendly encoded form below)."""
    return (
        counts.groupBy(vid_col)
        .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias("m"))
        .select(vid_col, F.col("m.label").alias("new_label"))
    )


def argmax_label_encoded(
    counts: DataFrame, k: int, offset: int = 0, vid_col: str = "vid"
) -> DataFrame:
    """Same semantics as argmax_label via a single max(long):
    score = cnt*k - (label - offset), requiring 0 <= label - offset < k
    -> max picks highest cnt, then smallest label; decode
    label = offset + (k - score mod k) mod k. Stays inside
    whole-stage-codegen HashAggregate (struct-min cannot).

    offset = min(label) supports SIGNED label domains — the prod vid path is
    xxhash64(repo, path) which is signed, so labels (== vids under the LPA
    init rule) are routinely negative; encoding the raw label would decode
    to a nonexistent vertex (round-1 ADVICE high finding)."""
    score = F.col("cnt") * F.lit(k) - (F.col("label") - F.lit(offset))
    kl = F.lit(k)
    return (
        counts.groupBy(vid_col)
        .agg(F.max(score).alias("s"))
        .select(
            vid_col,
            (F.lit(offset) + F.pmod(kl - F.pmod(F.col("s"), kl), kl)).alias(
                "new_label"
            ),
        )
    )


def label_propagation(
    edges: DataFrame,
    max_iter: int = 30,
    num_parts: int | None = None,
    salt_buckets: int = 0,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    stats_out: dict | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, label: long) under the pinned rule.

    weight_col: weighted voting — a neighbor's label counts with the edge
    weight instead of 1 (parallel edges SUM their weights in the canonical
    form; the K8 dependency graph's weight = import count is the intended
    input). Same tie rule (highest total weight, ties -> smallest label).
    Weighted sums are doubles, so the encoded single-long argmax does not
    apply; the portable struct-min fallback carries the rule instead."""
    # persist the (possibly derived) input once: referenced by the adaptive
    # sizing count and the symmetrize below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    if weight_col is None:
        sym = symmetrize(edges)
    else:
        canon = (
            edges.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        sym = canon.unionByName(
            canon.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    if salt_buckets > 0:
        # deterministic salt from the source vertex: spreads a hub dst's
        # incoming messages across salt_buckets phase-1 reducers
        sym = sym.withColumn(
            "salt",
            F.pmod(F.xxhash64("src", F.lit(7)), F.lit(salt_buckets)).cast("int"),
        )
    sym = sym.repartition(p, "src").persist()
    sym.count()
    verts = vertices_of(sym).persist()

    # setup-time bounds for the encoded argmax (one pass each, amortized
    # over every superstep that then avoids SortAggregate); labels are always
    # vertex ids, so [min_vid, max_vid] bounds the label domain — the offset
    # keeps the encoding valid for signed (xxhash64) vid spaces
    bounds = verts.agg(
        F.min("vid").alias("lo"), F.max("vid").alias("hi")
    ).first()
    min_vid = int(bounds["lo"] or 0)
    enc_k = int(bounds["hi"] or 0) - min_vid + 1
    dmax_row = (
        sym.groupBy("dst").agg(F.count("*").alias("d")).agg(F.max("d").alias("m")).first()
    )
    dmax = int(dmax_row["m"] or 1)
    use_encoded = (
        weight_col is None and enc_k > 0 and (dmax + 1) * enc_k < _ENC_LIMIT
    )

    # Rank-encoded argmax for WIDE vid domains (the production path): the
    # K8 default vid scheme is xxhash64 -> enc_k spans ~2^64 and the raw
    # encoding above never applies, silently dropping every superstep into
    # the struct-min SortAggregate (measured: lpa 1.58 s/superstep on the
    # 78k-edge corpus graph vs 0.51 on an equal-size BA graph with dense
    # int vids). Fix: ONE order-preserving dense rank vid -> [0, V)
    # (global_rank's range-partitioned form, no single-task sort), run the
    # whole fixpoint on label RANKS (ties -> smallest rank == smallest vid,
    # because the bijection is monotone), decode ranks -> vids with one
    # equi-join at the end. Per-superstep plans are then identical to the
    # dense-vid fast path; the dictionary costs O(V) once.
    rank_dict = None
    if not use_encoded and weight_col is None:
        from pcd_spark.relational.queries import global_rank

        _st: dict = {}
        rank_dict = (
            global_rank(verts, ["vid"], rank_name="rk", stats_out=_st)
            .select("vid", (F.col("rk") - 1).alias("rk"))
            .persist()
        )
        n_v = int(_st["total"])
        if n_v > 0 and (dmax + 1) * n_v < _ENC_LIMIT:
            use_encoded = True
            enc_k, min_vid = n_v, 0  # ranks are dense [0, V)
        else:  # pathological in-degree x vertex count: keep struct-min
            rank_dict.unpersist()
            rank_dict = None

    if rank_dict is not None:
        init = rank_dict.select(
            "vid", F.col("rk").alias("label"), F.lit(1.0).alias("_delta")
        )
    else:
        init = verts.select(
            "vid", F.col("vid").alias("label"), F.lit(1.0).alias("_delta")
        )

    # The whole superstep is ONE spark.sql() over temp views — single parse +
    # single analysis per iteration instead of ~10 eagerly-analyzed
    # transformations (see superstep.fresh_view; same conversion as
    # pagerank/cc, measured 0.24-0.48 s -> 0.06-0.10 s of driver time per
    # superstep). The physical plans are unchanged per variant:
    #   - unsalted: ONE wide REPARTITION(p, dst) shuffle; the (dst,label)
    #     count AND the per-dst argmax both run partition-local because
    #     HashPartitioning(dst) satisfies their clustering requirements;
    #   - salted (C10): partial histograms by (dst,salt,label), then final;
    #   - unweighted messages never carry a weight column (8 fewer bytes on
    #     every one of the 2|E| shuffled rows);
    #   - argmax: encoded single-long MAX when the domain fits (hash-agg,
    #     codegen), else the portable struct-MIN (SortAggregate — exact at
    #     any scale, incl. full-range signed xxhash64 vid spaces).
    spark = edges.sparkSession
    sym_view = fresh_view(sym, "pcd_lpa_sym")
    state_view = fresh_view(init, "pcd_lpa_state")
    wcol = "" if weight_col is None else ", e.w"
    vote = "COUNT(*)" if weight_col is None else "SUM(w)"
    msgs_sql = (
        f"SELECT /*+ {'' if salt_buckets > 0 else f'REPARTITION({p}, dst), '}"
        f"SHUFFLE_HASH(e) */ e.dst{', e.salt' if salt_buckets > 0 else ''},"
        f" r.label{wcol}"
        f" FROM {sym_view} e JOIN {state_view} r ON e.src = r.vid"
    )
    if salt_buckets > 0:
        counts_sql = f"""
            SELECT dst AS vid, label, SUM(cnt) AS cnt
            FROM (SELECT dst, salt, label, {vote} AS cnt
                  FROM ({msgs_sql}) m
                  GROUP BY dst, salt, label) pp
            GROUP BY dst, label"""
    else:
        counts_sql = f"""
            SELECT dst AS vid, label, {vote} AS cnt
            FROM ({msgs_sql}) m
            GROUP BY dst, label"""
    if use_encoded:
        k, off = enc_k, min_vid
        best_sql = f"""
            SELECT vid, {off} + PMOD({k} - PMOD(sc, {k}), {k}) AS new_label
            FROM (SELECT vid, MAX(cnt * {k} - (label - {off})) AS sc
                  FROM ({counts_sql}) c GROUP BY vid) mx"""
    else:
        best_sql = f"""
            SELECT vid, m.label AS new_label
            FROM (SELECT vid,
                         MIN(NAMED_STRUCT('nc', -cnt, 'label', label)) AS m
                  FROM ({counts_sql}) c GROUP BY vid) mx"""
    step_sql = f"""
        SELECT vid, nlabel AS label, CAST(nlabel <> old AS DOUBLE) AS _delta
        FROM (SELECT /*+ SHUFFLE_HASH(b) */ s.vid, s.label AS old,
                     COALESCE(b.new_label, s.label) AS nlabel
              FROM {state_view} s
              LEFT JOIN ({best_sql}) b ON s.vid = b.vid)"""

    def step(state: DataFrame, _i: int) -> DataFrame:
        state.createOrReplaceTempView(state_view)
        return spark.sql(step_sql)

    def resume_fix(state: DataFrame) -> DataFrame:
        # LPA checkpoints are (rank-)ENCODED against the checkpoint-time
        # vertex set, and the fixpoint is trajectory-dependent — unlike
        # PageRank (unique fixpoint, pagerank.resume_fix re-anchors onto a
        # grown graph), a label state resumed onto a DIFFERENT graph would
        # silently decode through the wrong bijection / never visit new
        # vertices. Guard: same vertex count (the dict derivation is
        # deterministic, so same graph -> same bijection); anything else is
        # a hard error telling the caller to rerun from scratch.
        n_state = state.count()
        n_now = verts.count()
        if n_state != n_now:
            raise ValueError(
                "label_propagation: checkpoint was written for a graph "
                f"with {n_state} vertices but the current edge table has "
                f"{n_now} — LPA state is encoded against the checkpoint-"
                "time vertex set and cannot be re-anchored; rerun with "
                "resume=False (or a fresh run_id) on the new graph"
            )
        return state

    _secs: list[float] = []
    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, step_secs=_secs,
        resume_fix=resume_fix, disable_aqe=True,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
        stats_out["step_secs"] = _secs
        stats_out["encoded_argmax"] = use_encoded
        stats_out["rank_encoded"] = rank_dict is not None
    out = final.select("vid", "label")
    if rank_dict is not None:
        # decode label ranks -> original vids (one equi-join, O(V) each
        # side); materialize before dropping the dictionary cache so the
        # returned frame doesn't re-derive verts from unpersisted lineage
        decode = rank_dict.select(
            F.col("rk").alias("label"), F.col("vid").alias("_lvid")
        )
        out = (
            out.join(decode, "label")
            .select("vid", F.col("_lvid").alias("label"))
            .localCheckpoint(eager=True)
        )
        rank_dict.unpersist()
    drop_views(spark, sym_view, state_view)
    sym.unpersist()
    verts.unpersist()
    edges.unpersist()
    return out
