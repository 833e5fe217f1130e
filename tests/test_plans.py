"""Physical-plan regression tests (SURVEY §4 discipline, VERDICT r1 themes).

These pin the OPTIMIZER-FACING properties the engine's scale story depends
on — that filters reach the parquet scan, projections prune columns, small
dimensions broadcast, nothing plans a cartesian, and no per-row Python UDF
(BatchEvalPython) ever appears in a hot path. Correctness tests can't catch
regressions here: a query that silently re-plans as a cartesian or loses
pushdown still returns the right rows at sf0.001 and falls over at 100 TB.
"""

from __future__ import annotations

import pytest

from pcd_spark.relational import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name]["spark"](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# Pure-relational entries whose construction is lazy (no internal jobs) —
# building the physical plan is cheap and execution-free. The iterative
# graph/clustering queries (k*, x10/x14, v5) run jobs inside their builder
# and are plan-audited where it matters (k6's broadcast test, x4's
# no-cartesian test); sweeping them here would re-run them for no signal.
PLAN_SWEEP = [
    "b1_project_cast", "b2_filter_range", "b3_filter_in_null_like",
    "b4_bool_combinators", "b5_conditional_projection",
    "c1_join_inner_agg", "c2_join_broadcast_dims",
    "c3_join_shuffle_hash_hint", "c4_join_left_outer", "c5_join_left_semi",
    "c6_join_left_anti", "c7_self_join_theta", "c8_range_join",
    "c9_asof_join",
    "d1_groupby_agg", "d2_global_agg", "d3_distinct", "d4_count_distinct",
    "d5_approx_count_distinct", "d6_deterministic_argmax", "d8_collect_set",
    "d9_rollup", "d9b_cube",
    "e1_rownum_latest", "e2_dense_rank", "e3_topk_per_group",
    "e4_lag_delta", "e5_moving_avg", "e6_ntile_percent_rank",
    "e8_cume_dist",
    "f1_global_sort", "f2_limit", "f3_global_topk",
    "g1_union", "g2_intersect", "g3_except",
    "h1_sha256", "h2_regexp_extract_all", "h3_string_basics",
    "h5_date_functions", "h6_math", "h7_array_functions",
    "h8_higher_order_dot", "h9_map_functions", "h10_json",
    "i2_tumbling_window_batch", "i3_sliding_window_batch",
    "i4_session_window_batch", "i8_distinct_users_batch",
    "x1_dedup_exact", "x2_minhash_signature", "x3_minhash_lsh_buckets",
    "x5_token_count", "x6_quality_score", "x7_langid_heuristic",
    "x8_fingerprint", "x9_simhash", "x11_repetition_metrics",
    "x12_decontamination", "x13_pii_scrub", "x15_split_assignment",
    "v2_lsh_sign_buckets",
    "k26_bipartite_projection", "k28_butterflies",
    "x16_cross_doc_chunks", "x17_sequence_packing",
    "x18_quality_downsample", "k31_conductance",
    "x19_source_quality_gate",
    # round-3 additions: d11 exact percentiles, i9 interval join (must stay
    # an equi-join with the range as post-join condition, never a BNLJ),
    # x21 Arrow-batched entropy UDF (ArrowEvalPython allowed, BatchEval
    # banned)
    "d11_group_percentiles", "i9_interval_join_batch", "x21_word_entropy",
    "i10_stream_static_join_batch",
    # round-3 late additions: e7 sessionization (both windows partition by
    # user_id — the no-partitionless-Window assertion below is the load-
    # bearing one), d12 moment sketches (one hash agg), k34 two-hop reach
    # (wedge equi-join + left-anti, never BNLJ)
    "e7_sessionization", "d12_grouped_stats", "k34_two_hop_reach",
    # round-3 late additions: c11 null-safe join (the load-bearing check —
    # Catalyst must extract EqualNullSafe as a hash-join key, never BNLJ),
    # g4 schema-evolving union (narrow Union+Project, no join at all)
    "c11_null_safe_join", "g4_union_by_name",
    # d13 pivot (ONE hash agg with PivotFirst — the pinned-value-list form
    # never plans the extra domain-discovery DISTINCT), d14 unpivot (a
    # single narrow Expand, no shuffle, no self-union rescans)
    "d13_pivot", "d14_unpivot",
    # k36 reciprocity (canonical-pair groupBy, NO edge self-join), k37
    # degree distribution (two hash aggs; the 1-row MLE scalar is collected
    # and attached as a literal — any join form here planned a BNLJ)
    "k36_reciprocity", "k37_degree_distribution",
    # round-3 continuation: the declarative-subquery surface (c12 EXISTS ->
    # semi/anti HASH joins, c13 NOT IN -> null-aware anti hash join, c14
    # scalar subqueries -> one-shot subquery jobs — NONE may degrade to a
    # per-row BNLJ probe), generators (h11 narrow Generate; h12 grid
    # generates from the O(users) span side), d15 (MapInPandas candidate
    # stage + broadcast semi recount; BatchEvalPython stays banned), v10
    # (FlatMapGroupsInPandas over probe groups; window partitioned by
    # probe_id so the no-partitionless-Window assertion applies)
    "c12_exists_subquery", "c13_not_in_subquery", "c14_scalar_subquery",
    "h11_posexplode", "h12_sequence_gapfill", "d15_heavy_hitters",
    # x24 shared spans: shingle explode + digest hash agg + doc-keyed
    # windows — no cross join anywhere, and both Window nodes partition
    "x24_shared_spans",
    # v12 k-NN graph: the bucket self-join must stay an equi hash join
    # (cost = sum of squared bucket sizes, never n^2) and the top-k window
    # partitions by src
    "v12_knn_graph",
    # third continuation batch: x26's winner agg + reconstruction join
    # must stay equi hash joins with no per-row Python
    "x26_segment_dedup_rewrite",
    # k52 Burt constraint: the two-path middle-vertex self-join must stay
    # an equi hash join on q (cost = sum of squared degrees, never the
    # n^2 BNLJ form), and the indirect-mass left join stays hash-keyed
    "k52_burt_constraint",
    # fifth continuation: x29 chunking (pure scan -> Generate -> Project,
    # no join at all, no Python); k54 temporal reachability and k55
    # closeness are superstep-built (frontier equi joins; their per-hop
    # shape is pinned by the engines they share with k12)
    "x29_chunk_documents",
    # round 4: k59 disparity backbone (two equi hash joins + one hash agg,
    # no iteration), k60 burstiness (pair-keyed window + moments agg —
    # the Window partitions by (src, dst)), x33 winnowing (Generate +
    # doc-keyed window MIN + distinct — the gram explosion must stay
    # join-free and Python-free)
    "k59_disparity_backbone", "k60_edge_burstiness",
    "x33_winnowing_fingerprints",
]
# x27/x28 crossJoin a ONE-ROW global-stats frame (broadcast nested loop
# with a literal-sized build side — the intended scalar-distribution
# form) and v13's probe screen is v1's broadcast-probes scan; all three
# get dedicated BuildLeft/BuildRight assertions below instead of the
# sweep's blanket no-BNLJ rule. Round 4: v17 joins that scalar-combine
# class (two 1-row stat branches crossJoined) and x34 ranks a
# LIMIT-200-bounded frame (its single-partition Window input is literal-
# sized by construction, not the vocabulary) — both pinned in
# test_round4_plan_exemptions below instead of the sweep.
# v10_mmr_rerank candidate generation IS v1's broadcast-probes scan — it
# shares v1's sweep exemption and gets the same dedicated BuildLeft
# assertion (test_v10_mmr_streams_big_side) instead. v11_ann_recall
# composes v1's exact arm (broadcast probes) with v4's centroid
# assignment (broadcast-centroid cross join) — both intentional broadcast
# forms, pinned in test_v11_recall_broadcasts_small_sides.
# k61 runs a job in its builder (the O(1) global-max-weight scalar, k37
# precedent) so it sits outside the sweep; its join graph is k11's swept
# shape plus one carried double column.
# k40/k41/k42 are absent from the sweep for the k37/k39 reason: their
# results are O(1)/O(ks)/top-20 literal-or-collected rows — the substance
# is the internal jobs (contingency hash agg, conditional-sum agg,
# supersteps), whose plan discipline is pinned by the functions they share
# with swept queries (k1 degrees, k6 join shape, k3 superstep).
# k53_clique_percolation eagerly localCheckpoints its triangle list and
# result (the K6/K4 composition), so it joins the excluded-from-sweep set
# below; its component plans are the swept/asserted K6 and K4 shapes.
# x20_boilerplate_grams eagerly localCheckpoints its gram table (a job),
# so it joins x4/x10/x23 in the excluded-from-sweep set; its no-cartesian
# property holds by construction (explode + equi-joins only). Same for
# x23_tfidf_topk (eager localCheckpoint of the tf table; explode +
# equi-join on term + per-doc window only) and x25_lm_quality (eager
# model-table checkpoints + two O(1) scalar collects; scan-side bigram
# generation + broadcast vocab joins + equi joins only — its executed
# plan is additionally spot-asserted free of CartesianProduct/BNLJ/
# BatchEvalPython in test_x25_plan_is_clean below).
# v1_cosine_topk is deliberately absent: brute-force cosine IS an all-pairs
# scored scan (the documented exactness baseline for v2/v4) — its plan is
# asserted separately to be the acceptable form (broadcast probes, stream
# the big side) rather than banned.


@pytest.mark.parametrize("name", PLAN_SWEEP)
def test_no_cartesian_and_no_rowwise_python(spark, sf_dir, name):
    """No query may plan a CartesianProduct / BroadcastNestedLoopJoin
    (all-pairs — dies at scale; even c7/c8's theta joins carry an equi
    component precisely so they hash-join), and none may contain a
    BatchEvalPython node (row-at-a-time Python UDF — the banned slow path;
    ArrowEvalPython, the vectorized form, is allowed where used)."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, (name, plan)
    assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
    assert "BatchEvalPython" not in plan, (name, plan)


@pytest.mark.parametrize("name", PLAN_SWEEP)
def test_no_single_partition_window(spark, sf_dir, name):
    """A Window with no partitionBy plans `Exchange SinglePartition` → Window:
    every row of the input funnels through ONE task — the global-sort scale
    killer global_rank() exists to avoid (VERDICT r2 'What's wrong' #1, e6).
    A global AGGREGATE over SinglePartition is fine (O(P) partial rows), so
    the ban is scoped to plans that carry a Window node."""
    plan = _plan(spark, sf_dir, name)
    if "Window" in plan:
        assert "Exchange SinglePartition" not in plan, (name, plan)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """b2's range predicate must reach the parquet reader as PushedFilters —
    a plan that filters after a full scan reads 100 TB to return a slice."""
    plan = _plan(spark, sf_dir, "b2_filter_range")
    assert "PushedFilters:" in plan, plan
    pushed = [
        line for line in plan.splitlines() if "PushedFilters:" in line
    ]
    assert any(
        "l_quantity" in line and ("GreaterThan" in line or "LessThan" in line)
        for line in pushed
    ), pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    """b1 projects a handful of lineitem columns; ReadSchema must not carry
    all 16 — unpruned scans are the difference between reading 2 columns
    and reading 100 TB."""
    plan = _plan(spark, sf_dir, "b1_project_cast")
    read = [l for l in plan.splitlines() if "ReadSchema:" in l]
    assert read, plan
    assert "l_comment" not in read[0], read[0]


def test_v1_bruteforce_streams_big_side(spark, sf_dir):
    """v1's all-pairs scan is intentional (exactness baseline), but only in
    the form that survives a big candidate side: the tiny probe set must be
    the BROADCAST build side of the nested-loop join, so candidates stream
    through one pass and never shuffle or build."""
    plan = _plan(spark, sf_dir, "v1_cosine_topk")
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan


def test_v8_range_streams_big_side(spark, sf_dir):
    """v8's ε-range scan is v1's shape with a threshold filter: the tiny
    probe set must broadcast (BuildLeft) so the candidate side streams in
    one pass; output is O(matches), never O(n·probes) materialized."""
    plan = _plan(spark, sf_dir, "v8_cosine_range")
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan


def test_x30_decon_streams_big_side(spark, sf_dir):
    """x30's semantic decontamination is v8's broadcast-probes shape with
    the roles flipped: the SMALL benchmark set broadcasts (BuildLeft) and
    the corpus streams scan-side through one codegen'd max-agg — at 100 TB
    the corpus never shuffles and never builds."""
    plan = _plan(spark, sf_dir, "x30_semantic_decontamination")
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_v9_sq8_streams_big_side(spark, sf_dir):
    """v9's SQ8 search keeps v8's shape: the 5-probe set broadcasts
    (BuildLeft) and the encoded candidate side streams scan-side through
    one narrow decode projection — the quantized table never shuffles and
    never builds a hash table."""
    plan = _plan(spark, sf_dir, "v9_sq8_topk")
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan


def test_v15_hamming_streams_big_side(spark, sf_dir):
    """v15's binary-quantized search keeps the broadcast-probes shape: the
    5-probe set broadcasts (BuildLeft) and the one-long-per-row encoded
    table streams scan-side; distance is XOR+popcount inside codegen —
    no Python, no float math in the scan loop."""
    plan = _plan(spark, sf_dir, "v15_hamming_topk")
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_v10_mmr_streams_big_side(spark, sf_dir):
    """v10's candidate stage is v1's broadcast-probes scan (same exemption):
    probes broadcast (BuildLeft), candidates stream; the greedy re-rank is
    a FlatMapGroupsInPandas over probe groups, never row-at-a-time Python."""
    plan = _plan(spark, sf_dir, "v10_mmr_rerank")
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_x25_plan_is_clean(spark, sf_dir):
    """x25 builds eagerly (model-table checkpoints + two scalar collects),
    so it sits outside PLAN_SWEEP — this is its equivalent assertion set.
    The scoring plan must stay: scan-side bigram generation (narrow
    Generate), broadcast vocabulary joins, equi hash joins, one doc-keyed
    hash agg — never an all-pairs join, a row-wise Python node, or a
    partition-less Window."""
    plan = _plan(spark, sf_dir, "x25_lm_quality")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Window" not in plan, plan


def test_round4_plan_exemptions(spark, sf_dir):
    """x34 and v17 sit outside PLAN_SWEEP for documented reasons; these
    are their equivalent assertions. x34: the only Window ranks a frame
    ALREADY bounded to 200 rows by TakeOrderedAndProject (the vocabulary
    itself never funnels through one partition), and nothing plans a
    cartesian or row-wise Python. v17: the single BroadcastNestedLoopJoin
    is the x27/x28-exempted 1-row-by-1-row scalar combine; no other join
    exists and no Window at all."""
    plan = _plan(spark, sf_dir, "x34_zipf_fit")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the limit must be applied BELOW the window: TakeOrderedAndProject
    # appears, and the window's exchange feeds from it, not from the
    # full aggregate
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.index("TakeOrderedAndProject") > plan.index("Window"), (
        "top-200 limit must sit under the ranking window", plan,
    )

    plan = _plan(spark, sf_dir, "v17_embedding_audit")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Window" not in plan, plan
    # exactly the one intended scalar-combine BNLJ (1-row x 1-row)
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan

    # v18 composes v4/v11's intentional broadcast-tiny nested-loop forms
    # (8-row centroid table x2, 5-probe exact arm); everything else —
    # the swept candidate fetch included — must stay equi hash joins,
    # and the nprobe sweep itself is a narrow Generate, not a join
    plan = _plan(spark, sf_dir, "v18_ivf_nprobe_sweep")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 3, plan
    assert "Generate explode" in plan, plan


def test_v11_recall_broadcasts_small_sides(spark, sf_dir):
    """v11's two intentional nested-loop joins must both be broadcast
    forms of TINY sides: v4's centroid assignment (8-row centroid table,
    BuildRight against the streaming vector scan) and v1's exact arm
    (5-probe set, BuildLeft against the streaming candidates). No other
    join may degrade: the cell-candidate join and the recall join are
    equi hash joins."""
    plan = _plan(spark, sf_dir, "v11_ann_recall")
    assert "BroadcastNestedLoopJoin BuildRight" in plan, plan
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan
    # the recall intersection itself must be a hash join on the pair key
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_c13_not_in_plans_single_hash_anti_join(spark, sf_dir):
    """NOT IN must plan as ONE null-aware broadcast hash anti join — a
    naive engine re-scans the subquery per outer row (the BNLJ form the
    sweep bans)."""
    plan = _plan(spark, sf_dir, "c13_not_in_subquery")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_c11_null_safe_join_is_hash_join(spark, sf_dir):
    """EqualNullSafe must be extracted as a hash-join key (Catalyst wraps
    both sides in coalesce+isnull tuples) — a BNLJ here would mean every
    entity-resolution join with nullable blocking keys goes all-pairs."""
    plan = _plan(spark, sf_dir, "c11_null_safe_join")
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_small_dimensions_broadcast(spark, sf_dir):
    """c2 joins lineitem against nation/region dims — both must plan as
    BroadcastHashJoin (map-side, zero shuffle of the fact side); x12's
    benchmark gram set likewise broadcasts against the corpus."""
    assert _plan(spark, sf_dir, "c2_join_broadcast_dims").count(
        "BroadcastHashJoin"
    ) >= 2
    assert "BroadcastHashJoin" in _plan(spark, sf_dir, "x12_decontamination")


def test_v13_screen_broadcasts_probes_only(spark, sf_dir):
    """v13's stage-1 screen is v1's exemption shape: the 5-probe set must
    be the broadcast build side of the nested-loop join so the prefix
    candidates stream; the stage-2 rerank must be equi hash joins on
    vec_id/probe_id (broadcast candidates), and nothing row-wise Python."""
    plan = _plan(spark, sf_dir, "v13_matryoshka_rerank")
    assert "BroadcastNestedLoopJoin BuildLeft" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


@pytest.mark.parametrize(
    "name", ["x27_source_mixing", "x28_curation_pipeline"]
)
def test_mixing_broadcasts_scalar_stats(spark, sf_dir, name):
    """x27/x28 distribute ONE row of global stats (tot, z) by a broadcast
    nested loop — the intended scalar-distribution plan; the per-source
    rate table must reach the docs through a broadcast HASH join, and no
    per-row Python anywhere."""
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_x31_calibration_plan_shape(spark, sf_dir):
    """x31's three data-sized joins (band self-join, postings join, hit
    join) must all be equi hash joins; the only nested-loop nodes allowed
    are the two 1-row scalar-count combines (x27/x28's exempted
    literal-build pattern), and no Python anywhere."""
    plan = _plan(spark, sf_dir, "x31_lsh_calibration")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the scalar combine is the only nested-loop form present
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
