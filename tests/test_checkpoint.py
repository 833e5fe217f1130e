"""Checkpoint / resume / lineage tests (SURVEY.md §5.3.5; BASELINE.json:6
"per-partition lineage and convergence metrics checkpointed ... so any run
resumes mid-iteration")."""

from __future__ import annotations

import glob
import os

import pytest

from pcd_spark.graph import label_propagation, pagerank
from pcd_spark.storage import CheckpointStore
from tests.conftest import edges_df


def _kill_after(base, algo, run_id, keep_iter):
    """Simulate a mid-run kill: drop every manifest after keep_iter (their
    parquet snapshots may exist — without a manifest they're invisible)."""
    pat = os.path.join(base, run_id, algo, "manifest-iter*.json")
    for f in sorted(glob.glob(pat)):
        it = int(f.rsplit("manifest-iter", 1)[1].split(".")[0])
        if it > keep_iter:
            os.remove(f)


def test_lpa_resume_identical(spark, graphs, tmp_path):
    g = graphs["er_200"]
    e = edges_df(spark, g["edges"])
    base = str(tmp_path / "ck")

    s1 = CheckpointStore(base, "lpa", run_id="runA")
    full = {
        r["vid"]: r["label"]
        for r in label_propagation(e, max_iter=12, store=s1, checkpoint_every=3).collect()
    }
    _kill_after(base, "lpa", "runA", keep_iter=3)

    s2 = CheckpointStore(base, "lpa", run_id="runA")
    assert s2.latest().iteration == 3
    resumed = {
        r["vid"]: r["label"]
        for r in label_propagation(e, max_iter=12, store=s2, checkpoint_every=3).collect()
    }
    assert resumed == full


def test_pagerank_resume_identical(spark, graphs, tmp_path):
    g = graphs["karate"]
    e = edges_df(spark, g["edges"])
    e = e.unionByName(e.selectExpr("dst as src", "src as dst"))
    base = str(tmp_path / "ck")

    s1 = CheckpointStore(base, "pagerank", run_id="runP")
    full = {
        r["vid"]: r["rank"]
        for r in pagerank(e, tol=1e-10, max_iter=60, store=s1, checkpoint_every=10).collect()
    }
    _kill_after(base, "pagerank", "runP", keep_iter=20)
    s2 = CheckpointStore(base, "pagerank", run_id="runP")
    resumed = {
        r["vid"]: r["rank"]
        for r in pagerank(e, tol=1e-10, max_iter=60, store=s2, checkpoint_every=10).collect()
    }
    assert resumed == full  # byte-identical: same floats, same iteration path


def test_manifest_lineage_fields(spark, graphs, tmp_path):
    g = graphs["two_cliques"]
    e = edges_df(spark, g["edges"])
    base = str(tmp_path / "ck")
    store = CheckpointStore(base, "lpa", run_id="runM")
    label_propagation(e, max_iter=6, store=store, checkpoint_every=2).collect()

    ms = store.manifests()
    assert [m.iteration for m in ms] == sorted(m.iteration for m in ms)
    for m in ms:
        assert m.run_id == "runM" and m.algo == "lpa"
        assert m.state_sha and len(m.state_sha) == 64
        assert sum(m.partition_rows.values()) == 20  # rows per partition sum to V
        assert m.delta_metric >= 0.0
        assert m.ts.endswith("Z")
    # convergence metrics lineage is monotone in iteration and reaches 0
    lineage = store.metrics_lineage()
    assert lineage[-1][1] == 0.0


def test_resume_skips_completed_run(spark, graphs, tmp_path):
    """Resuming a fully-converged run re-reads the final snapshot and stops
    after one no-op superstep (delta 0) — no divergence, no re-work."""
    g = graphs["two_cliques"]
    e = edges_df(spark, g["edges"])
    base = str(tmp_path / "ck")
    s1 = CheckpointStore(base, "lpa", run_id="runC")
    full = {
        r["vid"]: r["label"]
        for r in label_propagation(e, max_iter=10, store=s1, checkpoint_every=2).collect()
    }
    s2 = CheckpointStore(base, "lpa", run_id="runC")
    again = {
        r["vid"]: r["label"]
        for r in label_propagation(e, max_iter=10, store=s2, checkpoint_every=2).collect()
    }
    assert again == full


def test_pagerank_resume_from_pre_dang_checkpoint(spark, graphs, tmp_path):
    """Regression (round-1 ADVICE): a checkpoint written before the 'dang'
    state column existed must still resume — the flag is re-derived from the
    danglers set (superstep resume_fix hook), not read from the snapshot."""
    g = graphs["directed_toy"]  # has dangling vertices
    e = edges_df(spark, g["edges"])
    base = str(tmp_path / "ck")

    s1 = CheckpointStore(base, "pagerank", run_id="runD")
    full = {
        r["vid"]: r["rank"]
        for r in pagerank(e, tol=1e-10, max_iter=60, store=s1, checkpoint_every=10).collect()
    }
    _kill_after(base, "pagerank", "runD", keep_iter=10)

    # simulate the old engine version: strip 'dang' from the surviving snapshot
    snap = os.path.join(base, "runD", "pagerank", "iter=00010")
    old = spark.read.parquet(snap)
    assert "dang" in old.columns
    stripped = old.drop("dang")
    tmp_snap = snap + ".tmp"
    stripped.write.mode("overwrite").parquet(tmp_snap)
    import shutil

    shutil.rmtree(snap)
    os.replace(tmp_snap, snap)

    s2 = CheckpointStore(base, "pagerank", run_id="runD")
    resumed = {
        r["vid"]: r["rank"]
        for r in pagerank(e, tol=1e-10, max_iter=60, store=s2, checkpoint_every=10).collect()
    }
    assert resumed == full


def test_lpa_resume_on_grown_graph_raises(spark, graphs, tmp_path):
    """LPA state is (rank-)encoded against the checkpoint-time vertex set
    and its fixpoint is trajectory-dependent, so — unlike PageRank, which
    re-anchors — resuming onto a graph with a different vertex set must be
    a hard error, not a silent relabeling through the wrong bijection."""
    g = graphs["er_200"]
    e = edges_df(spark, g["edges"])
    base = str(tmp_path / "ck")

    s1 = CheckpointStore(base, "lpa", run_id="grow")
    label_propagation(e, max_iter=6, store=s1, checkpoint_every=2).collect()

    grown = e.unionByName(
        spark.createDataFrame([(9001, 9002), (9002, 9003)], "src long, dst long")
    )
    s2 = CheckpointStore(base, "lpa", run_id="grow")
    with pytest.raises(ValueError, match="cannot be re-anchored"):
        label_propagation(grown, max_iter=6, store=s2, checkpoint_every=2)


def test_kcore_resume_on_changed_graph_raises(spark, graphs, tmp_path):
    """The manifest graph-token guard: k-core peeling is trajectory-bound
    with NO re-anchoring resume_fix, so resuming its checkpoint onto a
    graph with a different edge set must raise instead of peeling a stale
    alive-set. (PageRank/CC keep resuming across graph growth — they carry
    a resume_fix that re-anchors, and the guard defers to it.)"""
    from pcd_spark.graph import k_core

    g = graphs["er_200"]
    e = edges_df(spark, g["edges"])
    base = str(tmp_path / "ck")

    s1 = CheckpointStore(base, "kcore", run_id="grow")
    k_core(e, k=3, max_iter=8, store=s1, checkpoint_every=2).collect()
    assert s1.latest().graph_token is not None

    grown = e.unionByName(
        spark.createDataFrame([(9001, 9002)], "src long, dst long")
    )
    s2 = CheckpointStore(base, "kcore", run_id="grow")
    with pytest.raises(ValueError, match="graph_token|cannot be re-anchored|rerun with resume=False"):
        k_core(grown, k=3, max_iter=8, store=s2, checkpoint_every=2)
