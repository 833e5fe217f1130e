"""Local mirror of the driver's DuckDB correctness gate (SURVEY.md §5.3.1).

Runs every REGISTRY entry that has a SQL oracle on sf0.001, compares
row-count + schema-width + order-insensitive values (columns sorted by name,
rows sorted), with exact equality for non-floats and 1e-9 tolerance for
floats — stricter than needed so driver hash-compare mismatches never
originate here.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pcd_spark.relational import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            if hasattr(v, "isoformat"):  # date/datetime -> canonical string
                v = v.isoformat()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


ORACLE_QUERIES = sorted(n for n, e in REGISTRY.items() if e["sql"])


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_duckdb(spark, sf_dir, ddb, name):
    entry = REGISTRY[name]
    sdf = entry["spark"](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(entry["sql"])
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    a, b = _norm(srows, scols), _norm(drows, dcols)
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name} row {i}: {ra} vs {rb}"
                )
            else:
                assert va == vb, f"{name} row {i}: {ra} vs {rb}"


ROWS_ONLY = sorted(n for n, e in REGISTRY.items() if not e["sql"])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = REGISTRY[name]["spark"](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_x4_plan_has_no_cartesian(spark, sf_dir):
    """x4 regression (round-1 VERDICT #2): candidate generation must be an
    equi-join on the inverted index, never BroadcastNestedLoopJoin /
    CartesianProduct — those are all-pairs and die at scale."""
    df = REGISTRY["x4_ngram_jaccard_pairs"]["spark"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_x22_plan_has_no_cartesian(spark, sf_dir):
    """x22 shares x4's inverted-index shape and its failure mode: the
    directed d1 != d2 predicate must stay a post-equi-join filter on the
    postings join, never degrade to an all-pairs plan."""
    df = REGISTRY["x22_containment_pairs"]["spark"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


DRIVER_WINDOW = list(REGISTRY)[:50]


@pytest.mark.parametrize("name", DRIVER_WINDOW)
def test_driver_canonicalizer_compat(spark, sf_dir, name):
    """The driver canonicalizes results with pandas sort_values over every
    column, which factorizes object columns — list/dict/ndarray cells raise
    `TypeError: unhashable type` (round-1 d8 failure mode). Every query in
    the driver's 50-entry oracle window must therefore emit only hashable
    scalars. Run the exact operation the driver runs."""
    pdf = REGISTRY[name]["spark"](spark, sf_dir).toPandas()
    pdf.sort_values(by=list(pdf.columns))  # raises on unhashable cells


def test_global_rank_matches_single_partition_window(spark):
    """f1's distributed rank (range partition + offsets) must equal the
    trivially-correct single-partition window on arbitrary data with ties
    in the first key (the total order includes the id tiebreaker)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pcd_spark.relational.queries import global_rank

    rows = [(i, (i * 37) % 11) for i in range(500)]  # many ties in v
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    got = {
        r["id"]: r["rn"]
        for r in global_rank(df, [F.desc("v"), F.asc("id")]).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_v9_sq8_recall_vs_exact(spark, sf_dir):
    """V9 quality pin: SQ8 is near-lossless at 64 dims (8 bits/dim keeps
    ~2 decimal digits per coordinate), so its top-3 must agree with the
    exact float top-3 at id level almost everywhere — recall@3 >= 0.8
    (measured 0.933 on this fixture; the one miss is a genuine boundary
    pair whose exact cosines differ by < the quantization noise floor)."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    X = np.array(t["embedding"].tolist(), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    norms = np.linalg.norm(X, axis=1)
    exact = {}
    for p in range(5):
        cos = (X @ X[p]) / (norms * norms[p])
        cos[p] = -2.0
        top = np.argsort(np.round(cos, 6) * -1, kind="stable")[:3]
        exact[p] = set(int(i) for i in ids[top])

    got: dict[int, set] = {}
    for r in REGISTRY["v9_sq8_topk"]["spark"](spark, sf_dir).collect():
        got.setdefault(r["probe_id"], set()).add(r["cand_id"])
    hits = sum(len(got[p] & exact[p]) for p in range(5))
    assert all(len(got[p]) == 3 for p in range(5)), got
    assert hits / 15 >= 0.8, (hits / 15, got, exact)


def test_k39_triad_motifs_match_bruteforce(spark, sf_dir):
    """K39 vs an independent pure-python brute force over the same directed
    precedence edge set (successor-set walk, cycles canonicalized at the
    smallest vertex) — guards against the SQL oracle and the Spark plan
    sharing a conceptual miscount."""
    import duckdb as _d

    con = _d.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    edges = set(
        con.execute(
            """SELECT DISTINCT a.l_partkey, b.l_partkey
               FROM lineitem a JOIN lineitem b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_linenumber < b.l_linenumber
                AND a.l_partkey <> b.l_partkey"""
        ).fetchall()
    )
    succ: dict[int, set] = {}
    for u, v in edges:
        succ.setdefault(u, set()).add(v)
    cyc = tr = 0
    for u, v in edges:
        for w in succ.get(v, ()):
            if w != u and (u, w) in edges:
                tr += 1
            if u < v and w > u and (w, u) in edges:
                cyc += 1
    row = REGISTRY["k39_triad_motifs"]["spark"](spark, sf_dir).first()
    assert (row["n_cyclic"], row["n_transitive"]) == (cyc, tr)
    assert abs(row["frac_transitive"] - round(tr / (cyc + tr), 6)) < 1e-9
