"""Corpus + K8 edge-derivation tests (SURVEY.md §5.3.4, FIXTURES.md §1-2).

The edge pipeline is validated against an independent pure-Python oracle
(re + dict resolution) on the full tiny corpus, and the sha256 per-row
invariant (BASELINE.json:15) against hashlib.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from pcd_spark.corpus import (
    synth_corpus,
    with_sha,
    latest_commits,
    derive_edges,
)


@pytest.fixture(scope="module")
def corpus(spark):
    df = synth_corpus(spark, repos=10, files_per_repo=30, seed=42).persist()
    df.count()
    return df


def test_corpus_shape_and_determinism(spark, corpus):
    rows = corpus.count()
    assert rows >= 300  # 300 files + ~5% second commits
    assert corpus.columns == ["repo", "path", "commit", "lang", "content"]
    # regenerating at a different parallelism yields identical rows
    again = synth_corpus(spark, repos=10, files_per_repo=30, seed=42, num_parts=2)
    a = sorted(map(tuple, corpus.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_sha256_per_row_invariant(corpus):
    """F.sha2(content, 256) == hashlib.sha256 for every row."""
    for r in with_sha(corpus).collect():
        assert r["content_sha"] == hashlib.sha256(r["content"].encode()).hexdigest()


def _python_oracle_edges(rows):
    """Independent reimplementation of K8 on collected rows."""
    # latest commit per (repo, path): lexicographically greatest commit
    latest = {}
    for r in rows:
        key = (r["repo"], r["path"])
        if key not in latest or r["commit"] > latest[key]["commit"]:
            latest[key] = r
    # vids: row_number over sorted (repo, path), 0-based
    keys = sorted(latest)
    vid = {k: i for i, k in enumerate(keys)}
    # module index: module -> {repo: (repo, vid)}
    mod_index = {}
    for (repo, path), i in ((k, vid[k]) for k in keys):
        m = re.sub(r"\.(py|js)$", "", path).replace("/", ".")
        mod_index.setdefault(m, []).append((repo, i))
    edges = {}
    for key in keys:
        r = latest[key]
        src = vid[key]
        if r["lang"] == "python":
            mods = re.findall(r"(?m)^from\s+([\w\.]+)\s+import", r["content"])
            mods += re.findall(r"(?m)^import\s+([\w\.]+)", r["content"])
        else:
            mods = [
                re.sub(r"\.(py|js)$", "", m).replace("/", ".")
                for m in re.findall(r"require\('\./([\w/\.]+)'\)", r["content"])
            ]
        for m in mods:
            cands = mod_index.get(m)
            if not cands:
                continue  # unresolved
            same = [c for c in cands if c[0] == r["repo"]]
            pool = same if same else cands
            dst = min(pool)[1]  # smallest (repo, vid)
            if dst != src:
                edges[(src, dst)] = edges.get((src, dst), 0) + 1
    return edges


def test_derive_edges_matches_python_oracle(corpus):
    verts, edges = derive_edges(corpus, deterministic_dense_ids=True)
    got = {
        (r["src"], r["dst"]): int(r["weight"]) for r in edges.collect()
    }
    want = _python_oracle_edges(corpus.collect())
    assert got == want
    assert len(got) > 100  # the planted graph is dense enough to be meaningful


def test_hashed_default_isomorphic_to_dense(corpus):
    """The DEFAULT (hashed-vid) derivation yields the same graph as the
    dense-id fixture path up to the (repo, path) -> vid relabeling, and
    contains no single-partition window in its plan."""
    dv, de = derive_edges(corpus, deterministic_dense_ids=True)
    hv, he = derive_edges(corpus)

    dmap = {(r["repo"], r["path"]): r["vid"] for r in dv.collect()}
    hmap = {(r["repo"], r["path"]): r["vid"] for r in hv.collect()}
    assert set(dmap) == set(hmap)
    to_dense = {hmap[k]: dmap[k] for k in hmap}

    dense_edges = {(r["src"], r["dst"]): int(r["weight"]) for r in de.collect()}
    hashed_edges = {
        (to_dense[r["src"]], to_dense[r["dst"]]): int(r["weight"])
        for r in he.collect()
    }
    assert hashed_edges == dense_edges

    # plan audit: no global (partition-less) window on the default path
    plan = he._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan or "SinglePartition" not in plan, plan


def test_latest_commit_dedup(corpus):
    latest = latest_commits(corpus)
    assert latest.count() == 300  # one row per (repo, path)
    dup = latest.groupBy("repo", "path").count().filter("count > 1").count()
    assert dup == 0


def test_vertex_ids_dense_and_deterministic(corpus):
    verts, _ = derive_edges(corpus, deterministic_dense_ids=True)
    ids = sorted(r["vid"] for r in verts.collect())
    assert ids == list(range(300))


def test_hashed_vids_deterministic_no_collisions(spark, corpus):
    from pcd_spark.corpus import vertex_dictionary_hashed

    v1, c1 = vertex_dictionary_hashed(corpus)
    v2, c2 = vertex_dictionary_hashed(corpus.repartition(7))
    assert c1 == 0 and c2 == 0
    a = sorted(map(tuple, v1.collect()))
    b = sorted(map(tuple, v2.collect()))
    assert a == b  # partition-invariant, sort-free id assignment


def test_corpus_table_snapshots(spark, corpus, tmp_path):
    from pcd_spark.storage import CorpusTable

    t = CorpusTable(str(tmp_path / "corpus_tbl"), partition_by="lang")
    s0 = t.commit(corpus, note="initial")
    s1 = t.commit(corpus.filter("lang = 'python'"), note="python only")
    assert (s0, s1) == (0, 1)
    assert t.read(spark).count() < t.read(spark, 0).count()
    assert t.read(spark, 0).count() == corpus.count()
    # snapshot log survives and is ordered
    assert [s["id"] for s in t.snapshots()] == [0, 1]


def test_udtf_extractor_matches_regex_path(spark):
    """J5 UDTF and H2 JVM-regex extraction must produce the same multiset of
    (repo, path, module) rows on the synthetic corpus."""
    from pcd_spark.corpus import (
        extract_imports,
        extract_imports_udtf,
        latest_commits,
        synth_corpus,
    )

    latest = latest_commits(synth_corpus(spark, repos=5, files_per_repo=20, seed=7))
    a = sorted(map(tuple, extract_imports(latest).collect()))
    b = sorted(map(tuple, extract_imports_udtf(latest).collect()))
    assert a == b and len(a) > 0


# ---- A1b/A3b sources: enforced-schema readers -------------------------------


def test_read_csv_edges_enforced_schema(spark, tmp_path):
    from pcd_spark.graph.edges import read_csv_edges

    p = tmp_path / "edges.csv"
    p.write_text("0,1\n1,2\n2,0\n")
    rows = sorted(
        (r["src"], r["dst"]) for r in read_csv_edges(spark, str(p)).collect()
    )
    assert rows == [(0, 1), (1, 2), (2, 0)]
    pw = tmp_path / "weighted.tsv"
    pw.write_text("0\t1\t0.5\n1\t2\t2.0\n")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in read_csv_edges(
            spark, str(pw), weight=True, delimiter="\t"
        ).collect()
    }
    assert got == {(0, 1): 0.5, (1, 2): 2.0}


def test_read_csv_edges_failfast_on_malformed(spark, tmp_path):
    from pcd_spark.graph.edges import read_csv_edges

    p = tmp_path / "bad.csv"
    p.write_text("0,1\nnot_a_vertex,2\n")
    with pytest.raises(Exception):  # Spark wraps the FAILFAST parse error
        read_csv_edges(spark, str(p)).collect()


def test_read_jsonl_corpus_schema_and_sha_invariant(spark, tmp_path):
    """Schema projection (extra keys ignored, missing keys null) and the
    per-row invariant: sha256(content) survives the JSON round trip."""
    import hashlib
    import json as _json

    from pcd_spark.corpus import read_jsonl_corpus, with_sha

    recs = [
        {"repo": "r1", "path": "a.py", "commit": "c1", "lang": "py",
         "content": "import os\n", "extra_key": 42},
        {"repo": "r1", "path": "b.py", "commit": "c1", "lang": "py",
         "content": "x = 1\n"},
        {"repo": "r2", "path": "c.py", "commit": "c9", "lang": "py"},
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(_json.dumps(r) for r in recs) + "\n")
    df = read_jsonl_corpus(spark, str(p))
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    got = {r["path"]: r for r in df.collect()}
    assert got["c.py"]["content"] is None
    shas = {
        r["path"]: r["content_sha"]
        for r in with_sha(df.fillna({"content": ""})).collect()
    }
    for rec in recs:
        want = hashlib.sha256(rec.get("content", "").encode()).hexdigest()
        assert shas[rec["path"]] == want


def test_read_jsonl_corpus_corrupt_policies(spark, tmp_path):
    from pcd_spark.corpus import read_jsonl_corpus

    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"repo":"r","path":"a","commit":"c","lang":"py","content":"ok"}\n'
        "this is not json\n"
    )
    rows = read_jsonl_corpus(spark, str(p), strict=False).collect()
    flags = sorted((r["path"] or "?", r["is_corrupt"]) for r in rows)
    assert flags == [("?", True), ("a", False)]
    with pytest.raises(Exception):
        read_jsonl_corpus(spark, str(p), strict=True).collect()


# ---- K8b: derive_graph + incremental derivation ---------------------------


def _edge_set(df):
    return sorted((r["src"], r["dst"], r["weight"]) for r in df.collect())


def test_derive_graph_edges_identical_to_derive_edges(corpus):
    from pcd_spark.corpus import derive_graph

    _, e_full = derive_edges(corpus)
    g = derive_graph(corpus)
    assert _edge_set(g.edges) == _edge_set(e_full)
    # narrow state invariants: no content column anywhere
    for df in g:
        assert "content" not in df.columns
    # files ledger: exactly one row per (repo, path)
    files = g.files.collect()
    assert len({(r["repo"], r["path"]) for r in files}) == len(files)


def test_incremental_derivation_equals_cold_recompute(spark):
    """The K8b contract: incremental(prev, delta) == derive_graph(end), on a
    delta that exercises every affected-set rule at once:
      - a brand-new repo importing an existing module (new vertex + edge)
      - a re-commit changing a file's imports (out-edges replaced)
      - a SHADOWING file: r1 gains util.py, so r1/app.py's import of
        'util' must flip from the cross-repo r2 target to the same-repo one
        even though r1/app.py itself is NOT in the delta
      - an out-of-order append (older commit id) that must be ignored
    """
    from pcd_spark.corpus import (
        CORPUS_SCHEMA,
        derive_edges_incremental,
        derive_graph,
    )

    base = [
        ("r1", "app.py", "c10", "python", "import util\nimport helper\n"),
        ("r1", "helper.py", "c10", "python", "x = 1\n"),
        ("r2", "util.py", "c10", "python", "y = 2\n"),
        ("r2", "main.py", "c10", "python", "import util\n"),
    ]
    delta = [
        # new repo, imports existing cross-repo module
        ("r3", "new.py", "c20", "python", "import util\nimport util\n"),
        # re-commit: main.py now also imports helper (cross-repo)
        ("r2", "main.py", "c20", "python", "import util\nimport helper\n"),
        # shadowing: r1 gains its own util.py
        ("r1", "util.py", "c20", "python", "z = 3\n"),
        # out-of-order: an OLDER commit of app.py must be ignored
        ("r1", "app.py", "c05", "python", "import nothing_at_all\n"),
    ]
    df_base = spark.createDataFrame(base, CORPUS_SCHEMA)
    df_delta = spark.createDataFrame(delta, CORPUS_SCHEMA)
    df_end = df_base.unionByName(df_delta)

    prev = derive_graph(df_base)
    inc = derive_edges_incremental(prev, df_delta)
    cold = derive_graph(df_end)

    vmap = {(r["repo"], r["path"]): r["vid"] for r in inc.verts.collect()}
    vmap_cold = {(r["repo"], r["path"]): r["vid"] for r in cold.verts.collect()}
    assert vmap == vmap_cold
    assert _edge_set(inc.edges) == _edge_set(cold.edges)
    assert sorted(map(tuple, inc.imports.collect())) == sorted(
        map(tuple, cold.imports.collect())
    )
    assert sorted(map(tuple, inc.files.collect())) == sorted(
        map(tuple, cold.files.collect())
    )

    # the shadow flip actually happened: r1/app.py -> r1/util.py now
    e = {(s, d): w for s, d, w in _edge_set(inc.edges)}
    assert (vmap[("r1", "app.py")], vmap[("r1", "util.py")]) in e
    assert (vmap[("r1", "app.py")], vmap[("r2", "util.py")]) not in e
    # re-commit replaced main.py's out-edges (util stays, helper added)
    assert (vmap[("r2", "main.py")], vmap[("r1", "helper.py")]) in e
    # new file's duplicate import statements became weight 2 (its 'util'
    # resolves to r1's copy: no same-repo match, then smallest repo wins)
    assert e[(vmap[("r3", "new.py")], vmap[("r1", "util.py")])] == 2.0
    # out-of-order append ignored: app.py kept its c10 imports
    files = {(r["repo"], r["path"]): r["commit"] for r in inc.files.collect()}
    assert files[("r1", "app.py")] == "c10"


def test_incremental_derivation_on_synth_corpus(spark, corpus):
    """Property-flavored check on the generated corpus: split the second
    commits off as the delta; incremental == cold on the full corpus."""
    from pcd_spark.corpus import derive_edges_incremental, derive_graph
    import pyspark.sql.functions as F

    # base snapshot = first commit per file; delta = everything else
    from pcd_spark.corpus import latest_commits as _lc
    from pyspark.sql import Window

    w = Window.partitionBy("repo", "path").orderBy(F.asc("commit"))
    tagged = corpus.withColumn("rn", F.row_number().over(w))
    df_base = tagged.filter("rn = 1").drop("rn")
    df_delta = tagged.filter("rn > 1").drop("rn")
    assert df_delta.count() > 0  # the fixture plants ~5% second commits

    prev = derive_graph(df_base)
    inc = derive_edges_incremental(prev, df_delta)
    cold = derive_graph(corpus)
    assert _edge_set(inc.edges) == _edge_set(cold.edges)
    assert sorted(map(tuple, inc.verts.collect())) == sorted(
        map(tuple, cold.verts.collect())
    )
