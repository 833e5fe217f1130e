"""Corpus table + K8 edge derivation (SURVEY.md §2 K8, FIXTURES.md §1-2).

Input shape is the BASELINE.json:15 mandate:
    (repo:string, path:string, commit:string, lang:string, content:string)
stored as Iceberg in prod, Parquet locally (storage adapter, SURVEY §0.4).

The derivation pipeline (corpus → edge table) is pure DataFrame ops:
    sha2(content)                         H1  per-row invariant
    latest commit per (repo,path)         E1  window dedup
    dense deterministic vids              E1  row_number over sorted (repo,path)
    import extraction per lang            H2  regexp_extract_all (JVM regex, no UDF)
    module resolution                     C1  join against module index,
                                              same-repo preference via window
    unresolved imports dropped            C6  (anti-join semantics via inner join miss)
    weight = #import statements src→dst   D1

Synthetic corpus generation is a seeded, partition-invariant mapInPandas
(vectorized; per-row seed derived from file id so output is identical at any
parallelism). Content plants a known community structure: 85% intra-repo
imports, rest cross-repo biased to low repo ids (hubs → exercises salting);
1% of imports reference a nonexistent module (unresolved path).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


# ---------------------------------------------------------------------------
# synthetic corpus (FIXTURES.md §1)
# ---------------------------------------------------------------------------

def _gen_batch(ids: np.ndarray, repos: int, files_per_repo: int, seed: int) -> pd.DataFrame:
    rows = []
    for fid in ids:
        rng = np.random.RandomState((seed * 1_000_003 + int(fid)) % (2**31 - 1))
        r = int(fid) // files_per_repo
        f = int(fid) % files_per_repo
        repo = f"repo{r:03d}"
        pkg, mod = f // 10, f % 10
        lang = "python" if rng.rand() < 0.9 else "javascript"
        ext = "py" if lang == "python" else "js"
        path = f"pkg{pkg}/mod{mod}.{ext}"

        k = rng.randint(2, 7)  # imports per file
        lines = []
        for _ in range(k):
            if rng.rand() < 0.01:  # unresolved import
                tp, tm, tr = 999, 999, r
            elif rng.rand() < 0.85:  # intra-repo
                tf = rng.randint(0, files_per_repo)
                tp, tm, tr = tf // 10, tf % 10, r
            else:  # cross-repo, biased to low repo ids (hubs)
                tr = int(repos * rng.rand() ** 3) % repos
                tf = rng.randint(0, files_per_repo)
                tp, tm = tf // 10, tf % 10
            if lang == "python":
                if rng.rand() < 0.5:
                    lines.append(f"from pkg{tp}.mod{tm} import thing")
                else:
                    lines.append(f"import pkg{tp}.mod{tm}")
            else:
                lines.append(f"const m{_} = require('./pkg{tp}/mod{tm}');")
            _ = tr  # target repo is implicit: resolution prefers same repo
        header = (
            f"# synthetic module {repo}/{path}"
            if lang == "python"
            else f"// synthetic module {repo}/{path}"
        )
        filler = [
            f"def f{j}(): return {rng.randint(0, 1000)}"
            if lang == "python"
            else f"function f{j}() {{ return {rng.randint(0, 1000)}; }}"
            for j in range(3)
        ]
        content = "\n".join([header, *lines, *filler])
        commit = f"{rng.randint(0, 2**31):08x}{rng.randint(0, 2**31):08x}"
        rows.append((repo, path, commit, lang, content))
        if rng.rand() < 0.05:  # second, older commit for 5% of files (E1 dedup)
            commit2 = f"{rng.randint(0, 2**31):08x}{rng.randint(0, 2**31):08x}"
            rows.append((repo, path, commit2, lang, content + "\n# older revision"))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synth_corpus(
    spark: SparkSession,
    repos: int = 20,
    files_per_repo: int = 50,
    seed: int = 42,
    num_parts: int | None = None,
) -> DataFrame:
    """Deterministic synthetic corpus; identical output at any parallelism."""
    n = repos * files_per_repo
    p = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = spark.range(0, n, 1, min(p, max(1, n // 100 + 1)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].values, repos, files_per_repo, seed)

    return base.mapInPandas(gen, CORPUS_SCHEMA)


# ---------------------------------------------------------------------------
# K8: corpus → (vertices, edges)
# ---------------------------------------------------------------------------

_PY_FROM = r"(?m)^from\s+([\w\.]+)\s+import"
_PY_IMPORT = r"(?m)^import\s+([\w\.]+)"
_JS_REQUIRE = r"require\('\./([\w/\.]+)'\)"


def with_sha(corpus: DataFrame) -> DataFrame:
    """H1: the per-row invariant column (BASELINE.json:15)."""
    return corpus.withColumn("content_sha", F.sha2(F.col("content"), 256))


def latest_commits(corpus: DataFrame) -> DataFrame:
    """E1: keep the latest commit per (repo, path); 'latest' pinned as the
    lexicographically greatest commit id (deterministic at any parallelism)."""
    w = Window.partitionBy("repo", "path").orderBy(F.desc("commit"))
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def vertex_dictionary(corpus: DataFrame) -> DataFrame:
    """Dense deterministic vids: row_number over globally sorted (repo, path).

    FIXTURE-ONLY path (derive_edges deterministic_dense_ids=True): the
    no-partitionBy window is a single-partition global sort — a scale hazard
    at 10^12 files. The default is vertex_dictionary_prod (xxhash64 +
    collision audit; SURVEY §7.3 item 5).
    """
    w = Window.orderBy("repo", "path")
    return (
        corpus.select("repo", "path").distinct()
        .withColumn("vid", F.row_number().over(w).cast("long") - 1)
        .select("vid", "repo", "path")
    )


def _module_expr():
    """path 'pkg3/mod7.py' -> dotted module 'pkg3.mod7'."""
    return F.regexp_replace(
        F.regexp_replace(F.col("path"), r"\.(py|js)$", ""), "/", "."
    )


def extract_imports(corpus: DataFrame) -> DataFrame:
    """H2: per-lang import targets as dotted module names.
    Returns (repo, path, module) — one row per import STATEMENT (duplicates
    kept; they become edge weight)."""
    py = F.concat(
        F.regexp_extract_all(F.col("content"), F.lit(_PY_FROM), F.lit(1)),
        F.regexp_extract_all(F.col("content"), F.lit(_PY_IMPORT), F.lit(1)),
    )
    js = F.transform(
        F.regexp_extract_all(F.col("content"), F.lit(_JS_REQUIRE), F.lit(1)),
        lambda m: F.regexp_replace(F.regexp_replace(m, r"\.(py|js)$", ""), "/", "."),
    )
    mods = F.when(F.col("lang") == "python", py).otherwise(js)
    return corpus.select(
        "repo", "path", F.explode(mods).alias("module")
    )


def derive_edges(
    corpus: DataFrame, deterministic_dense_ids: bool = False
) -> tuple[DataFrame, DataFrame]:
    """K8 pipeline. Returns (vertices, edges).

    vertices: (vid, repo, path)
    edges:    (src, dst, weight) — directed import graph, self-edges dropped,
              unresolved imports dropped; resolution prefers a same-repo
              module, then the smallest repo owning it (deterministic; the
              winner never depends on vid values — module names are unique
              within a repo — so both vid schemes yield the same graph up to
              the (repo, path) -> vid relabeling, asserted in tests).

    DEFAULT vid assignment is the prod-scale one: vid = xxhash64(repo, path)
    with a collision audit + deterministic salted re-hash
    (vertex_dictionary_prod) — embarrassingly parallel, no global sort.
    deterministic_dense_ids=True switches to row_number over sorted
    (repo, path): dense 0..V-1 ids for fixtures/oracles, but a
    single-partition global sort — round 1 shipped THIS as the default and
    it was the first scale-killer on the bench (41.5 s for 20k files).
    """
    # persisted: latest_commits is a window over the FULL corpus rows
    # (content rides the shuffle) and is consumed by the vid dictionary's
    # collision audit, the module index, AND the import extraction — left
    # lazy it re-runs that corpus-wide window once per consumer (measured
    # 3x ≈ +6 s on the 20k-file bench). Cached once, unpersisted below as
    # soon as the last content-consuming projection is materialized.
    latest = latest_commits(corpus).persist()
    if deterministic_dense_ids:
        verts = vertex_dictionary(latest).persist()
    else:
        verts = vertex_dictionary_prod(latest).persist()

    # module index: dotted module -> candidate (vid, repo)
    index = verts.select(
        "vid", "repo", _module_expr().alias("module")
    )

    imports = extract_imports(latest)
    # persisted: referenced by BOTH the distinct-pairs resolution input and
    # the final per-statement join — and it is the LAST consumer of the full
    # corpus scan, so caching this small (src, repo, module) projection (no
    # content column) caps the pipeline at two corpus scans total (vids +
    # imports) at any scale; round 1 re-scanned per reference instead.
    # Materialized EAGERLY so `latest` (the only cache still holding file
    # content) can be released before return instead of leaking for the
    # session — downstream (resolution + edge agg) reads only this narrow
    # cached projection and the O(V) verts cache.
    src_side = (
        imports.join(
            verts.select(F.col("vid").alias("src"), "repo", "path"),
            ["repo", "path"],
        )
        .select("src", F.col("repo").alias("src_repo"), "module")
        .persist()
    )
    src_side.count()
    latest.unpersist()

    edges = _resolve_edges(src_side, index)
    return verts, edges


def _resolve_edges(src_side: DataFrame, index: DataFrame) -> DataFrame:
    """Shared K8 resolution kernel: per-statement imports
    (src, src_repo, module) × module index (vid, repo, module) →
    weighted directed edges (src, dst, weight).

    Resolution winner depends only on (src_repo, module) — resolve once on
    the distinct pairs, then join the per-statement rows back (keeps
    duplicate statements for weighting without window-over-duplicates).
    Used by both the full derivation (derive_edges / derive_graph) and the
    incremental one (derive_edges_incremental), so the two paths can never
    drift on the preference rule."""
    pairs = src_side.select("src_repo", "module").distinct()
    cand = pairs.join(
        index.select(
            F.col("vid").alias("dst"),
            F.col("repo").alias("dst_repo"),
            "module",
        ),
        "module",
    )
    # prefer same-repo target, then smallest (repo, vid) — deterministic
    w = Window.partitionBy("src_repo", "module").orderBy(
        F.desc(F.col("src_repo") == F.col("dst_repo")),
        F.asc("dst_repo"),
        F.asc("dst"),
    )
    res_map = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("src_repo", "module", "dst")
    )
    resolved = src_side.join(res_map, ["src_repo", "module"]).select("src", "dst")
    return (
        resolved.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


class DerivedGraph(NamedTuple):
    """K8b durable graph state — what a production deployment keeps between
    corpus snapshots so the NEXT snapshot is processed incrementally
    (A13 `CorpusTable.read_appended` supplies the delta).

    All four tables are NARROW (no `content` column): at 100 TB of corpus,
    this state is O(files + edges + import statements) of metadata — the
    only thing that ever scans content is the delta itself.

    verts:   (vid, repo, path)        — vid = xxhash64(repo, path), stable
                                        across snapshots by construction
    edges:   (src, dst, weight)       — the K8 import graph
    imports: (repo, path, module)     — one row per latest-commit import
                                        statement (duplicates = weight)
    files:   (repo, path, commit)     — latest commit per file; the
                                        monotonicity ledger the incremental
                                        path compares deltas against
    """

    verts: DataFrame
    edges: DataFrame
    imports: DataFrame
    files: DataFrame


def derive_graph(corpus: DataFrame) -> DerivedGraph:
    """K8b: full derivation returning the durable state (DerivedGraph) that
    derive_edges_incremental consumes. Edge/vertex output is identical to
    `derive_edges(corpus)` (pinned in tests) — this variant additionally
    surfaces the narrow `imports` and `files` tables a deployment persists
    alongside the graph."""
    latest = latest_commits(corpus).persist()
    verts = vertex_dictionary_prod(latest)
    index = verts.select("vid", "repo", _module_expr().alias("module"))
    imports = extract_imports(latest).persist()
    files = latest.select("repo", "path", "commit").persist()
    # materialize the two content-derived projections, then release the
    # full-corpus cache (same discipline as derive_edges)
    imports.count()
    files.count()
    latest.unpersist()
    src_side = imports.join(
        verts.select(F.col("vid").alias("src"), "repo", "path"),
        ["repo", "path"],
    ).select("src", F.col("repo").alias("src_repo"), "module")
    edges = _resolve_edges(src_side, index)
    # same eager-output + release discipline as derive_edges_incremental:
    # callers (k8b query, the I12 streaming bootstrap) may invoke this
    # repeatedly in one session, so nothing persisted may outlive the call
    out = DerivedGraph(
        verts=verts.localCheckpoint(eager=True),
        edges=edges.localCheckpoint(eager=True),
        imports=imports.localCheckpoint(eager=True),
        files=files.localCheckpoint(eager=True),
    )
    for cached in (verts, imports, files):
        cached.unpersist()
    return out


def derive_edges_incremental(
    prev: DerivedGraph,
    corpus_delta: DataFrame,
    max_rounds: int = 4,
    stats_out: dict | None = None,
) -> DerivedGraph:
    """K8b incremental edge derivation: update the durable graph state from
    an A13 snapshot delta (`CorpusTable.read_appended`) WITHOUT rescanning
    the old corpus.

    This is the batch-snapshot twin of the A6/I7 streaming loop and the
    whole point of keeping DerivedGraph narrow: at 10^12 files, a daily
    append of 10^8 rows costs one scan of the APPENDED content plus
    metadata-sized joins — never a scan of the 100 TB already processed.

    Correctness rule (pinned equal to a cold `derive_graph` on the end
    snapshot in tests):
      1. A delta row wins over the ledger only if its commit is strictly
         later under the engine's E1 rule (lexicographically greatest
         commit per (repo, path)); out-of-order appends are ignored exactly
         as latest_commits would ignore them.
      2. Brand-new files get xxhash64 vids; on (astronomically rare)
         collision they are salted-rehashed while PREVIOUS vids stay fixed
         — vid stability across snapshots is the contract that lets edges
         and algorithm checkpoints survive the append (pagerank resume).
      3. Out-edges are recomputed for every AFFECTED source file: files in
         the delta, plus files with ≥1 import statement on a module whose
         candidate set changed (a new file adds an index entry and may
         shadow a previously cross-repo resolution — the same-repo
         preference can flip). Everything else keeps its previous edges.

    Scale shape: one O(delta) window, one O(delta) regex extraction, and a
    handful of hash joins keyed on (repo, path) / module / vid over the
    narrow state tables. No content column ever crosses a shuffle.
    """
    delta_latest = latest_commits(corpus_delta)
    take = (
        delta_latest.join(
            prev.files.select(
                "repo", "path", F.col("commit").alias("_prev_commit")
            ),
            ["repo", "path"],
            "left",
        )
        .filter(
            F.col("_prev_commit").isNull()
            | (F.col("commit") > F.col("_prev_commit"))
        )
        .persist()
    )
    new_files = take.filter(F.col("_prev_commit").isNull()).select("repo", "path")
    affected = take.select("repo", "path")  # one row per file (E1 window)

    # vids for brand-new files: xxhash64, salted re-hash on collision —
    # with prev.verts held FIXED (stability contract, docstring item 2)
    newv = new_files.select(
        F.xxhash64("repo", "path").alias("vid"), "repo", "path"
    ).persist()
    for rnd in range(1, max_rounds + 1):
        dup_within = (
            newv.groupBy("vid").count().filter(F.col("count") > 1).select("vid")
        )
        dup_prev = newv.join(prev.verts.select("vid"), "vid", "left_semi").select(
            "vid"
        )
        bad = dup_within.unionByName(dup_prev).distinct()
        if bad.isEmpty():
            break
        clean = newv.join(bad, "vid", "left_anti")
        redo = newv.join(bad, "vid", "left_semi").select(
            F.xxhash64("repo", "path", F.lit(rnd)).alias("vid"), "repo", "path"
        )
        newv = clean.unionByName(redo).persist()
    else:
        raise RuntimeError(
            f"derive_edges_incremental: vid collisions persisted after "
            f"{max_rounds} salted re-hash rounds (astronomically unlikely; "
            "check input)"
        )
    verts = prev.verts.unionByName(newv).persist()

    # durable narrow-state update: replace affected files' statements/ledger
    imports = (
        prev.imports.join(affected, ["repo", "path"], "left_anti")
        .unionByName(
            extract_imports(
                take.select("repo", "path", "commit", "lang", "content")
            )
        )
        .persist()
    )
    files = prev.files.join(affected, ["repo", "path"], "left_anti").unionByName(
        take.select("repo", "path", "commit")
    )

    # modules whose candidate set changed: only NEW files add index entries
    # (module name is a pure function of path, so a re-commit changes
    # nothing index-side)
    shadow = newv.select(_module_expr().alias("module")).distinct()
    resolve_src = (
        affected.unionByName(
            imports.join(shadow, "module", "left_semi").select("repo", "path")
        )
        .distinct()
        .persist()
    )

    index = verts.select("vid", "repo", _module_expr().alias("module"))
    stmts = imports.join(resolve_src, ["repo", "path"], "left_semi")
    src_side = stmts.join(
        verts.select(F.col("vid").alias("src"), "repo", "path"),
        ["repo", "path"],
    ).select("src", F.col("repo").alias("src_repo"), "module")
    new_edges = _resolve_edges(src_side, index)
    kept = prev.edges.join(
        resolve_src.join(verts, ["repo", "path"]).select(
            F.col("vid").alias("src")
        ),
        "src",
        "left_anti",
    )
    edges = kept.unionByName(new_edges)
    # Eagerly cut the outputs loose from the persisted intermediates, then
    # RELEASE those caches — this function runs once per micro-batch in the
    # streaming loop (ingest.start_corpus_ingestion), so a per-invocation
    # cache leak would accumulate for the session lifetime (the exact
    # pattern ADVICE r2 flagged on bipartite_projection). localCheckpoint
    # also truncates lineage so state never chains across batches.
    out = DerivedGraph(
        verts=verts.localCheckpoint(eager=True),
        edges=edges.localCheckpoint(eager=True),
        imports=imports.localCheckpoint(eager=True),
        files=files.localCheckpoint(eager=True),
    )
    if stats_out is not None:
        stats_out["files_updated"] = take.count()
        stats_out["new_files"] = newv.count()
    for cached in (take, newv, verts, imports, resolve_src):
        cached.unpersist()
    return out


def vertex_dictionary_hashed(corpus: DataFrame) -> tuple[DataFrame, int]:
    """Prod-scale vid assignment (SURVEY §7.3 item 5): vid = xxhash64(repo,
    path) — no global sort, no row_number, embarrassingly parallel at 10^12
    files; deterministic across runs and partitionings.

    Returns (vertices, n_collisions). A collision audit is part of the
    contract: 64-bit hashing over 10^12 keys has ~2.7% birthday-bound
    collision odds overall, so callers must check and fall back to a salted
    re-hash of the colliding keys (audit is one groupBy, cheap next to the
    scan). At sandbox scale collisions are effectively impossible but the
    audit path is exercised in tests.
    """
    verts = (
        corpus.select("repo", "path").distinct()
        .select(F.xxhash64("repo", "path").alias("vid"), "repo", "path")
    )
    collisions = (
        verts.groupBy("vid").count().filter(F.col("count") > 1).count()
    )
    return verts, int(collisions)


def vertex_dictionary_prod(corpus: DataFrame, max_rounds: int = 4) -> DataFrame:
    """The DEFAULT vid assignment: xxhash64 vids with the collision audit
    folded in. Colliding groups are deterministically re-hashed with the
    round number as salt — xxhash64(repo, path, round) — and the global
    audit repeats, so a salted vid that lands on an existing one is caught
    next round. Every step is a pure function of (repo, path), so ids are
    identical at any parallelism. The audit is one O(V) groupBy per round;
    round 2+ only ever runs on an actual 64-bit collision (~2.7% odds that
    ANY pair collides at 10^12 keys; certain to be rare enough that the
    re-hash set is tiny)."""
    cur = (
        corpus.select("repo", "path").distinct()
        .select(F.xxhash64("repo", "path").alias("vid"), "repo", "path")
        .persist()
    )
    for rnd in range(1, max_rounds + 1):
        dup = cur.groupBy("vid").count().filter(F.col("count") > 1).select("vid")
        if dup.isEmpty():
            return cur
        clean = cur.join(dup, "vid", "left_anti")
        redo = cur.join(dup, "vid", "left_semi").select(
            F.xxhash64("repo", "path", F.lit(rnd)).alias("vid"), "repo", "path"
        )
        cur = clean.unionByName(redo).persist()
    raise RuntimeError(
        f"vertex_dictionary_prod: collisions persisted after {max_rounds} "
        "salted re-hash rounds (astronomically unlikely; check input)"
    )


def extract_imports_udtf(corpus: DataFrame) -> DataFrame:
    """J5: Python UDTF import extractor — the extensibility seam for
    languages where a single regex isn't enough (parser-backed extraction).
    Arrow-transferred (useArrow) but still per-row eval, so the DEFAULT K8
    path stays extract_imports (JVM regexp_extract_all); this exists for
    parity of surface and must return the identical row multiset on the
    regex-expressible languages (tests/test_corpus.py).
    """
    import re

    from pyspark.sql.functions import udtf

    py_from, py_import, js_require = _PY_FROM, _PY_IMPORT, _JS_REQUIRE

    @udtf(returnType="module string", useArrow=True)
    class ImportExtractor:
        def eval(self, lang: str, content: str):
            if lang == "python":
                for m in re.finditer(py_from, content):
                    yield (m.group(1),)
                for m in re.finditer(py_import, content):
                    yield (m.group(1),)
            else:
                for m in re.finditer(js_require, content):
                    yield (re.sub(r"\.(py|js)$", "", m.group(1)).replace("/", "."),)

    spark = corpus.sparkSession
    spark.udtf.register("pcd_extract_imports", ImportExtractor)
    corpus.createOrReplaceTempView("_pcd_udtf_corpus")
    return spark.sql(
        """SELECT c.repo, c.path, t.module
           FROM _pcd_udtf_corpus c,
           LATERAL pcd_extract_imports(c.lang, c.content) t"""
    )


CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def read_jsonl_corpus(
    spark, path: str, strict: bool = True
):
    """A1b: JSON-lines corpus source with the canonical schema ENFORCED
    (BASELINE.json input_hint: repo/path/commit/lang/content, all string).

    No schema inference (an extra full pass at 10^12 files) and no silent
    row loss: strict=True (FAILFAST) fails the job on the first malformed
    line; strict=False routes malformed lines into a `_corrupt` column so
    a curation pipeline can quarantine-and-count them instead of dropping
    data — the two failure policies a production ingest actually uses.
    Extra JSON keys are ignored (schema projection), missing keys become
    nulls; both are per-row JVM work, no Python.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local, JVM exprs)

    if strict:
        return spark.read.schema(CORPUS_SCHEMA).option(
            "mode", "FAILFAST"
        ).json(path)
    df = spark.read.schema(
        CORPUS_SCHEMA + ", _corrupt string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt"
    ).json(path)
    return df.select(
        "repo", "path", "commit", "lang", "content",
        F.col("_corrupt").isNotNull().alias("is_corrupt"),
    )
