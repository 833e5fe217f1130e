"""spark-submit --py-files packaging smoke (SURVEY §7 M6, BASELINE north
rule "run via spark-submit --py-files on multi-executor clusters").

The deployment path a cluster user actually takes: zip the package, ship it
with --py-files, drive scripts/submit_job.py as the application. This is a
different import mechanism from every other test (executors resolve
pcd_spark from the zip on their PYTHONPATH, not from the repo checkout), so
it catches packaging regressions — a module the zip misses, an import that
only resolves from the source tree — that in-process tests cannot.

Runs in its own subprocess JVM on local[2]; asserts CC and condensation
outputs on hand-checkable graphs.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "pcd_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "pcd_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_cc_and_condense(tmp_path):
    zpath = _zip_package(tmp_path)
    snap = tmp_path / "g.txt"
    # two undirected triangles bridged 2-3, plus isolated edge 7-8
    snap.write_text(
        "# smoke graph\n0 1\n1 2\n0 2\n3 4\n4 5\n3 5\n2 3\n7 8\n"
    )
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}

    def submit(algo: str, out: str) -> None:
        cmd = [
            SPARK_SUBMIT, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--algo", algo, "--snap", str(snap), "--out", out,
        ]
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=str(tmp_path), timeout=600)
        assert p.returncode == 0, p.stderr[-3000:]

    cc_out = str(tmp_path / "cc_out")
    submit("cc", cc_out)
    got = dict(duckdb.sql(
        f"SELECT vid, component FROM read_parquet('{cc_out}/*.parquet')"
    ).fetchall())
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 7: 7, 8: 7}

    # directed 2-cycle chain for the condensation path: {0,1} -> {2,3}
    snap.write_text("0 1\n1 0\n1 2\n2 3\n3 2\n")
    cd_out = str(tmp_path / "cd_out")
    submit("condense", cd_out)
    rows = duckdb.sql(
        f"SELECT vid, component, level FROM read_parquet('{cd_out}/*.parquet')"
    ).fetchall()
    assert sorted(rows) == [(0, 0, 0), (1, 0, 0), (2, 2, 1), (3, 2, 1)]


def test_submit_cli_matching_and_densest(tmp_path):
    """Drive the new --algo paths through the CLI as a plain python
    subprocess (the spark-submit packaging itself is covered above):
    matching on the bridged-triangles graph must be a perfect matching;
    densest on a planted clique must return exactly the clique."""
    snap = tmp_path / "g.txt"
    snap.write_text("0 1\n1 2\n0 2\n3 4\n4 5\n3 5\n2 3\n7 8\n")
    env = {**os.environ, "PYTHONPATH": REPO}

    def run(algo, out):
        cmd = [sys.executable, os.path.join(REPO, "scripts", "submit_job.py"),
               "--algo", algo, "--snap", str(snap), "--out", out]
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=str(tmp_path), timeout=600)
        assert p.returncode == 0, p.stderr[-3000:]

    m_out = str(tmp_path / "m_out")
    run("matching", m_out)
    rows = duckdb.sql(
        f"SELECT vid, matched, partner FROM read_parquet('{m_out}/*.parquet')"
    ).fetchall()
    partner = {v: p for v, _m, p in rows}
    assert all(m for _v, m, _p in rows)  # perfect matching on this graph
    assert all(partner[partner[v]] == v for v in partner)

    # K8 clique + pendant path
    import itertools
    lines = [f"{u} {v}" for u, v in itertools.combinations(range(8), 2)]
    lines += [f"{8+i} {8+i+1}" for i in range(5)] + ["0 8"]
    snap.write_text("\n".join(lines) + "\n")
    d_out = str(tmp_path / "d_out")
    run("densest", d_out)
    dens = sorted(v for v, _r, ind in duckdb.sql(
        f"SELECT vid, peel_round, in_densest FROM read_parquet('{d_out}/*.parquet')"
    ).fetchall() if ind)
    assert dens == list(range(8))


def test_submit_cli_leiden_onion_constraint(tmp_path):
    """Drive the fourth-batch --algo paths through the CLI: leiden on the
    bridged-triangles graph must find the two triangles (connected
    communities), onion must match the nx layer structure, constraint must
    produce the star closed forms."""
    snap = tmp_path / "g.txt"
    snap.write_text("0 1\n1 2\n0 2\n3 4\n4 5\n3 5\n2 3\n7 8\n")
    env = {**os.environ, "PYTHONPATH": REPO}

    def run(algo, out):
        cmd = [sys.executable, os.path.join(REPO, "scripts", "submit_job.py"),
               "--algo", algo, "--snap", str(snap), "--out", out]
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=str(tmp_path), timeout=600)
        assert p.returncode == 0, p.stderr[-3000:]

    l_out = str(tmp_path / "l_out")
    run("leiden", l_out)
    lab = dict(duckdb.sql(
        f"SELECT vid, label FROM read_parquet('{l_out}/*.parquet')"
    ).fetchall())
    assert lab[0] == lab[1] == lab[2] != lab[3]
    assert lab[3] == lab[4] == lab[5]
    assert lab[7] == lab[8] not in (lab[0], lab[3])

    o_out = str(tmp_path / "o_out")
    run("onion", o_out)
    import networkx as nx
    layers = dict(duckdb.sql(
        f"SELECT vid, layer FROM read_parquet('{o_out}/*.parquet')"
    ).fetchall())
    G = nx.Graph([(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3), (7, 8)])
    assert layers == nx.onion_layers(G)

    snap.write_text("0 1\n0 2\n0 3\n0 4\n0 5\n")  # star K1,5
    c_out = str(tmp_path / "c_out")
    run("constraint", c_out)
    cons = dict(duckdb.sql(
        f"SELECT vid, constraint_score FROM read_parquet('{c_out}/*.parquet')"
    ).fetchall())
    assert cons[0] == pytest.approx(0.2, abs=1e-9)
    assert all(cons[i] == pytest.approx(1.0, abs=1e-9) for i in range(1, 6))


def test_submit_cli_closeness_and_temporal(tmp_path):
    """Drive the fifth-batch --algo paths through the CLI: closeness must
    reproduce the hand-computed WF values on the bridged-triangles graph;
    temporal-reach must respect the time-blocked path (vertex 4 stays
    unreachable because its only interaction predates the arrival)."""
    env = {**os.environ, "PYTHONPATH": REPO}

    def run(algo, snap, out, *extra):
        cmd = [sys.executable, os.path.join(REPO, "scripts", "submit_job.py"),
               "--algo", algo, "--snap", str(snap), "--out", out, *extra]
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=str(tmp_path), timeout=600)
        assert p.returncode == 0, p.stderr[-3000:]

    snap = tmp_path / "g.txt"
    snap.write_text("0 1\n1 2\n0 2\n3 4\n4 5\n3 5\n2 3\n7 8\n")
    c_out = str(tmp_path / "c_out")
    run("closeness", snap, c_out, "--source", "0", "--source", "7")
    got = dict(duckdb.sql(
        f"SELECT vid, closeness FROM read_parquet('{c_out}/*.parquet')"
    ).fetchall())
    assert got == {0: 0.357143, 7: 0.142857}

    tsnap = tmp_path / "t.txt"
    tsnap.write_text("# temporal\n1 2 10\n2 3 5\n2 3 20\n3 4 15\n")
    t_out = str(tmp_path / "t_out")
    run("temporal-reach", tsnap, t_out, "--source", "1", "--k", "3")
    rows = sorted(duckdb.sql(
        f"SELECT root, vid, arrival FROM read_parquet('{t_out}/*.parquet')"
    ).fetchall())
    assert rows == [(1, 1, -1), (1, 2, 10), (1, 3, 20)]


def test_submit_cli_simrank(tmp_path):
    """--algo simrank through the CLI: scores must land in (0, c] and the
    two-triangle symmetry must hold (pairs (0,1) and (4,5) get equal
    scores — the automorphism swaps the bridge endpoints 2<->3 and maps
    {0,1} onto {4,5})."""
    snap = tmp_path / "g.txt"
    snap.write_text("0 1\n1 2\n0 2\n3 4\n4 5\n3 5\n2 3\n7 8\n")
    env = {**os.environ, "PYTHONPATH": REPO}
    out = str(tmp_path / "s_out")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "submit_job.py"),
           "--algo", "simrank", "--snap", str(snap), "--out", out,
           "--max-iter", "8"]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=str(tmp_path), timeout=600)
    assert p.returncode == 0, p.stderr[-3000:]
    rows = duckdb.sql(
        f"SELECT u, v, s FROM read_parquet('{out}/*.parquet')"
    ).fetchall()
    scores = {(u, v): s for u, v, s in rows}
    assert all(0 < s <= 0.6 + 1e-12 for s in scores.values())
    assert scores[(0, 1)] == pytest.approx(scores[(4, 5)], abs=1e-12)


def test_submit_cli_simrank_vertex_guard(tmp_path):
    """ADVICE r3: --algo simrank must refuse an input above --max-vertices
    BEFORE building O(V^2) pair state, with an actionable message; the
    same graph passes when the guard is raised."""
    snap = tmp_path / "g.txt"
    snap.write_text("0 1\n1 2\n0 2\n3 4\n4 5\n3 5\n2 3\n7 8\n")  # 8 vertices
    env = {**os.environ, "PYTHONPATH": REPO}
    out = str(tmp_path / "s_out")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "submit_job.py"),
           "--algo", "simrank", "--snap", str(snap), "--out", out,
           "--max-iter", "2", "--max-vertices", "3"]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=str(tmp_path), timeout=600)
    assert p.returncode != 0
    assert "max-vertices" in p.stderr and "8 vertices" in p.stderr
