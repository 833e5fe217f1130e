#!/usr/bin/env python
"""Diagnose superstep scaling: run one (algo, path, cores) combo per fresh
JVM on the same deterministic power-law graph and print per-superstep wall
times. Usage:

  python scripts/diag_scaling.py worker <algo> <path> <cores> [edges] [confs...]
  python scripts/diag_scaling.py matrix [edges]

`confs` are extra spark confs as k=v pairs.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARTS = 32


def worker(algo: str, path: str, cores: int, edges: int, confs: dict) -> dict:
    from pcd_spark.session import get_spark
    from pcd_spark.graph import label_propagation, pagerank
    from pcd_spark.graph.csr import label_propagation_csr, pagerank_csr
    from pcd_spark.graph.generators import powerlaw_edges

    spark = get_spark(
        f"diag-{algo}-{path}-{cores}", cores=cores,
        shuffle_partitions=PARTS, extra_confs=confs,
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = powerlaw_edges(spark, edges // 10, edges, alpha=2.0, num_parts=PARTS).persist()
    n_e = e.count()

    fns = {
        ("pagerank", "df"): lambda g, s: pagerank(g, tol=0.0, max_iter=5, num_parts=PARTS, stats_out=s),
        ("lpa", "df"): lambda g, s: label_propagation(g, max_iter=5, num_parts=PARTS, stats_out=s),
        ("pagerank", "csr"): lambda g, s: pagerank_csr(g, tol=0.0, max_iter=5, num_parts=PARTS, stats_out=s),
        ("lpa", "csr"): lambda g, s: label_propagation_csr(g, max_iter=5, num_parts=PARTS, stats_out=s),
    }
    # JIT/codegen warmup on a small graph with the same plan shapes
    warm = powerlaw_edges(spark, 20_000, 200_000, alpha=2.0, num_parts=PARTS).persist()
    warm.count()
    fns[(algo, path)](warm, {}).count()
    warm.unpersist()

    stats: dict = {}
    t0 = time.time()
    fns[(algo, path)](e, stats).count()
    sec = time.time() - t0
    iters = max(stats.get("iterations", 1), 1)
    trav = n_e * (2 if algo == "lpa" else 1) * iters
    return {
        "algo": algo, "path": path, "cores": cores, "edges": n_e,
        "sec": round(sec, 1), "sec_per_superstep": round(sec / iters, 2),
        "tput": round(trav / sec, 0),
        "step_secs": stats.get("step_secs"),
    }


def matrix(edges: int) -> None:
    rows = []
    for algo in ("pagerank", "lpa"):
        for path in ("df", "csr"):
            per_core = {}
            for cores in (2, 8, 32):
                cmd = [sys.executable, __file__, "worker", algo, path,
                       str(cores), str(edges)]
                p = subprocess.run(cmd, capture_output=True, text=True)
                lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
                if not lines:
                    print(f"FAIL {algo}/{path}/{cores}: {p.stderr[-500:]}")
                    continue
                r = json.loads(lines[-1])
                per_core[cores] = r["tput"]
                print(json.dumps(r))
            if 2 in per_core and 8 in per_core:
                eff = per_core[8] / per_core[2] / 4
                print(f"== {algo}/{path}: eff(2->8) = {eff:.3f}, "
                      f"tputs {per_core}")
            rows.append((algo, path, per_core))
    print(json.dumps([{ "algo": a, "path": p, "tput": t } for a, p, t in rows]))


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        algo, path, cores = sys.argv[2], sys.argv[3], int(sys.argv[4])
        edges = int(sys.argv[5]) if len(sys.argv) > 5 else 5_000_000
        confs = dict(kv.split("=", 1) for kv in sys.argv[6:])
        print(json.dumps(worker(algo, path, cores, edges, confs)))
    else:
        edges = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
        matrix(edges)
