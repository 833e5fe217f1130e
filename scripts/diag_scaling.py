#!/usr/bin/env python
"""Diagnose superstep scaling: run one (algo, path, cores) combo per fresh
JVM on the same deterministic power-law graph and print per-superstep wall
times plus executor-aggregated shuffle/CPU metrics (UI REST API). Usage:

  python scripts/diag_scaling.py worker <algo> <path> <cores> [edges] [parts] [confs...]
  python scripts/diag_scaling.py matrix [edges]
  python scripts/diag_scaling.py sweep [edges]      # local[32], p in {32,64,128}
  python scripts/diag_scaling.py iopair [edges]     # local[8] vs local[32], shuffle bytes/s
  python scripts/diag_scaling.py effpair [edges]    # 8->32 efficiency, p=2*cores, interleaved reps
  python scripts/diag_scaling.py bandwidth          # numpy memory-bandwidth probe

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


def _stage_metrics(t0_ms: float) -> dict:
    """Sum shuffle/CPU metrics over stages submitted after t0 (epoch ms)
    from the local UI REST API. The diag worker enables the UI."""
    import urllib.request
    from datetime import datetime, timezone

    def get(path):
        with urllib.request.urlopen(f"http://127.0.0.1:4040/api/v1{path}") as r:
            return json.loads(r.read())

    try:
        apps = get("/applications")
        app_id = apps[0]["id"]
        stages = get(f"/applications/{app_id}/stages?status=complete")
    except Exception as exc:  # UI off / port moved: report, don't fail the run
        return {"error": str(exc)}
    tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
           "executor_run_ms": 0, "executor_cpu_ms": 0, "input_bytes": 0}
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        ts = datetime.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S").replace(
            tzinfo=timezone.utc).timestamp() * 1000
        if ts < t0_ms:
            continue
        tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        tot["executor_run_ms"] += s.get("executorRunTime", 0)
        tot["executor_cpu_ms"] += int(s.get("executorCpuTime", 0) / 1e6)
        tot["input_bytes"] += s.get("inputBytes", 0)
    return tot


def worker(algo: str, path: str, cores: int, edges: int, confs: dict,
           parts: int = PARTS) -> dict:
    from pcd_spark.session import get_spark
    from pcd_spark.graph import label_propagation, pagerank
    from pcd_spark.graph.csr import label_propagation_csr, pagerank_csr
    from pcd_spark.graph.generators import powerlaw_edges

    confs = {"spark.ui.enabled": "true", **confs}
    spark = get_spark(
        f"diag-{algo}-{path}-{cores}", cores=cores,
        shuffle_partitions=parts, extra_confs=confs,
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = powerlaw_edges(spark, edges // 10, edges, alpha=2.0, num_parts=parts).persist()
    n_e = e.count()

    fns = {
        ("pagerank", "df"): lambda g, s: pagerank(g, tol=0.0, max_iter=5, num_parts=parts, stats_out=s),
        ("lpa", "df"): lambda g, s: label_propagation(g, max_iter=5, num_parts=parts, stats_out=s),
        ("pagerank", "csr"): lambda g, s: pagerank_csr(g, tol=0.0, max_iter=5, num_parts=parts, stats_out=s),
        ("lpa", "csr"): lambda g, s: label_propagation_csr(g, max_iter=5, num_parts=parts, stats_out=s),
    }
    # JIT/codegen warmup on a small graph with the same plan shapes
    warm = powerlaw_edges(spark, 20_000, 200_000, alpha=2.0, num_parts=parts).persist()
    warm.count()
    fns[(algo, path)](warm, {}).count()
    warm.unpersist()

    stats: dict = {}
    t0 = time.time()
    fns[(algo, path)](e, stats).count()
    sec = time.time() - t0
    m = _stage_metrics(t0 * 1000)
    iters = max(stats.get("iterations", 1), 1)
    trav = n_e * (2 if algo == "lpa" else 1) * iters
    out = {
        "algo": algo, "path": path, "cores": cores, "parts": parts,
        "edges": n_e,
        "sec": round(sec, 1), "sec_per_superstep": round(sec / iters, 2),
        "tput": round(trav / sec, 0),
        "step_secs": stats.get("step_secs"),
        "stage_metrics": m,
    }
    if "shuffle_write_bytes" in m:
        sh = m["shuffle_write_bytes"] + m["shuffle_read_bytes"]
        out["shuffle_bytes_per_superstep"] = round(sh / iters)
        out["shuffle_bytes_per_sec"] = round(sh / sec)
        # fraction of the core-seconds the job could have used that it did
        out["core_utilization"] = round(
            m["executor_run_ms"] / 1000.0 / (sec * cores), 3)
        out["cpu_vs_run"] = round(
            m["executor_cpu_ms"] / max(m["executor_run_ms"], 1), 3)
    return out


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


def _run_worker(algo, path, cores, edges, parts):
    cmd = [sys.executable, __file__, "worker", algo, path, str(cores),
           str(edges), str(parts)]
    p = subprocess.run(cmd, capture_output=True, text=True)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(f"FAIL {algo}/{path}/{cores}/p{parts}: {p.stderr[-500:]}")
        return None
    r = json.loads(lines[-1])
    print(json.dumps(r))
    return r


def sweep(edges: int) -> None:
    """Partition-width sweep at local[32] (VERDICT r2 #2): does widening p
    beyond 32 recover the local[32] regression, or is the box saturated?"""
    for parts in (32, 64, 128):
        _run_worker("pagerank", "df", 32, edges, parts)


def iopair(edges: int) -> None:
    """local[8] vs local[32], fixed p=32: shuffle bytes/sec at each level,
    to compare against the memory-bandwidth probe."""
    for cores in (8, 32):
        _run_worker("pagerank", "df", cores, edges, PARTS)


def effpair(edges: int, reps: int = 3) -> None:
    """8->32-core efficiency with the p=2x-cores discipline the round-3
    sweep found (BENCH/BASELINE.md): local[8]/p=16 vs local[32]/p=64,
    interleaved reps, per-step-index MIN across reps (the headline
    protocol's steal-resistant estimator), efficiency = speedup/4."""
    step_mins: dict[int, list[float]] = {}
    for rep in range(reps):
        for cores in (8, 32):
            r = _run_worker("pagerank", "df", cores, edges, 2 * cores)
            if r is None or not r.get("step_secs"):
                continue
            cur = step_mins.setdefault(cores, list(r["step_secs"]))
            step_mins[cores] = [min(a, b) for a, b in zip(cur, r["step_secs"])]
        print(json.dumps({"rep": rep, "step_min_sums": {
            c: round(sum(v), 2) for c, v in step_mins.items()}}))
    if 8 in step_mins and 32 in step_mins:
        t8, t32 = sum(step_mins[8]), sum(step_mins[32])
        eff = (t8 / t32) / 4
        print(json.dumps({
            "protocol": "per-step-index min over interleaved reps, p=2*cores",
            "sec_5steps_local8_p16": round(t8, 2),
            "sec_5steps_local32_p64": round(t32, 2),
            "speedup_8_to_32": round(t8 / t32, 3),
            "efficiency_8_to_32": round(eff, 3),
        }))


def bandwidth() -> None:
    """numpy memory-bandwidth probe: aggregate copy GB/s at 1/8/32 parallel
    processes. A copy moves 2x its size (read+write); shuffle moves more
    (serialize + hash + spill), so this is the CEILING shuffle can see."""
    import multiprocessing as mp

    import numpy as np

    def one(q):
        a = np.empty(2**27, dtype=np.uint8)  # 128 MiB
        a[:] = 1
        b = np.empty_like(a)
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            np.copyto(b, a)
            np.copyto(a, b)
        q.put(2 * reps * 2 * a.nbytes / (time.time() - t0))  # bytes/s moved

    out = {}
    for nproc in (1, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=one, args=(q,)) for _ in range(nproc)]
        [p.start() for p in ps]
        vals = [q.get() for _ in ps]
        [p.join() for p in ps]
        out[f"procs_{nproc}"] = round(sum(vals) / 2**30, 1)  # GiB/s aggregate
    print(json.dumps({"copy_bandwidth_gib_s": out}))


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        algo, path, cores = sys.argv[2], sys.argv[3], int(sys.argv[4])
        edges = int(sys.argv[5]) if len(sys.argv) > 5 else 5_000_000
        parts = int(sys.argv[6]) if len(sys.argv) > 6 else PARTS
        confs = dict(kv.split("=", 1) for kv in sys.argv[7:])
        print(json.dumps(worker(algo, path, cores, edges, confs, parts)))
    elif sys.argv[1] == "sweep":
        sweep(int(sys.argv[2]) if len(sys.argv) > 2 else 80_000_000)
    elif sys.argv[1] == "iopair":
        iopair(int(sys.argv[2]) if len(sys.argv) > 2 else 80_000_000)
    elif sys.argv[1] == "effpair":
        effpair(int(sys.argv[2]) if len(sys.argv) > 2 else 80_000_000)
    elif sys.argv[1] == "bandwidth":
        bandwidth()
    else:
        edges = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
        matrix(edges)
