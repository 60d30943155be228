#!/usr/bin/env python3
"""Same-window bench PAIR runner (dev-only; the r8 oracle-noise-hygiene
ask): runs graft.Bench (Spark) and the DuckDB oracle back-to-back in
ONE window and writes ONE artifact holding BOTH sides' raw reps plus
the ratio table — so a pinned pair can never be assembled from numbers
measured in different windows (the r8 dedup_containment 30.7 s
bookkeeping slip).

Usage:
  python3 tools/bench_pair.py <sfDir> <verifyOutDir> [out.json]
    GRAFT_BENCH_ONLY=a,b,c   subset (both sides; default: headline set)
    GRAFT_BENCH_REPS=3       reps per side (Spark median / DuckDB best)
    GRAFT_BENCH_TIMEOUT=480  per-query DuckDB wall cap (sec; 0 = none)

<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
Output JSON: {window:{start,end},sf,reps,queries:{name:{spark_raw:[..],
spark_median,duck_raw:[..],duck_best,duck_timeout,ratio}},totals}.
"""
import json
import os
import subprocess
import sys
import threading
import time
from datetime import datetime, timezone
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def run_spark(sf_dir: str, only: str, reps: int, tmp_out: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_REPS"] = str(reps)
    env["SPARK_GRAFT_BENCH_OUT"] = tmp_out
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    return json.loads(Path(tmp_out).read_text())


def run_duck(sf_dir: str, verify_out: str, names, reps: int,
             cap: float) -> dict:
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a single file or a directory of part files
        # (the PER_THREAD_OUTPUT layout of the big scale fixtures)
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')")
    oracle = json.loads(Path(verify_out, "oracle_sql.json").read_text())
    out = {}
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            out[name] = {"raw": [], "timeout": False, "missing": True}
            continue
        raws, timed_out = [], False
        for _ in range(reps):
            t0 = time.monotonic()
            if cap > 0:
                timer = threading.Timer(cap, con.interrupt)
                timer.start()
                try:
                    con.execute(sql).fetchall()
                except duckdb.InterruptException:
                    timed_out = True
                finally:
                    timer.cancel()
            else:
                con.execute(sql).fetchall()
            raws.append(round(time.monotonic() - t0, 3))
            if timed_out:
                break
        out[name] = {"raw": raws, "timeout": timed_out}
    return out


def main() -> int:
    sf_dir, verify_out = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "bench_pair_out.json"
    only = os.environ.get("GRAFT_BENCH_ONLY", "")
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    cap = float(os.environ.get("GRAFT_BENCH_TIMEOUT", "480") or 0)

    start = datetime.now(timezone.utc).isoformat()
    spark = run_spark(sf_dir, only, reps, "/tmp/graft_bench_pair_spark.json")
    names = list(spark["queries"].keys())
    duck = run_duck(sf_dir, verify_out, names, reps, cap)
    end = datetime.now(timezone.utc).isoformat()

    queries, tot_s, tot_d = {}, 0.0, 0.0
    any_timeout = False
    for n in names:
        s_med = spark["queries"][n]
        d = duck.get(n, {})
        d_raw = d.get("raw", [])
        d_best = min(d_raw) if d_raw else None
        timeout = bool(d.get("timeout"))
        any_timeout = any_timeout or timeout
        ratio = (round(s_med / d_best, 3)
                 if d_best and not timeout and d_best > 0 else None)
        queries[n] = {
            "spark_raw": spark.get("raw", {}).get(n, []),
            "spark_median": s_med,
            "duck_raw": d_raw,
            "duck_best": d_best,
            "duck_timeout": timeout,
            "ratio": ratio,
        }
        tot_s += s_med
        if d_best and not timeout:
            tot_d += d_best
    artifact = {
        "metric": "bench_pair",
        "window": {"start": start, "end": end},
        "sf": sf_dir,
        "reps": reps,
        "queries": queries,
        "totals": {"spark": round(tot_s, 3),
                   "duck_completed": round(tot_d, 3),
                   "duck_had_timeouts": any_timeout},
        # r14 fleet-drift instrumentation: the benched JVM's and the
        # OS's state at fleet start/end (graft.Bench jvmTelemetry) —
        # each fleet forks a FRESH JVM, so cross-fleet drift must show
        # in the OS fields (page cache, dirty, available) if anywhere
        "jvm_start": spark.get("jvm_start"),
        "jvm_end": spark.get("jvm_end"),
        # r16 (verdict #2): self-describing box state — the runner
        # declares the window's burn recency via GRAFT_BOX_STATE
        # ("first-after-idle" / "post-burn" / ...); the benched JVM's
        # own stamp rides in via Bench's box_state field
        "box_state": {"label": os.environ.get("GRAFT_BOX_STATE",
                                              "unspecified"),
                      "bench": spark.get("box_state")},
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    # compact ratio table for the terminal
    print(f"| query | spark med | duck best | ratio |")
    print("|---|---|---|---|")
    for n in names:
        q = queries[n]
        d = (f">{cap:.0f} (timeout)" if q["duck_timeout"]
             else f"{q['duck_best']:.3f}" if q["duck_best"] is not None
             else "(no oracle)")
        r = f"{q['ratio']:.2f}x" if q["ratio"] is not None else "-"
        print(f"| {n} | {q['spark_median']:.3f} | {d} | {r} |")
    print(f"| **total** | **{tot_s:.3f}** | **{tot_d:.3f}** | |")
    print(f"artifact: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
