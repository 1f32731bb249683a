"""Two-parallelism scaling bench (north rule: throughput scaling efficiency
>= 0.8 between N and 4N executors; sandbox realization local[2] vs local[8],
whole-process-tree pinned — see the rationale block in write_report).

Generates the source table ONCE to parquet (generation excluded from
timing), then runs the identical validation job at both parallelism levels
in fresh JVMs (subprocess per level so executor-thread pools don't
interfere), reporting rows/sec at each and
``efficiency = (T_N / T_4N) / 4``.

Writes/updates BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 32M rows: at 8M/16M the level-high walls are ~35-45s, where the ~10s of
# fixed per-run cost (driver planning, action scheduling) plus the host's
# multi-second contention spikes dominate the ratio; 32M makes both levels
# long enough that the parallel region is what's measured.
ROWS = int(os.environ.get("DFF_SCALING_ROWS", "32000000"))
# N=2 vs 4N=8: both levels sit well below this host's SUSTAINED all-core
# capacity.  Measured with a 32-process sha256 burn: throughput peaks at
# ~3.1M hashes/5s then settles at ~1.75M (≈17 effective cores) — the
# hypervisor caps sustained full-width CPU, so a 16- or 32-thread level can
# never demonstrate its true 4x; 2/8 (pinned) is the honest realization.
N_LOW = int(os.environ.get("DFF_SCALING_N", "2"))
N_HIGH = int(os.environ.get("DFF_SCALING_4N", "8"))
REPEATS = int(os.environ.get("DFF_SCALING_REPEATS", "3"))
DATA = os.path.join(REPO, ".bench_data", f"scaling_{ROWS}.parquet")
DATA_SKEW = os.path.join(REPO, ".bench_data", f"scaling_{ROWS}_skew.parquet")


def ensure_data() -> None:
    from jobs.validate import build_session
    from dff.sources import synthetic_source_files

    todo = [(DATA, False), (DATA_SKEW, True)]
    if all(os.path.exists(os.path.join(p, "_SUCCESS")) for p, _ in todo):
        return
    spark = build_session(N_HIGH, app="dff-scaling-gen")
    spark.sparkContext.setLogLevel("ERROR")
    for path, skew in todo:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df = synthetic_source_files(
                spark, ROWS, n_repos=2000, n_parts=64, seed=42, skew=skew
            )
            df.repartition(128).write.mode("overwrite").parquet(path)
    spark.stop()


def warm_page_cache(data: str) -> None:
    """The sandbox evicts the page cache between runs; a cold 790MB read
    off this disk costs minutes and would swamp the timing."""
    for name in os.listdir(data):
        if name.endswith(".parquet"):
            with open(os.path.join(data, name), "rb") as f:
                while f.read(1 << 22):
                    pass


def run_once(parallelism: int, data: str) -> dict:
    warm_page_cache(data)
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "validate.py"),
        "--input", data,
        "--parallelism", str(parallelism),
        "--bench",
    ]
    # Pin the WHOLE process tree (JVM task threads + GC + shuffle IO +
    # Python workers) to exactly `parallelism` cores.  Without affinity,
    # local[N]'s auxiliary threads run on spare host cores, so a local[2]
    # job really consumes ~3 cores and the N-vs-4N comparison understates
    # true executor scaling; a real N-core executor is confined to N cores.
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{parallelism - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600
    )
    got = None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            got = json.loads(line)
    if got is None:
        raise RuntimeError(
            f"no JSON from validate.py: {out.stdout[-2000:]} {out.stderr[-2000:]}"
        )
    return got


def run_pair(data: str) -> tuple[dict, dict]:
    """INTERLEAVED repeats (low, high, low, high, ...), min-wall per level.

    The host is shared and its available CPU drifts on a minutes scale;
    interleaving puts both levels under the same conditions and min filters
    contention spikes.  Fresh JVM per run so executor pools don't interfere.
    """
    best = {N_LOW: None, N_HIGH: None}
    for r in range(REPEATS):
        for level in (N_LOW, N_HIGH):
            got = run_once(level, data)
            if best[level] is None or got["wall_sec"] < best[level]["wall_sec"]:
                best[level] = got
            print(
                json.dumps({"repeat": r, "level": level, "wall_sec": got["wall_sec"]}),
                file=sys.stderr,
            )
    return best[N_LOW], best[N_HIGH]


def main() -> None:
    t0 = time.time()
    ensure_data()
    print(f"data ready ({time.time()-t0:.0f}s)", file=sys.stderr)

    # results merge into a sidecar so a partial rerun (e.g. only the skew
    # dataset, after a host noise spike polluted its repeats) updates the
    # report without re-measuring the other dataset
    sidecar = os.path.join(REPO, "BENCH", "scaling_results.json")
    results = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            results = json.load(f)
    wanted = os.environ.get("DFF_SCALING_DATASETS", "uniform,skew").split(",")
    for tag, data in [("uniform", DATA), ("skew", DATA_SKEW)]:
        if tag not in wanted:
            continue
        low, high = run_pair(data)
        eff = (low["wall_sec"] / high["wall_sec"]) / (N_HIGH / N_LOW)
        results[tag] = {
            "rows": low["rows"],
            f"local[{N_LOW}]_sec": low["wall_sec"],
            f"local[{N_LOW}]_rows_per_sec": low["rows_per_sec"],
            f"local[{N_HIGH}]_sec": high["wall_sec"],
            f"local[{N_HIGH}]_rows_per_sec": high["rows_per_sec"],
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps({tag: results[tag]}))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(sidecar, "w") as f:
        json.dump(results, f, indent=1)
    write_report(results)


def write_report(results: dict) -> None:
    lines = [
        "# BENCH/BASELINE — two-parallelism scaling report",
        "",
        "North rule: throughput scaling efficiency >= 0.8 between N and 4N",
        f"executors; sandbox realization: the SAME validation job (rule DAG +",
        "uniqueness + referential + drift + checkpoint-row computation) over the",
        "SAME deterministic parquet input, run in fresh JVMs at "
        f"local[{N_LOW}] and local[{N_HIGH}].",
        "",
        f"Input: synthetic source-code table, {ROWS:,} rows (+ planted",
        "violations), seed=42; skew variant is ~90% one language (SURVEY.md §7.3).",
        "Efficiency = (T_N / T_4N) / (4N / N).",
        "",
        "| dataset | rows | "
        f"local[{N_LOW}] sec | local[{N_LOW}] rows/s | "
        f"local[{N_HIGH}] sec | local[{N_HIGH}] rows/s | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    for tag, r in results.items():
        lines.append(
            f"| {tag} | {r['rows']:,} | {r[f'local[{N_LOW}]_sec']} | "
            f"{r[f'local[{N_LOW}]_rows_per_sec']:,} | {r[f'local[{N_HIGH}]_sec']} | "
            f"{r[f'local[{N_HIGH}]_rows_per_sec']:,} | {r['scaling_efficiency']} |"
        )
    lines += [
        "",
        "Run: `python jobs/bench_scaling.py` (env: DFF_SCALING_ROWS,",
        "DFF_SCALING_N, DFF_SCALING_4N).  Generation is excluded from timing;",
        "each level runs in its own JVM; the page cache is pre-warmed (the",
        "sandbox evicts it, and a cold multi-GB read costs minutes on this disk).",
        "",
        f"Why N={N_LOW} / 4N={N_HIGH} and not 8/32: this sandbox is a VM on a",
        "shared host whose SUSTAINED all-core capacity is ~17 effective cores",
        "(measured: a 32-process sha256 burn peaks at ~3.1M hashes/5s, then",
        "settles at ~1.75M).  A 32-thread level is physically capped at ~2.1x",
        f"the 8-thread level regardless of engine quality, so {N_LOW}/{N_HIGH}",
        "— with each run's WHOLE process tree (task threads + GC + shuffle IO",
        "+ Python workers) taskset-pinned to exactly N cores, so the low",
        "level can't borrow spare host cores — is the honest in-sandbox",
        "realization of the N-vs-4N executor comparison; a real multi-",
        "executor cluster does not share one host's memory bus.",
        "Engine-side scaling fixes, in order of impact: hash-compressed",
        "uniqueness dup detection (xxhash64(keys) agg + broadcast-semi exact",
        "confirm: the engine's only full-table string shuffle, 53s -> 6s on",
        "16M rows at local[8]); a fixed pre-touched JVM heap (-Xms=-Xmx +",
        "AlwaysPreTouch; G1's uncommit/recommit page-faulting collapsed",
        "32-thread throughput 13x on virtualized memory); single-action",
        "cache fill (violations.count() materializes base + violations in",
        "one decode pass; the old separate base.count() was a fixed extra",
        "job that taxed the high level proportionally more); fusing the",
        "per-partition row count into the drift-histogram scan; pure-",
        "Catalyst drift statistics (the applyInPandas PSI/KS finalizer paid",
        "a Python-worker round-trip per shuffle task for kilobytes of math",
        "— a per-task fixed cost that GROWS with parallelism and alone",
        "dragged skew efficiency to 0.69; constant-folding the baseline",
        "into literal expressions made it ~0 at any level).",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    report_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve hand-maintained sections (e.g. the engine-scale dedup bench)
    # that live below this script's own report
    tail = ""
    if os.path.exists(report_path):
        with open(report_path) as f:
            old = f.read()
        cut = old.find("\n## ")
        if cut != -1:
            tail = old[cut:]
    with open(report_path, "w") as f:
        f.write("\n".join(lines) + tail)
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
