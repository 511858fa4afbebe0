"""Two-parallelism scaling benchmark (BASELINE.json north_rule).

Generates the synthetic source_files corpus ONCE to parquet (untimed),
then runs the SAME pipeline job over that stored table at two local
parallelism levels — the sandbox proxy for N vs 4N executors — each in a
fresh JVM subprocess, interleaved best-of-R, and reports throughput at
both plus scaling efficiency = (T_N / T_4N) / (high/low).

Level choice: this box's vCPUs scale linearly only to ~16-20 threads
(measured: 4→16 processes = 3.74× aggregate sha256 throughput, 8→32 only
2.0×), so the honest N vs 4N pair here is local[4] vs local[16]; the
hardware curve is recorded in BENCH/BASELINE.md alongside the results.

    python scripts/bench_scaling.py [--files 500000] [--low 4] [--high 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# All bench IO (source table, warehouse, shuffle spill) lives on tmpfs:
# a single box's block device (~365 MB/s here) cannot scale with thread
# count, but a 4N-executor cluster brings 4x the aggregate disk + network
# bandwidth. RAM-backed storage is the honest single-box stand-in for
# that; the CPU work is what the two levels actually contend on.
SHM = "/dev/shm/kg_bench" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

_GEN = r"""
import sys
from kg.session import get_spark
from kg.datagen import source_files_df

n_files, out, local_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark("scaling-gen", cores=16, shuffle_partitions=16,
                  extra_conf={"spark.local.dir": local_dir})
source_files_df(spark, n_files).write.mode("overwrite").parquet(out)
spark.stop()
"""

_RUNNER = r"""
import json, sys, time, tempfile
from pyspark.sql import functions as F
from kg.session import get_spark
from kg.conf import PipelineConfig
from kg.pipeline import run_pipeline

cores, src_path, shm = int(sys.argv[1]), sys.argv[2], sys.argv[3]
# size the JVM's internal pools (GC, JIT, netty) for the level's core
# count, exactly as a containerized executor would be — otherwise both
# levels spawn 32-core pools and the low level drowns in GC threads
spark = get_spark("scaling-bench", cores=cores, shuffle_partitions=cores,
                  extra_conf={
                      "spark.local.dir": shm,
                      "spark.driver.extraJavaOptions":
                          f"-XX:ActiveProcessorCount={cores + 2}",
                  })
wh = tempfile.mkdtemp(prefix=f"kg_scale_{cores}_", dir=shm)
cfg = PipelineConfig(warehouse=wh, shuffle_partitions=cores)
src = spark.read.parquet(src_path)
# steady-state measurement: run the identical plan shapes over a tiny
# slice first (untimed) so python-worker spawn + whole-stage-codegen
# compilation — one-time per-JVM costs a long-lived cluster amortizes —
# don't pollute the throughput sample
warm_wh = tempfile.mkdtemp(prefix="kg_warm_", dir=shm)
warm_cfg = PipelineConfig(warehouse=warm_wh, shuffle_partitions=cores)
# repartition the warm slice so EVERY python worker imports its libs now
run_pipeline(spark, src.limit(8000).repartition(cores), warm_cfg, restart=True)
import shutil as _sh
_sh.rmtree(warm_wh, ignore_errors=True)
t0 = time.monotonic()
out = run_pipeline(spark, src, cfg, restart=True)
n = out["triples"].count()
sec = time.monotonic() - t0
stages = {r["stage"]: r["ms"] for r in
          out["lineage"].groupBy("stage").agg(F.max("duration_ms").alias("ms")).collect()}
print(json.dumps({"cores": cores, "sec": round(sec, 3), "triples": n,
                  "tps": round(n / sec, 1), "stages_ms": stages}))
spark.stop()
import shutil
shutil.rmtree(wh, ignore_errors=True)
"""


def _run_py(code: str, argv: list[str], timeout: int = 3600) -> str:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(code)
        path = f.name
    env = {**os.environ, "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    try:
        proc = subprocess.run(
            [sys.executable, path, *argv],
            cwd=REPO, capture_output=True, text=True, timeout=timeout, env=env,
        )
    finally:
        os.unlink(path)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-4000:])
    return proc.stdout


def run_once(cores: int, src_path: str) -> dict:
    out = _run_py(_RUNNER, [str(cores), src_path, SHM])
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=500_000)
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=2,
                    help="runs per level (min taken) — fights box noise")
    ap.add_argument("--keep-src", action="store_true")
    args = ap.parse_args()

    os.makedirs(SHM, exist_ok=True)
    src_path = os.path.join(SHM, f"src_{args.files}")
    # _SUCCESS gates reuse: a killed/timed-out generation leaves a
    # PARTIAL parquet dir that a bare exists() would silently benchmark,
    # appending a wrong-corpus record to the authoritative BASELINE file
    if not os.path.exists(os.path.join(src_path, "_SUCCESS")):
        shutil.rmtree(src_path, ignore_errors=True)
        print(f"generating {args.files} files → {src_path} (untimed)...")
        _run_py(_GEN, [str(args.files), src_path, SHM])

    # interleave orders so page-cache / background drift can't bias a level
    lo_runs, hi_runs = [], []
    for r in range(args.repeats):
        if r % 2 == 0:
            hi_runs.append(run_once(args.high, src_path))
            lo_runs.append(run_once(args.low, src_path))
        else:
            lo_runs.append(run_once(args.low, src_path))
            hi_runs.append(run_once(args.high, src_path))
    lo = min(lo_runs, key=lambda d: d["sec"])
    hi = min(hi_runs, key=lambda d: d["sec"])
    ratio = args.high / args.low
    speedup = lo["sec"] / hi["sec"]
    eff = speedup / ratio
    result = {
        "files": args.files,
        "low": lo,
        "high": hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\n## scaling run: {args.files} files (pre-stored parquet), "
            f"local[{args.low}] vs local[{args.high}], best of {args.repeats}\n\n"
            f"| cores | sec | triples | triples/sec |\n|---|---|---|---|\n"
            f"| {lo['cores']} | {lo['sec']} | {lo['triples']} | {lo['tps']} |\n"
            f"| {hi['cores']} | {hi['sec']} | {hi['triples']} | {hi['tps']} |\n\n"
            f"speedup {args.low}→{args.high}: **{result['speedup']}×**; "
            f"scaling efficiency (speedup/{ratio:.0f}): "
            f"**{result['scaling_efficiency']}** "
            f"(target ≥ 0.8 → {'PASS' if result['pass'] else 'FAIL'})\n"
        )
    if not args.keep_src:
        shutil.rmtree(src_path, ignore_errors=True)


if __name__ == "__main__":
    main()
