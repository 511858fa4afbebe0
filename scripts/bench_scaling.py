"""Two-parallelism scaling benchmark (BASELINE.json north_rule).

Runs the SAME KG pipeline job on the SAME synthetic input at two local
parallelism levels (the sandbox proxy for N vs 4N executors), each in a
fresh JVM subprocess, and reports throughput at both plus scaling
efficiency = (T_N / T_4N) / 4.  Appends results to BENCH/BASELINE.md.

    python scripts/bench_scaling.py [--files 120000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, sys, time, tempfile
from kg.session import get_spark
from kg.conf import PipelineConfig
from kg.datagen import source_files_df
from kg.pipeline import run_pipeline

cores, n_files = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark("scaling-bench", cores=cores, shuffle_partitions=cores)
wh = tempfile.mkdtemp(prefix=f"kg_scale_{cores}_")
cfg = PipelineConfig(warehouse=wh, shuffle_partitions=cores)
src = source_files_df(spark, n_files)
# warm the JVM/codegen outside the timed section
src.limit(10).count()
t0 = time.monotonic()
out = run_pipeline(spark, src, cfg, restart=True)
n = out["triples"].count()
sec = time.monotonic() - t0
print(json.dumps({"cores": cores, "sec": round(sec, 3), "triples": n,
                  "tps": round(n / sec, 1)}))
spark.stop()
"""


def run_once(cores: int, n_files: int) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_RUNNER)
        path = f.name
    proc = subprocess.run(
        [sys.executable, path, str(cores), str(n_files)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    os.unlink(path)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-4000:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=120_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    lo = run_once(args.low, args.files)
    hi = run_once(args.high, args.files)
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
            f"\n## scaling run: {args.files} files, local[{args.low}] vs "
            f"local[{args.high}]\n\n"
            f"| cores | sec | triples | triples/sec |\n|---|---|---|---|\n"
            f"| {lo['cores']} | {lo['sec']} | {lo['triples']} | {lo['tps']} |\n"
            f"| {hi['cores']} | {hi['sec']} | {hi['triples']} | {hi['tps']} |\n\n"
            f"speedup {args.low}→{args.high}: **{result['speedup']}×**; "
            f"scaling efficiency (speedup/{ratio:.0f}): "
            f"**{result['scaling_efficiency']}** "
            f"(target ≥ 0.8 → {'PASS' if result['pass'] else 'FAIL'})\n"
        )


if __name__ == "__main__":
    main()
