"""Hot-repo skew benchmark: pins the "bucket-is-the-salt" claim with data.

The synthetic corpus plants a hot repo holding ~30% of all rows
(kg.datagen, SURVEY §2.1 "salted repartition").  The pipeline's answer is
to key every corpus-wide shuffle on ``bucket = pmod(xxhash64(repo, path),
B)`` — path salts the hot repo — rather than on ``repo``.  This script
measures both keyings on the same stored corpus:

  1. *distribution*: rows in the largest bucket / perfectly-even share
     (a straggler factor: 1.0 = flat, 19x = one task does 30% of work);
  2. *wall time*: the bucketed repartition+write that materialize/extract
     actually perform, under each keying.

Appends results to BENCH/BASELINE.md.

    python scripts/bench_skew.py [--files 200000] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM = "/dev/shm/kg_bench" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

_RUN = r"""
import json, sys, time
from pyspark.sql import functions as F
from kg.session import get_spark
from kg.lineage import bucket_col

cores, src_path, shm, buckets = int(sys.argv[1]), sys.argv[2], sys.argv[3], 64
spark = get_spark("skew-bench", cores=cores, shuffle_partitions=cores,
                  extra_conf={"spark.local.dir": shm})
src = spark.read.parquet(src_path)
n = src.count()

def stats(df, key):
    agg = df.groupBy(key.alias("b")).agg(F.count("*").alias("rows"))
    mx = agg.agg(F.max("rows")).first()[0]
    return {"max_bucket_rows": mx, "even_share": n / buckets,
            "straggler_factor": round(mx / (n / buckets), 2)}

def timed_write(df, cols):
    t0 = time.monotonic()
    (df.repartition(buckets, *cols)
       .write.mode("overwrite").format("noop").save())
    return round(time.monotonic() - t0, 3)

by_repo = F.pmod(F.xxhash64("repo"), F.lit(buckets))
by_repo_path = bucket_col("repo", "path", n_buckets=buckets)

res = {
    "rows": n,
    "by_repo": stats(src, by_repo),
    "by_repo_path": stats(src, by_repo_path.alias("bucket")),
    "write_sec_by_repo": timed_write(src, [by_repo]),
    "write_sec_by_repo_path": timed_write(src, [by_repo_path]),
}
print(json.dumps(res))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    src_path = os.path.join(SHM, f"src_{args.files}")
    if not os.path.exists(src_path):
        raise SystemExit(
            f"{src_path} missing — run scripts/bench_scaling.py --files "
            f"{args.files} --keep-src first"
        )
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_RUN)
        path = f.name
    env = {**os.environ,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    try:
        proc = subprocess.run(
            [sys.executable, path, str(args.cores), src_path, SHM],
            cwd=REPO, capture_output=True, text=True, env=env, timeout=1800,
        )
    finally:
        os.unlink(path)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    res = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    print(json.dumps(res))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\n## skew run: {args.files} files (30% hot repo), 64 buckets, "
            f"local[{args.cores}]\n\n"
            f"| keying | max-bucket rows | even share | straggler factor | "
            f"repartition+write sec |\n|---|---|---|---|---|\n"
            f"| repo only | {res['by_repo']['max_bucket_rows']} | "
            f"{res['by_repo']['even_share']:.0f} | "
            f"{res['by_repo']['straggler_factor']}× | {res['write_sec_by_repo']} |\n"
            f"| (repo, path) — the pipeline's bucket | "
            f"{res['by_repo_path']['max_bucket_rows']} | "
            f"{res['by_repo_path']['even_share']:.0f} | "
            f"{res['by_repo_path']['straggler_factor']}× | "
            f"{res['write_sec_by_repo_path']} |\n\n"
            f"path salts the hot repo: the pipeline's work buckets are flat "
            f"(straggler factor ≈ 1) while repo-keyed buckets put ~30% of "
            f"the corpus in one task.\n"
        )


if __name__ == "__main__":
    main()
