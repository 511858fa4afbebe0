"""Extra benchmark harness for optimization work (bench.py is FROZEN).

Times individual declared queries through the noop sink (guide §1.4) at
an arbitrary scale-factor directory, with interleaved repeats and the
same session shape as bench.py.  Usage::

    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries graph_triangles,dedup_minhash --repeats 3

Prints one JSON line with per-query best-of-R seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kg.session import get_spark

    shm_local = "/dev/shm/kg_bench_local" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": shm_local} if shm_local else {}
    spark = get_spark(
        "bench-extra", cores=args.cpus, shuffle_partitions=args.cpus,
        extra_conf=extra,
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    names = [n for n in args.queries.split(",") if n]

    warm_dir = os.path.join(
        os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001"
    )
    if not args.no_warm and os.path.isdir(warm_dir):
        for name in names:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "cpus": args.cpus,
                "best": {n: min(t) for n, t in timings.items()},
                "samples": timings,
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
