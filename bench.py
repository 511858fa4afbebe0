"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` plus the KG
pipeline end-to-end on a bench-scale synthetic corpus, and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "kg_triples_per_sec": ...}

Each query is forced through the noop sink so the full plan executes
(a bare count() would let Catalyst prune most of the work).

Weather robustness (VERDICT r4 #1): this box's neighbors swing the load
average 1 → 8 while the sandbox itself is idle, and a single un-gated
pass charged one such burst straight to whichever query it landed on
(r4's official artifact: 3× on half the queries vs the quiet-window
band).  Two defenses, both bounded:

* a cheap LOAD GATE before every timed measurement — wait until the
  1-min load average drops under ``KG_BENCH_LOAD_MAX`` (default 5.0,
  ~the box's idle-neighbor baseline + our own settling JVM), drawing
  from one global wait budget (``KG_BENCH_GATE_BUDGET``, default 180 s)
  so a permanently-loaded box still terminates;
* INTERLEAVED best-of-R — the headline list is timed as R full passes
  (default 3) taking the per-query minimum, so a burst that survives
  the gate sinks at most one pass of each query, never the reported
  number.  The pipeline leg repeats likewise (default 2 — it is the
  expensive leg).

The reported numbers stay one-JSON-line compatible; gate wait time and
repeat counts ride along as extra keys.

Both defenses are themselves bounded by a WALL BUDGET
(``KG_BENCH_WALL_BUDGET``, default 480 s): after any completed pass
(and before the second pipeline repeat) the harness checks elapsed
wall time and skips the remaining repeats once over budget, so bad
weather degrades the protocol toward best-of-1 instead of running the
driver into a timeout that would produce NO artifact at all.  At least
one full pass of every query and one pipeline run always execute; the
JSON reports how many passes actually completed.
"""

from __future__ import annotations

import json
import os
import sys
import time

_GATE = {"budget": float(os.environ.get("KG_BENCH_GATE_BUDGET", "180")),
         "waited": 0.0}
_LOAD_MAX = float(os.environ.get("KG_BENCH_LOAD_MAX", "5.0"))


def _load_gate() -> None:
    """Block until the 1-min load average is under the threshold, within
    the run-global wait budget (so a busy box degrades to un-gated
    timing instead of hanging the driver)."""
    while _GATE["budget"] > 0 and os.getloadavg()[0] > _LOAD_MAX:
        step = min(5.0, _GATE["budget"])
        time.sleep(step)
        _GATE["budget"] -= step
        _GATE["waited"] += step


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Task-slot choice: each Spark task runs a JVM thread + a python
    # worker, and this box sustains ~20 effective cores (nproc says 32;
    # measured aggregate-throughput curve in BENCH/BASELINE.md — 16→32
    # processes REDUCES throughput).  SPARK_GRAFT_CPUS describes the
    # advertised cores, so it is capped at the measured sweet spot of 16
    # slots; KG_BENCH_CPUS overrides explicitly (r1 ran the driver's 32
    # and paid ~2x on oversubscription thrash).
    cpus = int(
        os.environ.get("KG_BENCH_CPUS")
        or min(int(os.environ.get("SPARK_GRAFT_CPUS", "16")), 16)
    )
    n_files = int(os.environ.get("KG_BENCH_FILES", "200000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kg.session import get_spark

    # shuffle/spill IO on tmpfs, same as scripts/bench_shards.py: the
    # default /tmp local dir rides the shared virtual disk, whose
    # host-level contention swings pipeline times 2-4x run-to-run
    shm_local = "/dev/shm/kg_bench_local" if os.path.isdir("/dev/shm") else None
    extra = {"spark.local.dir": shm_local} if shm_local else {}
    spark = get_spark(
        "bench", cores=cpus, shuffle_partitions=cpus, extra_conf=extra
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    headline = [
        "edge_docs",
        "pricing_summary",
        "top_tokens_per_lang",
        "user_event_windows",
        "dedup_exact",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_embedding",
        "dedup_winnow",
        "text_stats",
        "ann_brute_force",
        "ann_lsh",
        "ann_ivf",
        "graph_pagerank",
        "graph_triangles",
        "repetition_stats",
        "decontaminate",
        "tfidf_topk",
        "pack_sequences",
    ]

    # untimed warm-up at the smallest scale factor: python-worker spawn,
    # whole-stage-codegen compilation and parquet reader init are
    # one-time session costs a long-lived cluster amortizes (same
    # protocol as scripts/bench_shards.py); without it the first queries
    # charge ~5 s of cold-start to whichever op happens to run first
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in headline:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    # clamped to ≥ 1: the docstring's invariant is that one full pass of
    # every query and one pipeline run ALWAYS execute — repeats=0 would
    # otherwise emit an empty timings map / a literal Infinity, which is
    # not JSON and breaks every consumer of the one-line contract
    repeats = max(1, int(os.environ.get("KG_BENCH_REPEATS", "3")))
    wall_budget = float(os.environ.get("KG_BENCH_WALL_BUDGET", "480"))
    bench_t0 = time.monotonic()
    timings: dict[str, float] = {}
    passes_done = 0
    for r in range(repeats):
        if r > 0 and time.monotonic() - bench_t0 > wall_budget:
            break  # degrade to fewer passes, never into a driver timeout
        for name in headline:
            _load_gate()
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
        passes_done += 1

    # KG pipeline end-to-end (extract → link → canonicalize → materialize)
    import shutil
    import tempfile

    from kg.conf import PipelineConfig
    from kg.datagen import source_files_df
    from kg.pipeline import run_pipeline

    # stage the synthetic corpus as parquet first (untimed), as the
    # sharded scaling bench does: the pipeline's input contract is a
    # storage-backed table — a generator source defeats column pruning
    # (the lineage agg would re-run python generation instead of a
    # narrow (repo, path) scan) and double-charges generation to the
    # measured run
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    src_dir = tempfile.mkdtemp(prefix="kg_bench_src_", dir=shm)
    source_files_df(spark, n_files).write.mode("overwrite").parquet(src_dir)

    # engine for the pipeline leg: ENGINE CHOICE IS PROTOCOL-DEPENDENT.
    # At the fleet protocol (local[2] slices) the jvm twin wins because
    # arrow's python workers silently widen each instance's core slice —
    # that's why bench_shards uses it for the scaling record.  At THIS
    # protocol (one local[16] session, spare capacity for python
    # workers) the arrow engine is ~3.4x faster (7.5 vs 25.4 s
    # steady-state extract A/B, idle box, r4) — a jvm default here cost
    # the pipeline leg 115 s vs ~45 s.  KG_EXTRACT_ENGINE overrides.
    engine = os.environ.get("KG_EXTRACT_ENGINE", "arrow")
    wh = tempfile.mkdtemp(prefix="kg_bench_", dir=shm)
    cfg = PipelineConfig(
        warehouse=wh, shuffle_partitions=cpus, extract_engine=engine
    )
    src = spark.read.parquet(src_dir)
    pipeline_repeats = max(
        1, int(os.environ.get("KG_BENCH_PIPELINE_REPEATS", "2"))
    )
    kg_sec, n_triples = float("inf"), 0
    pipeline_passes = 0
    for r in range(pipeline_repeats):
        if r > 0 and time.monotonic() - bench_t0 > wall_budget:
            break
        _load_gate()
        t0 = time.monotonic()
        out = run_pipeline(spark, src, cfg, restart=True)
        n_triples = out["triples"].count()
        kg_sec = min(kg_sec, time.monotonic() - t0)
        pipeline_passes += 1
    timings["kg_pipeline"] = round(kg_sec, 3)
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(src_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_kg_pipeline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "kg_files": n_files,
                "kg_triples": n_triples,
                "kg_triples_per_sec": round(n_triples / kg_sec, 1),
                "cpus": cpus,
                "repeats": repeats,
                "passes_done": passes_done,
                "pipeline_repeats": pipeline_repeats,
                "pipeline_passes_done": pipeline_passes,
                "gate_waited_sec": round(_GATE["waited"], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
