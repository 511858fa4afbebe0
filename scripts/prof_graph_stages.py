"""Stage-split profiler for graph_triangles / graph_pagerank (guide §1).

Re-executes the operator's internal phases one checkpoint/action at a
time with wall timers, so the sequential job chain (encode vocab,
undirected distinct, degree agg, adjacency, closure / ranked-edges,
rounds) is attributed.  Numbers are comparable within one run only.

Usage: SPARK_GRAFT_SF_DIR=/dev/shm/kgsf/sf1.0 python scripts/prof_graph_stages.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{label:32s} {time.monotonic() - t0:7.2f} s", flush=True)
    return out


def main() -> None:
    from kg.session import get_spark

    spark = get_spark(
        "prof_graph", cores=16, shuffle_partitions=16,
        extra_conf={"spark.local.dir": "/dev/shm/kg_prof_local"},
    )
    import __spark_entry__ as e
    from kg.ops.graph import (
        _decode_ids, _encode_vertex_ids, _triangle_triples, _undirected,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm-up
    e.queries()["graph_triangles"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    edges = e._tri_graph_edges(spark, sf)

    print("== graph_triangles ==")
    enc = t("encode (vocab ckpt+agg)", lambda: _encode_vertex_ids(edges, "out_id", "in_id"))
    encoded, vocab = enc
    und = t("undirected distinct ckpt", lambda: _undirected(encoded, "out_id", "in_id").localCheckpoint())
    deg = t(
        "degree agg ckpt",
        lambda: und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(),
    )
    tri = t("triples plan (lazy)", lambda: _triangle_triples(und, deg))
    members = tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
    counts = members.groupBy("id").agg(F.count("*").cast("long").alias("n_triangles"))
    out = _decode_ids(counts, vocab, ["id"])
    t("closure+decode noop", lambda: out.write.format("noop").mode("overwrite").save())

    print("== graph_pagerank ==")
    pr_edges = e._star_graph_edges(spark, sf)
    enc2 = t("encode (vocab ckpt+agg)", lambda: _encode_vertex_ids(pr_edges, "out_id", "in_id"))
    encoded2, vocab2 = enc2
    ee = encoded2.select(F.col("out_id").alias("src"), F.col("in_id").alias("dst"))
    outd = ee.groupBy("src").agg(F.count("*").alias("outd"))
    ranked = t("ranked_edges ckpt", lambda: ee.join(outd, "src").localCheckpoint())
    from kg.ops.graph import _pagerank_loop

    ranks = _pagerank_loop(
        encoded2, vocab2.select(F.col("enc").alias("id")), 3, 850_000,
        "out_id", "in_id",
    )
    out2 = _decode_ids(ranks, vocab2, ["id"])
    t("rounds+decode noop", lambda: out2.write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()
