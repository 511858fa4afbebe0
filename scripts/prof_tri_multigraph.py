"""Stage-split profiler for the CURRENT (r6 multigraph) triangles path.

Re-executes the operator's internal phases one checkpoint/action at a
time with wall timers so the sequential job chain is attributed:
encode map + vocab ckpt/agg (overlapped in prod), multigraph degree
ckpt, orientation + adjacency collect_set ckpt, closure + member counts
+ decode.  Numbers comparable within one run only (weather).

Usage: SPARK_GRAFT_SF_DIR=/dev/shm/kgsf/sf1.0 python scripts/prof_tri_multigraph.py
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
    print(f"{label:34s} {time.monotonic() - t0:7.2f} s", flush=True)
    return out


def main() -> None:
    from kg.session import get_spark

    spark = get_spark(
        "prof_tri_mg", cores=16, shuffle_partitions=16,
        extra_conf={"spark.local.dir": "/dev/shm/kg_prof_local"},
    )
    import __spark_entry__ as e
    from kg.ops.graph import (
        _decode_ids, _encode_vertex_ids, _multigraph_deg,
        _triangle_triples_multigraph,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/dev/shm/kgsf/sf1.0")
    # warm-up
    e.queries()["graph_triangles"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    print("load_1m", round(os.getloadavg()[0], 2))

    edges = e._tri_graph_edges(spark, sf)
    t0_all = time.monotonic()
    print("== graph_triangles (multigraph path, phases serialized) ==")
    enc = t("encode vocab ckpt+agg", lambda: _encode_vertex_ids(edges, "out_id", "in_id"))
    encoded, vocab = enc
    deg = t("multigraph degree ckpt", lambda: _multigraph_deg(encoded, "out_id", "in_id"))
    # building tri runs n_vert count, orientation + adjacency
    # collect_set ckpt + m_und agg eagerly — time it as one phase
    tri = t(
        "orient+adjacency ckpt (+counts)",
        lambda: _triangle_triples_multigraph(encoded, "out_id", "in_id", deg),
    )
    members = tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
    counts = members.groupBy("id").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    out = _decode_ids(counts, vocab, ["id"])
    t("closure+counts+decode noop",
      lambda: out.write.format("noop").mode("overwrite").save())
    print(f"{'TOTAL (serialized)':34s} {time.monotonic() - t0_all:7.2f} s")
    print("load_1m", round(os.getloadavg()[0], 2))
    spark.stop()


if __name__ == "__main__":
    main()
