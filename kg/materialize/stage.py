"""Materialize stage: triples + entity_map → GraphSON-style nodes/edges.

Node kinds (all ids deterministic sha256 — resume/golden tests depend on
content-derived ids, never monotonically_increasing_id):

* ``file``       one per source file; pk = repo; properties carry the raw
                 ``id`` key (exercises the O9 reserved rename → ``prop_id``)
                 and the sorted imports array (exercises O10 array→JSON).
* ``class_def``  one per class defined in a file; pk = repo.
* ``module`` / ``class`` / ``function``  canonical entities; the id is the
                 component's canonical mention id; pk is a 2-hex-char
                 bucket of the id (256 synthetic partitions — entities are
                 global, not repo-local).

Edge rows mirror the reference's 8-field GremlinEdge (Migrator.cs:142-154):
``edge_``-prefixed id (O11), label = predicate, endpoint label+pk
denormalized (O4), plus FLAT provenance columns (repo/path/commit/lang/
content_sha incl. the content_sha lineage invariant).  The GraphSON
property bag (Migrator.cs:93) is assembled at READ time by
``as_graphson_edges`` — maps shuffle and encode terribly (repeated keys,
one mixed-domain parquet chunk), so the storage layout is columnar-flat
and the document shape is a projection.

Plan-shape notes (scale + latency):
* the only join against a corpus-sized table is triples ⋈ mention_map,
  and mention_map is vocabulary-sized → broadcast;
* file nodes come from ONE groupBy(subj) (metadata via ``first`` +
  imports via conditional ``collect_set``) instead of a distinct + a
  separate aggregation + a join;
* no dropDuplicates anywhere: ids are unique by construction — file/class
  subjects embed repo:path (unique per source row), entity ids are
  canonical mention ids (grouped), and edge ids hash (out,label,in,repo,
  path) of already-unique triples.  Each removed dedup is a full-table
  shuffle that would dominate at 10^12-file scale.
* edges are pure projections over the resolved triples — zero shuffles
  until the partitioned write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kg.conf import PipelineConfig
from kg.hints import maybe_broadcast
from kg.ids import mention_id
from kg.materialize.documents import (
    edge_namespace,
    json_array,
    rename_reserved_keys,
)

# entity label per predicate of the *object* mention
_OBJ_KIND = {
    "imports-of": "module",
    "extends": "class",
    "calls-function": "function",
}


def _entity_bucket(id_col):
    """Synthetic partition key for global entity nodes: 2 hex chars."""
    return F.substring(id_col, 1, 2)


def _resolved_objects(triples: DataFrame, entity_map: DataFrame) -> DataFrame:
    """Triple rows whose object is an entity mention, with the object
    resolved to its canonical id.  calls-function objects are entities
    too, but unlinked (kind='function', canonical = own mention id)."""
    kind = F.when(F.col("pred") == "imports-of", F.lit("module")).when(
        F.col("pred") == "extends", F.lit("class")
    ).otherwise(F.lit("function"))
    # mention_id applies the same surface truncation the link stage used
    # when minting ids — a long surface must probe entity_map with the
    # identical key or canonicalization silently misses (kg.ids).
    t = triples.filter(
        F.col("pred").isin(*_OBJ_KIND.keys())
    ).withColumn("obj_kind", kind).withColumn(
        "obj_mention", mention_id(F.col("obj_kind"), F.col("obj"))
    )
    # entity_map is vocabulary-sized TODAY, but distinct surfaces grow with
    # the corpus (10^12 files → plausibly 10^8 rows); the broadcast hint is
    # therefore GATED on Catalyst's size estimate (parquet-backed input →
    # real bytes). Unknown/over-budget → no hint, AQE picks the join.
    em = maybe_broadcast(
        entity_map.select(
            F.col("mention_id").alias("obj_mention"),
            F.col("canonical_id").alias("obj_canonical"),
        )
    )
    return t.join(em, "obj_mention", "left").withColumn(
        "obj_canonical", F.coalesce("obj_canonical", "obj_mention")
    )


# provenance columns a user may choose as the partition key (the Spark
# mapping of the reference's single user-chosen pk path, CosmosDb.cs:88-90,
# read back at :46 and threaded into the edge query at Neo4j.cs:70)
_PK_CHOICES = ("repo", "path", "commit", "lang")


def run_materialize(
    triples: DataFrame,
    entity_map: DataFrame,
    cfg: PipelineConfig,
) -> tuple[DataFrame, DataFrame]:
    """triples + entity_map → (nodes, edges) document DataFrames.

    ``cfg.partition_key`` names the provenance column used as the sink
    partition key for file/class nodes and edge endpoints — the reference
    threads exactly one such user-chosen key through DDL and the edge
    query (``CosmosDb.cs:46``, ``Migrator.cs:122``, ``Neo4j.cs:70``
    ``a.{partitionKey}, b.{partitionKey}``).  Canonical entity nodes are
    global (no provenance), so they keep the synthetic 2-hex bucket pk.
    """
    pk = cfg.partition_key
    if pk not in _PK_CHOICES:
        raise ValueError(
            f"partition_key must be one of {_PK_CHOICES}, got {pk!r}"
        )
    resolved = _resolved_objects(triples, entity_map)

    # ---- file nodes: ONE shuffle (groupBy subj) -----------------------------
    files = (
        triples.filter(F.col("subj").startswith("file:"))
        .groupBy("subj")
        .agg(
            F.first("repo").alias("repo"),
            F.first("path").alias("path"),
            F.first("commit").alias("commit"),
            F.first("lang").alias("lang"),
            F.first("content_sha").alias("content_sha"),
            F.collect_set(
                F.when(F.col("pred") == "imports-of", F.col("obj"))
            ).alias("imports"),
        )
        .select(
            F.sha2(F.col("subj"), 256).alias("id"),
            F.lit("file").alias("label"),
            F.col(pk).alias("partition_key"),
            rename_reserved_keys(
                F.create_map(
                    F.lit("id"), F.col("subj"),
                    F.lit("path"), F.col("path"),
                    F.lit("commit"), F.col("commit"),
                    F.lit("lang"), F.col("lang"),
                    F.lit("content_sha"), F.col("content_sha"),
                    F.lit("imports"), json_array(F.col("imports")),
                )
            ).alias("properties"),
        )
    )

    # ---- class_def nodes: one shuffle (groupBy class subject) ---------------
    class_defs = (
        triples.filter(F.col("pred") == "defines-class")
        .groupBy(
            F.concat_ws(
                ":", F.lit("class"), F.col("repo"), F.col("path"), F.col("obj")
            ).alias("csubj")
        )
        .agg(
            F.first("obj").alias("name"),
            F.first("subj").alias("fsubj"),
            F.first(pk).alias("pk_val"),
        )
        .select(
            F.sha2(F.col("csubj"), 256).alias("id"),
            F.lit("class_def").alias("label"),
            F.col("pk_val").alias("partition_key"),
            rename_reserved_keys(
                F.create_map(
                    F.lit("name"), F.col("name"),
                    F.lit("file"), F.col("fsubj"),
                )
            ).alias("properties"),
        )
    )

    # ---- canonical entity nodes: one shuffle (groupBy canonical) ------------
    entities = (
        resolved.groupBy("obj_canonical", "obj_kind")
        .agg(F.collect_set("obj").alias("surfaces"))
        .select(
            F.col("obj_canonical").alias("id"),
            F.col("obj_kind").alias("label"),
            _entity_bucket(F.col("obj_canonical")).alias("partition_key"),
            rename_reserved_keys(
                F.create_map(
                    F.lit("surfaces"), json_array(F.col("surfaces")),
                    F.lit("kind"), F.col("obj_kind"),
                )
            ).alias("properties"),
        )
    )

    # branch ids cannot collide (sha of disjoint prefixes) → plain union,
    # no dedup shuffle
    nodes = files.unionByName(class_defs).unionByName(entities)

    # ---- edges: pure projections, no shuffle ---------------------------------
    subj_is_file = F.col("subj").startswith("file:")
    base = resolved.select(
        F.sha2(F.col("subj"), 256).alias("out_id"),
        F.when(subj_is_file, F.lit("file")).otherwise(F.lit("class_def")).alias("out_label"),
        F.col(pk).alias("out_pk"),
        F.col("pred").alias("label"),
        F.col("obj_canonical").alias("in_id"),
        F.col("obj_kind").alias("in_label"),
        _entity_bucket(F.col("obj_canonical")).alias("in_pk"),
        # raw surface keeps the edge id unique even when two variant
        # surfaces in one file canonicalize to the same entity (one edge
        # per extracted triple instance — no dedup shuffle needed)
        F.col("obj").alias("surface"),
        "repo", "path", "commit", "lang", "content_sha",
    )
    defines = triples.filter(F.col("pred") == "defines-class").select(
        F.sha2(F.col("subj"), 256).alias("out_id"),
        F.lit("file").alias("out_label"),
        F.col(pk).alias("out_pk"),
        F.col("pred").alias("label"),
        F.sha2(
            F.concat_ws(":", F.lit("class"), F.col("repo"), F.col("path"), F.col("obj")), 256
        ).alias("in_id"),
        F.lit("class_def").alias("in_label"),
        F.col(pk).alias("in_pk"),
        F.col("obj").alias("surface"),
        "repo", "path", "commit", "lang", "content_sha",
    )
    all_edges = base.unionByName(defines)
    edges = all_edges.withColumn(
        "id",
        edge_namespace(
            F.sha2(
                F.concat_ws(
                    "|", "out_id", "label", "in_id", "surface", "repo", "path"
                ),
                256,
            )
        ),
    ).select(
        "id", "label", "out_id", "in_id", "out_label", "in_label",
        "out_pk", "in_pk",
        # provenance stays FLAT through shuffle + parquet: a
        # map<string,string> bag repeats its keys in every row, mixes all
        # value domains into one parquet column chunk (kills dictionary
        # encoding) and dominated materialize's shuffle bytes — the r1
        # scaling bottleneck.  The GraphSON property bag is a zero-shuffle
        # READ-TIME projection: kg.materialize.documents.as_graphson_edges.
        "repo", "path", "commit", "lang", "content_sha",
    )
    return nodes, edges
