"""kg — a from-scratch PySpark-native knowledge-graph construction engine.

Capability-equivalent (NOT a port) to the reference
``syedhassaanahmed/neo-to-cosmos`` (a sharded, resumable Neo4j→Cosmos
graph copier, see ``/root/reference/NeoToCosmos/Migrator.cs``): this
package generalizes the reference's extract→materialize flow into a full
extract → link → canonicalize → materialize KG-construction pipeline over
a table of source-code repositories, expressed entirely in the PySpark
DataFrame API (Catalyst-optimized; pandas/Arrow UDFs only where built-in
operators cannot express the semantics).

Layout (SURVEY.md §7):
    kg.conf          pipeline configuration (paths, parallelism, salt)
    kg.session       SparkSession factory tuned for the workload
    kg.schemas       fixed StructType schemas for every stage
    kg.datagen       deterministic synthetic ``source_files`` corpus
    kg.extract       vectorized triple extraction (imports-of, defines-class,
                     calls-function, extends)
    kg.link          MinHash-LSH blocking + Jaccard/embedding scorer
    kg.canonicalize  large-star/small-star connected components
    kg.materialize   GraphSON-style node/edge document emission
    kg.lineage       per-partition lineage + idempotent resume
    kg.pipeline      stage orchestration
    kg.ops           large-scale training-data operators (dedup, ANN,
                     text analysis, multimodal plumbing)
"""

__version__ = "0.1.0"
