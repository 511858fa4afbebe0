"""Extract stage: source_files → triples.

Spark plan shape (SURVEY.md §2.1 / §7 step 1):

    parquet/iceberg scan (column-pruned: repo, path, commit, lang, content)
      → mapInPandas (Arrow batches; compiled regex per language — the only
        Python in the pipeline's hot path)
      → write triples, partitioned for downstream joins

The per-row lineage invariant (BASELINE.json input_hint): each emitted
triple carries ``content_sha = sha256(content)`` computed *inside the same
batch* the content was read in, so the hash provably derives from the bytes
that were scanned (reference analogue: the page checkpoint only advances
after a successful write, Migrator.cs:80-81).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from kg.extract.extractors import extract_triples
from kg.schemas import TRIPLES


_NESTED_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content_sha string, trips array<struct<pred string, obj string, "
    "owner string>>"
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # ONE row per FILE with a nested (pred, obj, owner) list — not one
    # row per triple: the per-file provenance columns (repo, path,
    # commit, lang, content_sha) are constant across a file's ~10
    # triples, so the flat shape shipped every one of them ~10× through
    # the Arrow boundary and paid ~8 Python list appends per triple.
    # The nested shape crosses once per file; the explode and the
    # subject-string assembly happen JVM-side in codegen
    # (triples_from_source), where they are a projection, not Python
    # work.  Measured: extract compute (noop sink) 7.2 s → 5.3-6.1 s at
    # the 200k-file bench under like-for-like load, bit-identical output.
    for pdf in batches:
        shas: list[str] = []
        trips: list[list[tuple]] = []
        for lang, content in zip(pdf["lang"], pdf["content"]):
            shas.append(hashlib.sha256(content.encode()).hexdigest())
            # dedup inside the file: triples can only repeat within one
            # file (subjects embed repo:path), so a per-file set gives
            # the same result as a global dropDuplicates WITHOUT the
            # full corpus-wide shuffle that would cost at 10^12-file
            # scale
            seen: set[tuple] = set()
            out: list[tuple] = []
            for tup in extract_triples(lang, content):
                if tup in seen:
                    continue
                seen.add(tup)
                out.append(tup)
            trips.append(out)
        yield pd.DataFrame(
            {
                "repo": pdf["repo"],
                "path": pdf["path"],
                "commit": pdf["commit"],
                "lang": pdf["lang"],
                "content_sha": shas,
                "trips": trips,
            }
        )


def triples_from_source(source_files: DataFrame) -> DataFrame:
    """Pure transform: source_files DataFrame → triples DataFrame.

    Column pruning happens automatically: mapInPandas declares its input
    via the upstream select, so the parquet scan reads only the 5 needed
    columns.  The Python half emits one nested row per file (see
    ``_extract_batches``); the explode back to one row per triple and
    the ``file:``/``class:`` subject assembly are JVM codegen — string
    formats pinned to :func:`kg.datagen.file_subj` /
    :func:`kg.datagen.class_subj` (golden-tested).
    """
    from pyspark.sql import functions as F

    pruned = source_files.select("repo", "path", "commit", "lang", "content")
    nested = pruned.mapInPandas(_extract_batches, schema=_NESTED_SCHEMA)
    t = nested.select(
        "repo", "path", "commit", "lang", "content_sha",
        F.explode("trips").alias("_t"),
    )
    subj = F.when(
        F.col("_t.owner").isNull(),
        F.concat(F.lit("file:"), F.col("repo"), F.lit(":"), F.col("path")),
    ).otherwise(
        F.concat(
            F.lit("class:"), F.col("repo"), F.lit(":"), F.col("path"),
            F.lit(":"), F.col("_t.owner"),
        )
    )
    out = t.select(
        subj.alias("subj"),
        F.col("_t.pred").alias("pred"),
        F.col("_t.obj").alias("obj"),
        "repo", "path", "commit", "lang", "content_sha",
    )
    # sanity: keep the emitted column order pinned to the TRIPLES schema
    assert out.columns == [f.name for f in TRIPLES.fields]
    return out


def run_extract(source_files: DataFrame, engine: str | None = None) -> DataFrame:
    """Stage entry used by the pipeline.

    Output is already unique per (subj, pred, obj, content_sha): the
    extractor dedupes within each file, and cross-file duplicates are
    structurally impossible (subjects embed repo:path, content_sha is
    per-file).  No global dropDuplicates shuffle needed.

    ``engine`` selects the execution path (default: ``KG_EXTRACT_ENGINE``
    env, else ``arrow``): ``arrow`` is the pandas/Arrow contract surface
    (the tree-sitter-capable one); ``jvm`` is the equivalence-tested
    Catalyst twin (``kg.extract.jvm``) — zero Python workers, no Arrow
    content transfer — for deployments whose rules are regex-expressible.
    """
    import os

    engine = engine or os.environ.get("KG_EXTRACT_ENGINE", "arrow")
    if engine == "jvm":
        from kg.extract.jvm import triples_from_source_jvm

        return triples_from_source_jvm(source_files)
    if engine != "arrow":
        raise ValueError(f"unknown extract engine {engine!r} (arrow|jvm)")
    return triples_from_source(source_files)
