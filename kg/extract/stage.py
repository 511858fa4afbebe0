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

from kg.datagen import class_subj, file_subj
from kg.extract.extractors import extract_triples
from kg.schemas import TRIPLES


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ("subj", "pred", "obj", "repo", "path", "commit", "lang", "content_sha")
    for pdf in batches:
        out: dict[str, list] = {c: [] for c in cols}
        ap = {c: out[c].append for c in cols}
        for repo, path, commit, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
        ):
            sha = hashlib.sha256(content.encode()).hexdigest()
            fsubj = file_subj(repo, path)
            # dedup inside the batch: triples can only repeat within one
            # file (subjects embed repo:path), so a per-file set gives the
            # same result as a global dropDuplicates WITHOUT the full
            # corpus-wide shuffle that would cost at 10^12-file scale
            seen: set[tuple] = set()
            for pred, obj, owner in extract_triples(lang, content):
                if (pred, obj, owner) in seen:
                    continue
                seen.add((pred, obj, owner))
                ap["subj"](class_subj(repo, path, owner) if owner else fsubj)
                ap["pred"](pred)
                ap["obj"](obj)
                ap["repo"](repo)
                ap["path"](path)
                ap["commit"](commit)
                ap["lang"](lang)
                ap["content_sha"](sha)
        yield pd.DataFrame(out)


def triples_from_source(source_files: DataFrame) -> DataFrame:
    """Pure transform: source_files DataFrame → triples DataFrame.

    Column pruning happens automatically: mapInPandas declares its input
    via the upstream select, so the parquet scan reads only the 5 needed
    columns.
    """
    pruned = source_files.select("repo", "path", "commit", "lang", "content")
    return pruned.mapInPandas(_extract_batches, schema=TRIPLES)


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
