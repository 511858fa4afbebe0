"""Drift guard: the committed golden fixtures pin the generator AND the
extractor.  If either changes behavior, these fail loudly — protecting
the P/R-vs-golden metric from silent redefinition across rounds."""

from __future__ import annotations

import os

import pandas as pd

from kg.datagen import golden_triples, local_corpus

HERE = os.path.dirname(os.path.abspath(__file__))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_corpus_matches_committed_fixture():
    pinned = pd.read_parquet(f"{HERE}/goldens/source_files_100.parquet")
    now = local_corpus(100)
    pd.testing.assert_frame_equal(_sorted(pinned), _sorted(now))


def test_golden_triples_match_committed_fixture():
    pinned = pd.read_parquet(f"{HERE}/goldens/golden_triples_100.parquet")
    now = golden_triples(100)
    pd.testing.assert_frame_equal(_sorted(pinned), _sorted(now))


def test_golden_triples_200_is_closed_form():
    """The kg_triples DuckDB oracle fixture IS the analytic golden — not
    extractor output — so the driver's kg_triples check is a true oracle."""
    pinned = pd.read_parquet(f"{HERE}/goldens/golden_triples_200.parquet")
    now = golden_triples(200)[list(pinned.columns)]
    pd.testing.assert_frame_equal(_sorted(pinned), _sorted(now))


def test_pinned_kg_outputs_match_pipeline(spark):
    """The pinned entity_map/nodes/edges goldens backing the kg_* DuckDB
    oracles must equal a fresh pipeline run over the same 200-file corpus
    — otherwise the driver's oracle check silently goes stale."""
    import __spark_entry__ as e

    out = e._kg_outputs(spark)
    from pyspark.sql import functions as F

    fresh = {
        "entity_map": out["entity_map"].toPandas(),
        # incl. the serialized property bag: O9 (prop_ renames) and O10
        # (array→JSON imports) stay pinned end-to-end via the oracle
        "kg_nodes": out["nodes"].select(
            "id", "label", "partition_key",
            F.to_json(F.array_sort(F.map_entries("properties"))).alias(
                "properties_json"
            ),
        ).toPandas(),
        "kg_edges": out["edges"].select(
            "id", "label", "out_id", "in_id", "out_label", "in_label",
            "out_pk", "in_pk",
        ).toPandas(),
    }
    for name, now in fresh.items():
        pinned = pd.read_parquet(f"{HERE}/goldens/golden_{name}_200.parquet")
        pd.testing.assert_frame_equal(
            _sorted(pinned), _sorted(now[list(pinned.columns)])
        )
    # and the extractor agrees with the closed-form triple golden
    tr = out["triples"].toPandas()
    gt = golden_triples(200)[list(tr.columns)]
    pd.testing.assert_frame_equal(_sorted(gt), _sorted(tr))
