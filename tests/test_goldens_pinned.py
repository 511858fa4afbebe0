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
