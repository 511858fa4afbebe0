"""Property-based tests (hypothesis) for the pure functions — extraction
robustness on arbitrary text, hash stability, generator determinism."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kg.datagen import expected_triples, file_spec, make_file
from kg.extract.extractors import extract_triples
from kg.ops.dedup import _simhash_fold_fn

# small chunk so hypothesis-sized inputs also exercise chunk boundaries
_simhash_batches = _simhash_fold_fn(chunk_tokens=7)

LANGS = ["python", "java", "js", "cs", "unknown"]


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(LANGS), st.text(max_size=2000))
def test_extractor_never_crashes(lang, text):
    out = extract_triples(lang, text)
    for pred, obj, owner in out:
        assert pred in {"imports-of", "defines-class", "calls-function", "extends"}
        assert isinstance(obj, str) and obj
        assert owner is None or isinstance(owner, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_extracted_objects_appear_in_text(text):
    """Every extracted object string is a substring of the input —
    extraction never invents identifiers."""
    for lang in ("python", "java", "js", "cs"):
        for _pred, obj, _ in extract_triples(lang, text):
            assert obj in text


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=20
        ),
        min_size=1,
        max_size=8,
    )
)
def test_simhash_fold_matches_naive(rows):
    """The whole-batch vectorized bit-fold equals a naive per-row fold
    for arbitrary pre-hashed token lists (incl. empty rows)."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {"id": [str(i) for i in range(len(rows))], "hashes": rows}
    )
    out = next(_simhash_batches(iter([pdf])))
    got = dict(zip(out["id"], out["simhash"]))

    for i, hs in enumerate(rows):
        if not hs:
            assert got[str(i)] == 0
            continue
        u = np.array(hs, dtype=np.int64).view(np.uint64)
        sim = np.uint64(0)
        for b in range(64):
            votes = int(((u >> np.uint64(b)) & np.uint64(1)).sum()) * 2 - len(hs)
            if votes > 0:
                sim |= np.uint64(1) << np.uint64(b)
        assert got[str(i)] == np.int64(sim.astype(np.int64))


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000))
def test_file_generation_total_function(i):
    """make_file/expected_triples are total and self-consistent for any
    index (the distributed generator relies on this)."""
    f = make_file(i)
    assert set(f) == {"repo", "path", "commit", "lang", "content"}
    spec = file_spec(i)
    exp = expected_triples(i)
    n_expected = len(spec["imports"]) + 2 * len(spec["classes"]) + len(spec["calls"])
    assert len(exp) == n_expected
    for t in exp:
        assert t["repo"] == f["repo"] and t["path"] == f["path"]
