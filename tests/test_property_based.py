"""Property-based tests (hypothesis) for the pure functions — extraction
robustness on arbitrary text, hash stability, generator determinism."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kg.datagen import expected_triples, file_spec, make_file
from kg.extract.extractors import extract_triples
from kg.ops.dedup import hash_token

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


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=100))
def test_hash_token_is_64bit_and_stable(t):
    h = hash_token(t)
    assert 0 <= h < 2**64
    assert h == hash_token(t)


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
