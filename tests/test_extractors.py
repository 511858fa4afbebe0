"""Unit tests on the pure extraction functions (no Spark).

Mirrors the reference's unit-test strategy: small, pure-function tests
(NeoToCosmos.Unit.Tests/MigratorTests.cs) — here per-language, per-predicate.
"""

from __future__ import annotations

import hashlib

from kg.datagen import (
    class_subj,
    expected_triples,
    file_subj,
    golden_triples,
    local_corpus,
    make_file,
)
from kg.extract.extractors import extract_triples


def test_python_imports_and_class():
    src = "import numpy\nfrom collections import deque\nclass A(Base):\n    pass\n"
    got = extract_triples("python", src)
    assert ("imports-of", "numpy", None) in got
    assert ("imports-of", "collections", None) in got
    assert ("defines-class", "A", None) in got
    assert ("extends", "Base", "A") in got


def test_python_decoys_ignored():
    src = "# import fake\n'''import fake2'''\nx = 1\n"
    assert extract_triples("python", src) == []


def test_java_import_class_call():
    src = (
        "import a.b.c;\npublic class X extends Y {\n"
        "    public void run() {\n        fetch(x);\n    }\n}\n"
    )
    got = extract_triples("java", src)
    assert ("imports-of", "a.b.c", None) in got
    assert ("defines-class", "X", None) in got
    assert ("extends", "Y", "X") in got
    assert ("calls-function", "fetch", None) in got
    # method declaration (ends with '{') must NOT be a call
    assert ("calls-function", "run", None) not in got


def test_js_import_variants():
    src = "import a from 'mod1';\nconst b = require('mod2');\n"
    got = extract_triples("js", src)
    assert ("imports-of", "mod1", None) in got
    assert ("imports-of", "mod2", None) in got
    assert all(p != "calls-function" for p, _, _ in got)


def test_cs_using_and_inheritance():
    src = "using Sys.Net;\npublic class C : B {\n    public void R() {\n        parse(x);\n    }\n}\n"
    got = extract_triples("cs", src)
    assert ("imports-of", "Sys.Net", None) in got
    assert ("defines-class", "C", None) in got
    assert ("extends", "B", "C") in got
    assert ("calls-function", "parse", None) in got


def test_unknown_lang_empty():
    assert extract_triples("cobol", "import x") == []


def test_golden_parity_closed_form():
    """Extractor output == analytically derived goldens for 300 files."""
    for i in range(300):
        f = make_file(i)
        got = set()
        for pred, obj, owner in extract_triples(f["lang"], f["content"]):
            subj = (
                class_subj(f["repo"], f["path"], owner)
                if owner
                else file_subj(f["repo"], f["path"])
            )
            got.add((subj, pred, obj))
        exp = {(t["subj"], t["pred"], t["obj"]) for t in expected_triples(i)}
        assert got == exp, f"file {i} ({f['lang']})"


def test_content_sha_invariant():
    """Golden content_sha equals sha256 of the generated content bytes."""
    corpus = local_corpus(50)
    gold = golden_triples(50)
    sha_by_path = {
        (r.repo, r.path): hashlib.sha256(r.content.encode()).hexdigest()
        for r in corpus.itertuples()
    }
    for t in gold.itertuples():
        assert t.content_sha == sha_by_path[(t.repo, t.path)]


def test_generator_determinism_and_skew():
    a = local_corpus(200)
    b = local_corpus(200)
    assert a.equals(b)
    hot = (a["repo"] == "org0/repo0").mean()
    assert 0.2 < hot < 0.4  # ~30% hot-repo skew (FIXTURES.md §1)
