"""JVM-side triple extraction: a zero-Python twin of the Arrow path.

Same extraction rules as ``kg.extract.extractors`` (4 predicates x 4
languages), expressed entirely in Catalyst expressions so content bytes
never cross the JVM→Arrow→Python socket.  Same twin pattern as
``simhash_col_jvm``: the pandas/Arrow path (``triples_from_source``)
remains the default contract surface (BASELINE.json input_hint:
vectorized pandas/Arrow UDFs — the honest stand-in for tree-sitter,
which *must* run in Python workers), and this is the built-in-function
fast path for deployments whose rules are regex-expressible.
Equivalence is enforced by tests: identical triple sets on the synthetic
corpus and on hand-written per-language fixtures, plus a pinned list of
the engines' documented divergence edges (``tests/test_extract_jvm.py``).

Why it exists (BENCH/BASELINE.md round-4 trail): in the 4-instance fleet
proxy, extract degrades worst under contention — each instance's Python
workers re-copy every content byte over the local Arrow socket, and the
fleet's aggregate bandwidth demand exceeds the box cap.  JVM extraction
does the same regex work inside whole-stage codegen, cutting both byte
traffic and busy-thread count (no python workers) per instance.

Engineered around java.util.regex's cost model, the same way
``extractors.py`` is engineered around CPython ``re``'s (a naive port of
the content-wide patterns measured 3-6x slower than the Arrow path —
``Matcher.find`` attempts ``\\b``/``^``-first patterns at every byte):

* content is split into LINES once; every extractor prefilters candidate
  lines with literal ``startswith``/``contains`` (codegen string
  compares, no regex) and runs its regex only on the few short survivors;
* call-site names use the ``extractors.py`` reversed-scan trick in
  Catalyst: ``reverse(joined)`` scanned with the literal-``(``-anchored
  ``\\(\\s*(\\w+)`` (single-char compare per position instead of a
  ``\\w+`` backtrack per word), captures re-reversed;
* two-group class patterns scan for group 0 once and re-extract groups
  from the short matched string, halving full-text scans.

Documented semantic edges vs the Python extractors (pinned in
``test_extract_jvm.py::test_documented_divergences``; none occur in the
synthetic corpus, and all involve broken or adversarial source text):

* Line-local matching: the Python side's multiline patterns let ``\\s+``
  / ``[^)]*`` cross newlines (``"from x\\nimport y"``, a class signature
  split across lines, ``import a.b\\n;``); here matches never span lines.
* Word-start filtering is ``\\b`` semantics, while the Python side
  post-filters ``finditer`` (a *rejected* match still consumes its span
  there — observable only when a real match starts inside a rejected
  one, e.g. ``"xclass class Foo"``; ``\\b`` is what the Python comment
  documents as intended).
* ``\\w`` is ASCII here (Java default) vs Unicode in CPython; stripping
  is ``\\s``-based in both (``regexp_replace``, not space-only ``trim``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg.extract.extractors import _CALL_STOPWORDS
from kg.schemas import TRIPLES

_TRIPLE_ARR = "array<struct<pred:string,obj:string,owner:string>>"

# line-local ports of the extractors.py patterns ((?m)^ became "applies
# to a line element"; see module docstring for the cross-line edges)
_PY_IMPORT = r"^import\s+([\w.]+)"
_PY_FROM_IMPORT = r"^from\s+([\w.]+)\s+import\b"
_PY_CLASS = r"^class\s+(\w+)\s*(?:\(\s*([\w.]+)[^)]*\))?\s*:"
_JAVA_IMPORT = r"^import\s+([\w.]+)\s*;"
_CS_USING = r"^using\s+([\w.]+)\s*;"
_JAVA_CLASS = r"\bclass\s+(\w+)(?:\s+extends\s+([\w.]+))?"
_CS_CLASS = r"\bclass\s+(\w+)(?:\s*:\s*([\w.]+))?"
_JS_CLASS = _JAVA_CLASS  # identical rule in extractors.py
_JS_IMPORT = r"^import\s+.*?\bfrom\s+['\"]([^'\"]+)['\"]"
_JS_REQUIRE = r"\brequire\(\s*['\"]([^'\"]+)['\"]\s*\)"
_REV_CALL = r"\(\s*(\w+)"  # scanned over reverse(joined), as extractors.py


def _lines(content: Column) -> Column:
    return F.split(content, "\n")


def _triple(pred: str, obj: Column, owner: Column | None = None) -> Column:
    return F.struct(
        F.lit(pred).alias("pred"),
        obj.alias("obj"),
        (owner if owner is not None else F.lit(None).cast("string")).alias(
            "owner"
        ),
    )


def _starts_any(col: Column, prefixes: tuple[str, ...]) -> Column:
    cond = col.startswith(prefixes[0])
    for p in prefixes[1:]:
        cond = cond | col.startswith(p)
    return cond


def _line_imports(
    lines: Column, prefix: str, pattern: str, pred: str = "imports-of"
) -> Column:
    """Lines beginning with the literal ``prefix`` (the patterns are
    ``^``-anchored with no leading whitespace, so a raw-line startswith
    is the exact prefilter), then the regex on the short survivor."""
    objs = F.filter(
        F.transform(
            F.filter(lines, lambda l: l.startswith(prefix)),
            lambda l: F.regexp_extract(l, pattern, 1),
        ),
        lambda o: o != "",
    )
    return F.transform(objs, lambda o: _triple(pred, o))


def _cls_structs(matches: Column, pattern: str) -> Column:
    """(defines-class, extends?) triples from group-0 match strings —
    group re-extraction runs on the short matched text only."""
    return F.flatten(
        F.transform(
            matches,
            lambda m: F.when(
                F.regexp_extract(m, pattern, 2) != "",
                F.array(
                    _triple("defines-class", F.regexp_extract(m, pattern, 1)),
                    _triple(
                        "extends",
                        F.regexp_extract(m, pattern, 2),
                        F.regexp_extract(m, pattern, 1),
                    ),
                ),
            ).otherwise(
                F.array(
                    _triple("defines-class", F.regexp_extract(m, pattern, 1))
                )
            ),
        )
    )


def _py_classes(lines: Column) -> Column:
    """``^class`` is line-anchored and the corpus declares classes on one
    line, so candidates = startswith and at most one match per line."""
    return _cls_structs(
        F.flatten(
            F.transform(
                F.filter(lines, lambda l: l.startswith("class")),
                lambda l: F.regexp_extract_all(
                    l, F.lit(_PY_CLASS), F.lit(0)
                ),
            )
        ),
        _PY_CLASS,
    )


def _curly_classes(lines: Column, pattern: str) -> Column:
    """``class`` can appear mid-line in brace languages; literal
    ``contains`` prefilter, then the ``\\b``-anchored scan (possibly
    multiple matches) on the short candidate line only."""
    return _cls_structs(
        F.flatten(
            F.transform(
                F.filter(lines, lambda l: l.contains("class")),
                lambda l: F.regexp_extract_all(l, F.lit(pattern), F.lit(0)),
            )
        ),
        pattern,
    )


def _js_requires(lines: Column) -> Column:
    objs = F.flatten(
        F.transform(
            F.filter(lines, lambda l: l.contains("require(")),
            lambda l: F.regexp_extract_all(l, F.lit(_JS_REQUIRE), F.lit(1)),
        )
    )
    return F.transform(objs, lambda o: _triple("imports-of", o))


def _call_triples(joined: Column) -> Column:
    """Call-site names from the ')'-joined candidate lines (no identifier
    or ``name\\s*(`` gap spans a ')'), via the reversed literal-anchored
    scan; a reversed capture is a real call name iff it (re-reversed)
    starts with a letter/underscore — ``rlike`` on the short name, the
    ``_NAME_START`` check of extractors.py."""
    names = F.array_except(
        F.filter(
            F.transform(
                F.regexp_extract_all(
                    F.reverse(joined), F.lit(_REV_CALL), F.lit(1)
                ),
                lambda r: F.reverse(r),
            ),
            lambda n: n.rlike(r"^[A-Za-z_]"),
        ),
        F.array(*[F.lit(s) for s in sorted(_CALL_STOPWORDS)]),
    )
    return F.transform(names, lambda n: _triple("calls-function", n))


_PY_SKIP = ("def ", "class ", "import ", "from ", "#", '"', "'")


def _py_call_lines(lines: Column) -> Column:
    """Python candidate lines: lstrip for the startswith test, but the
    ORIGINAL line is what joins (as ``_py_calls`` does)."""
    kept = F.filter(
        lines,
        lambda l: ~_starts_any(
            F.regexp_replace(l, r"^\s+", ""), _PY_SKIP
        ),
    )
    return F.array_join(kept, ")")


_CURLY_SKIP = ("import ", "using ", "//")


def _curly_call_lines(lines: Column) -> Column:
    """Statement lines only (stripped line ends in ';'), joined from the
    STRIPPED lines (as ``_curly_calls`` does).  ``\\s``-strip via regexp
    (``trim`` drops spaces only, Python ``str.strip`` drops all ws)."""
    stripped = F.transform(
        lines, lambda l: F.regexp_replace(l, r"^\s+|\s+$", "")
    )
    kept = F.filter(
        stripped,
        lambda s: s.endswith(";") & ~_starts_any(s, _CURLY_SKIP),
    )
    return F.array_join(kept, ")")


def jvm_triples_col(lang: Column, content: Column) -> Column:
    """array<struct<pred,obj,owner>> of the file's deduped triples —
    ``CaseWhen`` short-circuits, so each row pays only its own language's
    extractors; unknown languages yield an empty array (schemaless
    tolerance, mirroring Migrator.cs:103-109)."""
    lines = _lines(content)
    py = F.concat(
        _line_imports(lines, "import", _PY_IMPORT),
        _line_imports(lines, "from", _PY_FROM_IMPORT),
        _py_classes(lines),
        _call_triples(_py_call_lines(lines)),
    )
    java = F.concat(
        _line_imports(lines, "import", _JAVA_IMPORT),
        _curly_classes(lines, _JAVA_CLASS),
        _call_triples(_curly_call_lines(lines)),
    )
    js = F.concat(
        _line_imports(lines, "import", _JS_IMPORT),
        _js_requires(lines),
        _curly_classes(lines, _JS_CLASS),
        _call_triples(_curly_call_lines(lines)),
    )
    cs = F.concat(
        _line_imports(lines, "using", _CS_USING),
        _curly_classes(lines, _CS_CLASS),
        _call_triples(_curly_call_lines(lines)),
    )
    arr = (
        F.when(lang == "python", py)
        .when(lang == "java", java)
        .when(lang == "js", js)
        .when(lang == "cs", cs)
        .otherwise(F.array().cast(_TRIPLE_ARR))
    )
    # in-file dedup, same scope as the Arrow path's per-file `seen` set
    # (cross-file duplicates stay structurally impossible: subjects embed
    # repo:path) — array_distinct is per-row, no shuffle
    return F.array_distinct(arr)


def triples_from_source_jvm(source_files: DataFrame) -> DataFrame:
    """Pure transform, same contract as ``triples_from_source``: one
    column-pruned scan → per-row array build → explode.  sha2(content,
    256) is computed in the same project as the extraction expressions,
    so the lineage invariant (content_sha derives from the scanned
    bytes) holds identically."""
    pruned = source_files.select("repo", "path", "commit", "lang", "content")
    exploded = pruned.select(
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2("content", 256).alias("content_sha"),
        F.explode(
            jvm_triples_col(F.col("lang"), F.col("content"))
        ).alias("t"),
    )
    out = exploded.select(
        F.when(
            F.col("t.owner").isNotNull(),
            F.concat_ws(
                ":", F.lit("class"), "repo", "path", F.col("t.owner")
            ),
        )
        .otherwise(F.concat_ws(":", F.lit("file"), "repo", "path"))
        .alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        "repo",
        "path",
        "commit",
        "lang",
        "content_sha",
    )
    return out.select(*[f.name for f in TRIPLES.fields])
