"""Per-language triple extractors (pure Python, regex-based).

These are the "tree-sitter-style" extraction rules (BASELINE.json
north_star) for the four predicates ``imports-of``, ``defines-class``,
``calls-function``, ``extends``.  Pure functions over one file's text so
they unit-test without Spark; the Spark stage batches them through
``mapInPandas`` (Arrow-vectorized — regex work runs in C via the ``re``
module over whole batches, never per-row Python UDF serde).

Compiled once per Python worker at import time.
"""

from __future__ import annotations

import re

# call names that are syntax, not user calls
_CALL_STOPWORDS = frozenset(
    {
        "if",
        "for",
        "while",
        "switch",
        "return",
        "new",
        "catch",
        "super",
        "require",
        "print",
        "len",
    }
)

# -- python -------------------------------------------------------------
_PY_IMPORT = re.compile(r"^import\s+([\w.]+)", re.M)
_PY_FROM_IMPORT = re.compile(r"^from\s+([\w.]+)\s+import\b", re.M)
_PY_CLASS = re.compile(r"^class\s+(\w+)\s*(?:\(\s*([\w.]+)[^)]*\))?\s*:", re.M)
_PY_CALL = re.compile(r"\b([A-Za-z_]\w*)\s*\(")

# -- java / cs ----------------------------------------------------------
_JAVA_IMPORT = re.compile(r"^import\s+([\w.]+)\s*;", re.M)
_CS_USING = re.compile(r"^using\s+([\w.]+)\s*;", re.M)
_JAVA_CLASS = re.compile(r"\bclass\s+(\w+)(?:\s+extends\s+([\w.]+))?")
_CS_CLASS = re.compile(r"\bclass\s+(\w+)(?:\s*:\s*([\w.]+))?")

# -- js -----------------------------------------------------------------
_JS_IMPORT = re.compile(r"^import\s+.*?\bfrom\s+['\"]([^'\"]+)['\"]", re.M)
_JS_REQUIRE = re.compile(r"\brequire\(\s*['\"]([^'\"]+)['\"]\s*\)")
_JS_CLASS = re.compile(r"\bclass\s+(\w+)(?:\s+extends\s+([\w.]+))?")

_CURLY_CALL = re.compile(r"\b([A-Za-z_]\w*)\s*\(")


def _py_calls(content: str) -> list[str]:
    out: list[str] = []
    for line in content.splitlines():
        s = line.lstrip()
        if s.startswith(("def ", "class ", "import ", "from ", "#", '"', "'")):
            continue
        for name in _PY_CALL.findall(line):
            if name not in _CALL_STOPWORDS:
                out.append(name)
    return out


def _curly_calls(content: str) -> list[str]:
    """Calls in brace languages: statement lines (ending ``;``) only —
    declarations end in ``{`` so method/class signatures never match."""
    out: list[str] = []
    for line in content.splitlines():
        s = line.strip()
        if not s.endswith(";") or s.startswith(("import ", "using ", "//")):
            continue
        for name in _CURLY_CALL.findall(s):
            if name not in _CALL_STOPWORDS:
                out.append(name)
    return out


def extract_triples(lang: str, content: str) -> list[tuple[str, str, str | None]]:
    """Extract ``(pred, obj, owner_class)`` tuples from one file.

    ``owner_class`` is set only for ``extends`` rows (the subject is the
    defined class, not the file).  Subject ids are assembled by the caller
    which knows (repo, path).
    """
    out: list[tuple[str, str, str | None]] = []
    if lang == "python":
        for m in _PY_IMPORT.findall(content):
            out.append(("imports-of", m, None))
        for m in _PY_FROM_IMPORT.findall(content):
            out.append(("imports-of", m, None))
        for cls, base in _PY_CLASS.findall(content):
            out.append(("defines-class", cls, None))
            if base:
                out.append(("extends", base, cls))
        for c in _py_calls(content):
            out.append(("calls-function", c, None))
    elif lang == "java":
        for m in _JAVA_IMPORT.findall(content):
            out.append(("imports-of", m, None))
        for cls, base in _JAVA_CLASS.findall(content):
            out.append(("defines-class", cls, None))
            if base:
                out.append(("extends", base, cls))
        for c in _curly_calls(content):
            out.append(("calls-function", c, None))
    elif lang == "js":
        for m in _JS_IMPORT.findall(content):
            out.append(("imports-of", m, None))
        for m in _JS_REQUIRE.findall(content):
            out.append(("imports-of", m, None))
        for cls, base in _JS_CLASS.findall(content):
            out.append(("defines-class", cls, None))
            if base:
                out.append(("extends", base, cls))
        for c in _curly_calls(content):
            out.append(("calls-function", c, None))
    elif lang == "cs":
        for m in _CS_USING.findall(content):
            out.append(("imports-of", m, None))
        for cls, base in _CS_CLASS.findall(content):
            out.append(("defines-class", cls, None))
            if base:
                out.append(("extends", base, cls))
        for c in _curly_calls(content):
            out.append(("calls-function", c, None))
    # unknown languages produce no triples (schemaless tolerance, mirroring
    # the reference's pass-through property handling, Migrator.cs:103-109)
    return out
