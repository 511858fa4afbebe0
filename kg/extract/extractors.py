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

# A leading \b defeats CPython re's literal-prefix fast scan (the
# compiled program starts with a boundary assertion, so the engine
# attempts a match at EVERY position instead of memchr-skipping to the
# literal — measured ~0.9 s per pattern per 12k files, 4× the anchored
# import patterns).  These patterns therefore start with their literal
# and the word-start boundary is re-checked at the match site
# (``_word_start_matches``) — same semantics, literal-scan speed.
_JAVA_IMPORT = re.compile(r"^import\s+([\w.]+)\s*;", re.M)
_CS_USING = re.compile(r"^using\s+([\w.]+)\s*;", re.M)
_JAVA_CLASS = re.compile(r"class\s+(\w+)(?:\s+extends\s+([\w.]+))?")
_CS_CLASS = re.compile(r"class\s+(\w+)(?:\s*:\s*([\w.]+))?")

# -- js -----------------------------------------------------------------
_JS_IMPORT = re.compile(r"^import\s+.*?\bfrom\s+['\"]([^'\"]+)['\"]", re.M)
_JS_REQUIRE = re.compile(r"require\(\s*['\"]([^'\"]+)['\"]\s*\)")
_JS_CLASS = re.compile(r"class\s+(\w+)(?:\s+extends\s+([\w.]+))?")

_WORD = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)


def _word_start_matches(pat: re.Pattern, content: str):
    """``pat.finditer`` restricted to matches at a word boundary — the
    \\b the pattern itself omits to stay literal-prefixed (see above)."""
    for m in pat.finditer(content):
        s = m.start()
        if s and content[s - 1] in _WORD:
            continue
        yield m


# Call-site scan, engineered around CPython `re`'s cost model (profiled:
# the old per-line `\b([A-Za-z_]\w*)\s*\(` findall was ~80% of extract's
# python time — a name-first pattern forces a match attempt at EVERY word
# position, ~0.5 ms/file of backtracking):
#
# * candidate lines are joined with ')' — not \w (no identifier spans the
#   boundary), not \s (the `name\s*(` gap cannot cross it), not '(' (it
#   cannot complete a call) — so the joined text yields exactly the
#   per-line matches;
# * the JOINED TEXT IS REVERSED and scanned with a literal-'('-anchored
#   pattern: the regex engine memchr-skips to real '(' occurrences
#   instead of attempting at every word, visiting only actual call
#   sites.  The reversed capture is the maximal \w-run left of '(';
#   re-reversed, it equals the original match iff its first char is a
#   letter/underscore (`\b[A-Za-z_]` ⇒ the full run must start the word
#   — "9foo(" matched neither before nor now).  Match ORDER flips, but
#   extraction dedups per file with a set, so the triple SET — and every
#   golden — is unchanged (measured 576 → ~150 µs/file).
_REV_CALL = re.compile(r"\(\s*(\w+)")
_NAME_START = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")


def _rev_call_names(joined: str) -> list[str]:
    return [
        name
        for rev in _REV_CALL.findall(joined[::-1])
        if (name := rev[::-1])[0] in _NAME_START
        and name not in _CALL_STOPWORDS
    ]


def _py_calls(content: str) -> list[str]:
    kept: list[str] = []
    for line in content.splitlines():
        s = line.lstrip()
        if s.startswith(("def ", "class ", "import ", "from ", "#", '"', "'")):
            continue
        kept.append(line)
    return _rev_call_names(")".join(kept))


def _curly_calls(content: str) -> list[str]:
    """Calls in brace languages: statement lines (ending ``;``) only —
    declarations end in ``{`` so method/class signatures never match."""
    kept: list[str] = []
    for line in content.splitlines():
        s = line.strip()
        if not s.endswith(";") or s.startswith(("import ", "using ", "//")):
            continue
        kept.append(s)
    return _rev_call_names(")".join(kept))


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
        for mm in _word_start_matches(_JAVA_CLASS, content):
            cls, base = mm.group(1), mm.group(2)
            out.append(("defines-class", cls, None))
            if base:
                out.append(("extends", base, cls))
        for c in _curly_calls(content):
            out.append(("calls-function", c, None))
    elif lang == "js":
        for m in _JS_IMPORT.findall(content):
            out.append(("imports-of", m, None))
        for mm in _word_start_matches(_JS_REQUIRE, content):
            out.append(("imports-of", mm.group(1), None))
        for mm in _word_start_matches(_JS_CLASS, content):
            cls, base = mm.group(1), mm.group(2)
            out.append(("defines-class", cls, None))
            if base:
                out.append(("extends", base, cls))
        for c in _curly_calls(content):
            out.append(("calls-function", c, None))
    elif lang == "cs":
        for m in _CS_USING.findall(content):
            out.append(("imports-of", m, None))
        for mm in _word_start_matches(_CS_CLASS, content):
            cls, base = mm.group(1), mm.group(2)
            out.append(("defines-class", cls, None))
            if base:
                out.append(("extends", base, cls))
        for c in _curly_calls(content):
            out.append(("calls-function", c, None))
    # unknown languages produce no triples (schemaless tolerance, mirroring
    # the reference's pass-through property handling, Migrator.cs:103-109)
    return out
