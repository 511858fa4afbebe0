"""Deterministic synthetic ``source_files`` corpus with closed-form goldens.

FIXTURES.md §1: templated source files in 4 languages with a known set of
imports / class defs / calls / extends planted per file, so the expected
triple set is derivable analytically (no extraction involved).  Every field
of file *i* is a pure function of *i* — generation is reproducible row-by-row
and therefore distributable (``spark.range(n)`` + ``mapInPandas``) for the
bench-scale corpus without any driver-side materialization.

Repo skew is Zipf-ish: one hot repo holds ~30% of rows (exercises the salted
repartition path, SURVEY.md §2.1).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

# -- vocabulary -------------------------------------------------------------
# Module-name clusters: surfaces within a cluster are variants of one real
# entity (case / extension / qualifier variants) and must be linked by the
# MinHash-LSH + Jaccard stage; surfaces across clusters must NOT link.
MODULE_CLUSTERS: list[list[str]] = [
    ["requests", "Requests", "requests.py"],
    ["numpy", "NumPy"],
    ["pandas", "Pandas", "pandas.core"],
    ["flask", "Flask"],
    ["django", "Django"],
    ["logging"],
    ["collections"],
    ["itertools"],
    ["httpclient", "HttpClient", "http.client"],
    ["sqlalchemy", "SQLAlchemy"],
    # a chain long enough to need >3 CC iterations (FIXTURES.md §3):
    # consecutive surfaces overlap pairwise but the ends do not.
    ["graphlib", "graphlib2", "graphlib23", "graphlib234", "graphlib2345"],
]
MODULES: list[str] = [s for c in MODULE_CLUSTERS for s in c]

CLASS_NAMES = ["Parser", "Loader", "Worker", "Handler", "Router", "Client"]
BASE_CLASSES = ["Base", "Object", "Model", "Thread", "Service"]
CALL_NAMES = ["connect", "fetch", "parse", "dumps", "render", "execute"]

LANGS = ["python", "java", "js", "cs"]
EXT = {"python": "py", "java": "java", "js": "js", "cs": "cs"}

N_ORGS = 7
N_REPOS = 23
HOT_REPO = "org0/repo0"


def _h(i: int, salt: str, mod: int) -> int:
    """Deterministic per-index choice: sha256-derived, platform-stable."""
    d = hashlib.sha256(f"kg:{salt}:{i}".encode()).digest()
    return int.from_bytes(d[:8], "big") % mod


def file_spec(i: int) -> dict:
    """Closed-form spec of synthetic file *i*: metadata + planted entities."""
    # ~30% of rows land in the hot repo
    if _h(i, "hot", 10) < 3:
        repo = HOT_REPO
    else:
        repo = f"org{_h(i, 'org', N_ORGS)}/repo{_h(i, 'repo', N_REPOS)}"
    lang = LANGS[_h(i, "lang", len(LANGS))]
    pkg = _h(i, "pkg", 12)
    mod = _h(i, "mod", 997)
    path = f"src/pkg{pkg}/mod{mod}_{i}.{EXT[lang]}"
    commit = hashlib.sha256(f"{repo}:{path}".encode()).hexdigest()[:40]
    n_imports = 2 + _h(i, "nimp", 4)  # 2..5
    imports = [MODULES[_h(i, f"imp{j}", len(MODULES))] for j in range(n_imports)]
    # dedupe while keeping order (templates emit one import line per module)
    seen: set[str] = set()
    imports = [m for m in imports if not (m in seen or seen.add(m))]
    # two distinct classes per file, each with its own base
    c1 = _h(i, "cls", len(CLASS_NAMES))
    c2 = (c1 + 1 + _h(i, "cls2", len(CLASS_NAMES) - 1)) % len(CLASS_NAMES)
    classes = [
        (CLASS_NAMES[c1], BASE_CLASSES[_h(i, "base", len(BASE_CLASSES))]),
        (CLASS_NAMES[c2], BASE_CLASSES[_h(i, "base2", len(BASE_CLASSES))]),
    ]
    calls_raw = [
        CALL_NAMES[_h(i, f"call{j}", len(CALL_NAMES))]
        for j in range(2 + _h(i, "ncall", 3))  # 2..4
    ]
    seen_c: set[str] = set()
    calls = [c for c in calls_raw if not (c in seen_c or seen_c.add(c))]
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "imports": imports,
        "classes": classes,
        "calls": calls,
        "filler_n": _h(i, "fill", 240),
    }


def _filler(spec: dict) -> tuple[str, str]:
    """Deterministic no-triple body lines (assignment chains + comments).

    Real source files are hundreds of lines; these lines make per-file
    extraction cost realistic (the regexes must scan them) without
    emitting triples — none contain an import keyword, a class keyword,
    or a call-shaped ``name(`` token.  Returns (python_style, curly_style).
    """
    n = 120 + spec["filler_n"]
    py = "\n".join(
        f"v{j} = v{j - 1} + {j * 7 % 31}  # step {j} accumulate" for j in range(1, n)
    )
    curly = "\n".join(
        f"    var v{j} = v{j - 1} + {j * 7 % 31}; // step {j} accumulate"
        for j in range(1, n)
    )
    return py, curly


def _render(spec: dict) -> str:
    lang, imports, classes, calls = (
        spec["lang"],
        spec["imports"],
        spec["classes"],
        spec["calls"],
    )
    fill_py, fill_curly = _filler(spec)
    call_lines_py = "\n".join(f"        x = {c}(x)" for c in calls)
    call_lines_curly = "\n".join(f"        {c}(x);" for c in calls)
    if lang == "python":
        imp = "\n".join(f"import {m}" for m in imports)
        blocks = "\n\n".join(
            f"class {cls}({base}):\n"
            f"    def run(self, x):\n"
            f"{call_lines_py}\n"
            f"        return x\n"
            for cls, base in classes
        )
        return (
            f'"""auto module"""\n'
            f"# import decoy: not a real import\n"
            f"{imp}\n\n\n"
            f"{blocks}\n\n"
            f"v0 = 1\n{fill_py}\n"
        )
    if lang == "java":
        imp = "\n".join(f"import {m};" for m in imports)
        blocks = "\n".join(
            f"public class {cls} extends {base} {{\n"
            f"    public void run(Object x) {{\n"
            f"{call_lines_curly}\n"
            f"    }}\n"
            f"}}\n"
            for cls, base in classes
        )
        return (
            f"// import decoy: not a real import\n"
            f"{imp}\n\n"
            f"{blocks}"
            f"// tail\n{fill_curly}\n"
        )
    if lang == "js":
        imp = "\n".join(f"import x{j} from '{m}';" for j, m in enumerate(imports))
        blocks = "\n".join(
            f"class {cls} extends {base} {{\n"
            f"    run(x) {{\n"
            f"{call_lines_curly}\n"
            f"    }}\n"
            f"}}\n"
            for cls, base in classes
        )
        return (
            f"// import decoy: not a real import\n"
            f"{imp}\n\n"
            f"{blocks}"
            f"// tail\n{fill_curly}\n"
        )
    # cs
    imp = "\n".join(f"using {m};" for m in imports)
    blocks = "\n".join(
        f"public class {cls} : {base} {{\n"
        f"    public void Run(object x) {{\n"
        f"{call_lines_curly}\n"
        f"    }}\n"
        f"}}\n"
        for cls, base in classes
    )
    return (
        f"// using decoy: not a real using\n"
        f"{imp}\n\n"
        f"{blocks}"
        f"// tail\n{fill_curly}\n"
    )


def make_file(i: int) -> dict:
    """Row of the ``source_files`` table for index *i*."""
    spec = file_spec(i)
    return {
        "repo": spec["repo"],
        "path": spec["path"],
        "commit": spec["commit"],
        "lang": spec["lang"],
        "content": _render(spec),
    }


def file_subj(repo: str, path: str) -> str:
    return f"file:{repo}:{path}"


def class_subj(repo: str, path: str, cls: str) -> str:
    return f"class:{repo}:{path}:{cls}"


def expected_triples(i: int) -> list[dict]:
    """Golden (subj, pred, obj) rows for file *i*, derived analytically."""
    spec = file_spec(i)
    repo, path, commit, lang = spec["repo"], spec["path"], spec["commit"], spec["lang"]
    sha = hashlib.sha256(_render(spec).encode()).hexdigest()
    fsubj = file_subj(repo, path)
    prov = {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content_sha": sha,
    }
    out: list[dict] = []
    for m in spec["imports"]:
        out.append({"subj": fsubj, "pred": "imports-of", "obj": m, **prov})
    for cls, base in spec["classes"]:
        out.append({"subj": fsubj, "pred": "defines-class", "obj": cls, **prov})
        out.append(
            {
                "subj": class_subj(repo, path, cls),
                "pred": "extends",
                "obj": base,
                **prov,
            }
        )
    for c in spec["calls"]:
        out.append({"subj": fsubj, "pred": "calls-function", "obj": c, **prov})
    return out


def local_corpus(n: int) -> pd.DataFrame:
    """Small corpora (unit tests / goldens) built driver-side."""
    return pd.DataFrame([make_file(i) for i in range(n)])


def golden_triples(n: int) -> pd.DataFrame:
    return pd.DataFrame([t for i in range(n) for t in expected_triples(i)])


def source_files_df(spark, n: int):
    """Distributed corpus: generation runs inside executors over Arrow
    batches — no driver materialization, scales to bench-size corpora."""
    from kg.schemas import SOURCE_FILES

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("repo", "path", "commit", "lang", "content")
        for pdf in batches:
            rows = [make_file(int(i)) for i in pdf["id"]]
            # dict-of-lists: columnar construction is ~5× faster than
            # pandas' list-of-dicts path at Arrow-batch sizes
            yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})

    # 4× finer than the core count: variable per-file cost would otherwise
    # leave straggler tasks at low parallelism (tail latency)
    n_parts = 4 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # numPartitions on range: parallel generation without a shuffle
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        gen, schema=SOURCE_FILES
    )
