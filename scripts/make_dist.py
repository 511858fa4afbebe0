"""Build ``dist/kg.zip`` for ``spark-submit --py-files``.

The north-star launch mode ships the ``kg`` package to every executor as
a zip (the jobs/*.py docstrings' ``--py-files dist/kg.zip``); this is the
one packaging step between the repo and a real cluster.  The archive is
DETERMINISTIC — sorted member order, fixed timestamps, ``__pycache__``
excluded — so rebuilding an unchanged tree yields a byte-identical zip
(the same reproducibility contract as the engine's sha256-derived ids).

    python scripts/make_dist.py          # writes dist/kg.zip, prints path
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(repo: str = REPO, out: str | None = None) -> str:
    """Zip the ``kg`` package rooted at ``repo`` into ``out`` (default
    ``<repo>/dist/kg.zip``) and return the archive path."""
    out = out or os.path.join(repo, "dist", "kg.zip")
    out_dir = os.path.dirname(out)
    if out_dir:  # a bare filename means cwd — makedirs("") would raise
        os.makedirs(out_dir, exist_ok=True)
    pkg = os.path.join(repo, "kg")
    members: list[tuple[str, str]] = []
    for base, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            path = os.path.join(base, f)
            members.append((path, os.path.relpath(path, repo)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path, arcname in members:
            # fixed timestamp: zip bytes depend only on file CONTENTS
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(path, "rb") as fh:
                zf.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    print(build())
