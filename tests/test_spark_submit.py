"""North-rule launch path: the pipeline runs via real
``spark-submit --py-files dist/kg.zip`` with NO repo on the path.

The north star ships the job to a cluster as ``spark-submit --py-files``
(reference parity: the migrator is likewise a self-contained deployable,
``dotnet NeoToCosmos.dll``).  Every other test drives the library from
the repo cwd — this one proves the PACKAGING: the job script is copied
OUT of the repo (its ``sys.path`` fallback then points at an empty temp
dir), the subprocess runs from that temp cwd, and ``import kg`` on the
driver AND in the Python workers must resolve from the ``--py-files``
zip alone.  A broken zip (missing module, bad layout) fails here and
nowhere else.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _make_dist(out: str) -> str:
    spec = importlib.util.spec_from_file_location(
        "make_dist", os.path.join(REPO, "scripts", "make_dist.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build(out=out)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_runs_pipeline(spark, tmp_path):
    zip_path = _make_dist(str(tmp_path / "kg.zip"))
    job = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), job)
    wh = str(tmp_path / "wh")
    env = dict(os.environ)
    # the driver must NOT inherit a path back into the repo: kg resolves
    # from the zip or the launch fails
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            job,
            "--synthetic", "150",
            "--warehouse", wh,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    nodes = spark.read.parquet(os.path.join(wh, "nodes"))
    edges = spark.read.parquet(os.path.join(wh, "edges"))
    assert nodes.count() > 0 and edges.count() > 0
    assert {"id", "label"} <= set(nodes.columns)
    assert {"id", "label", "out_id", "in_id"} <= set(edges.columns)
    # deterministic engine: the subprocess run over the same synthetic
    # corpus must agree with an in-process run (same sha256-derived ids)
    from kg.conf import PipelineConfig
    from kg.datagen import source_files_df
    from kg.pipeline import run_pipeline

    wh2 = str(tmp_path / "wh2")
    out = run_pipeline(
        spark,
        source_files_df(spark, 150),
        PipelineConfig(warehouse=wh2, shuffle_partitions=4),
        restart=True,
    )
    want_nodes = {r["id"] for r in out["nodes"].select("id").collect()}
    got_nodes = {r["id"] for r in nodes.select("id").collect()}
    assert got_nodes == want_nodes


def test_dist_zip_is_deterministic_and_complete(tmp_path):
    z1 = _make_dist(str(tmp_path / "a.zip"))
    z2 = _make_dist(str(tmp_path / "b.zip"))
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()
    import zipfile

    names = set(zipfile.ZipFile(z1).namelist())
    # every kg module ships; no bytecode rides along
    assert "kg/__init__.py" in names and "kg/pipeline.py" in names
    assert "kg/ops/graph.py" in names and "kg/session.py" in names
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)
