"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship dedup-estimate over sf0.001 (smoke, rows>0)
queries()         — every implemented operator from SURVEY.md §2
oracle_sql()      — DuckDB-equivalent SQL per query (None ⇒ rows-only)

Implementations live in dataset_dedupe_estimator_spark.queries.*; this
module is just the registry adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataset_dedupe_estimator_spark.queries import REGISTRY  # noqa: E402


_PYFILE_SENT: set[int] = set()


def _ensure_importable(spark: SparkSession) -> None:
    """Executor-side python workers must be able to import the package.

    The driver may have started the JVM before this module was imported,
    so mutating PYTHONPATH here would not reach the worker daemon — ship
    the package as a zip via addPyFile (runtime-safe) instead, and set the
    env too for sessions created later.
    """
    root = os.path.dirname(os.path.abspath(__file__))
    pypath = os.environ.get("PYTHONPATH", "")
    if root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{root}{os.pathsep}{pypath}" if pypath else root
    sc = spark.sparkContext
    key = id(sc)
    if key in _PYFILE_SENT:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.join(root, "dataset_dedupe_estimator_spark")
    zip_path = os.path.join(tempfile.gettempdir(), "dataset_dedupe_estimator_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    sc.addPyFile(zip_path)
    _PYFILE_SENT.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: CDC dedup estimate across all sf0.001 parquet files."""
    _ensure_importable(spark)
    from dataset_dedupe_estimator_spark.plans.estimate import estimate_df
    import glob

    paths = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
    return estimate_df(spark, paths)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_importable(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.spark) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
