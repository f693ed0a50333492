"""S10 git materializer, S11 page-metadata scan, S12 PNG heatmap,
S13 HTML diff."""

import subprocess
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.chunker import chunk_files
from dataset_dedupe_estimator_spark.sources.git_revisions import (
    checkout_file_revisions,
    file_revisions,
)
from dataset_dedupe_estimator_spark.sources.pagemeta import (
    chunk_size_histogram,
    page_chunk_meta,
)
from dataset_dedupe_estimator_spark.viz import (
    multidoc_diff_html,
    segments_to_png,
    write_provenance_pngs,
)


@pytest.fixture(scope="module")
def git_repo(tmp_path_factory):
    d = tmp_path_factory.mktemp("repo")
    run = lambda *a: subprocess.run(a, cwd=d, check=True, capture_output=True)
    run("git", "init", "-q")
    run("git", "config", "user.email", "t@t")
    run("git", "config", "user.name", "t")
    for i in range(3):
        (d / "data.bin").write_bytes(bytes([i]) * 1000)
        run("git", "add", "data.bin")
        run("git", "commit", "-q", "-m", f"rev {i}")
    return d


def test_git_revisions(git_repo, tmp_path):
    revs = file_revisions(git_repo, "data.bin")
    assert len(revs) == 3
    out = checkout_file_revisions(git_repo, "data.bin", tmp_path / "revs")
    assert len(out) == 3
    # oldest first: revision 0 content
    assert out[0].read_bytes() == bytes([0]) * 1000
    assert out[2].read_bytes() == bytes([2]) * 1000
    assert out[0].name.startswith("data-0000-")


def test_page_chunk_meta(spark, parquet_paths):
    meta = page_chunk_meta(spark, parquet_paths)
    rows = meta.collect()
    assert {r.path for r in rows} == set(parquet_paths)
    assert all(r.num_values > 0 for r in rows)
    assert all(r.total_compressed > 0 for r in rows)
    hist = chunk_size_histogram(meta).collect()
    assert sum(r.n_chunks for r in hist) == len(rows)


def test_page_meta_reconciles_with_footer(spark, parquet_paths):
    """Per-data-page scan (Thrift header walk) must account for every byte
    and every value the footer claims per column chunk."""
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.sources.pagemeta import page_meta

    keys = ["path", "row_group", "column_name"]
    pages = page_meta(spark, parquet_paths)
    per_chunk = pages.groupBy(*keys).agg(
        (F.sum("compressed") + F.sum("header_bytes")).alias("page_total"),
        F.sum(
            F.when(F.col("page_type").isin("data", "data_v2"), F.col("num_values"))
        ).alias("data_values"),
    )
    footer = page_chunk_meta(spark, parquet_paths).select(
        *keys,
        F.col("total_compressed").alias("footer_total"),
        F.col("num_values").alias("footer_values"),
    )
    j = per_chunk.join(footer, keys).collect()
    assert len(j) > 0
    for r in j:
        assert r.page_total == r.footer_total, r
        assert r.data_values == r.footer_values, r


def test_grouped_bar_html(spark):
    from dataset_dedupe_estimator_spark.plans.charts import grouped_bar_html
    from dataset_dedupe_estimator_spark.plans.compare import (
        EstimationResult,
        results_df,
    )

    res = [
        EstimationResult("pq-snappy", 2, 1000, 600, 500, 0.60, "g1"),
        EstimationResult("pq-zstd", 2, 1000, 420, 390, 0.42, "g1"),
        EstimationResult("pq-snappy", 2, 1000, 550, 470, 0.55, "g2"),
        EstimationResult("pq-zstd", 2, 1000, 480, 430, 0.48, "g2"),
    ]
    html = grouped_bar_html(results_df(spark, res))
    assert html.count('class="bar"') == 4
    assert "viz-legend" in html  # two series -> legend required
    # best (lowest ratio) format renders first = top
    assert html.index(">pq-zstd<") < html.index(">pq-snappy<")
    assert "42.0%" in html and "prefers-color-scheme: dark" in html


def test_grouped_bar_html_warns_on_series_overflow(spark):
    from dataset_dedupe_estimator_spark.plans.charts import grouped_bar_html
    from dataset_dedupe_estimator_spark.plans.compare import (
        EstimationResult,
        results_df,
    )

    res = [
        EstimationResult("pq", 2, 1000, 600, 500, 0.5 + g / 100, f"g{g:02d}")
        for g in range(10)
    ]
    html = grouped_bar_html(results_df(spark, res))
    assert html.count('class="bar"') == 8  # palette cap
    assert "2 more group(s) not shown" in html  # but never silently


def test_grouped_bar_html_single_series_no_legend(spark):
    from dataset_dedupe_estimator_spark.plans.charts import grouped_bar_html
    from dataset_dedupe_estimator_spark.plans.compare import (
        EstimationResult,
        results_df,
    )

    res = [EstimationResult("pq", 2, 1000, 600, 500, 0.60, "only")]
    html = grouped_bar_html(results_df(spark, res))
    assert '<div class="viz-legend">' not in html


def _check_png(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR says 256x256 RGB
    w, h = int.from_bytes(data[16:20], "big"), int.from_bytes(data[20:24], "big")
    assert (w, h) == (256, 256)
    # decodable IDAT
    idat_start = data.index(b"IDAT") + 4
    idat_len = int.from_bytes(data[idat_start - 8 : idat_start - 4], "big")
    raw = zlib.decompress(data[idat_start : idat_start + idat_len])
    assert len(raw) == 256 * (256 * 3 + 1)


def test_segments_png(tmp_path):
    p = tmp_path / "seg.png"
    segments_to_png(list(np.repeat([0, 1, 2], 1000)), str(p))
    _check_png(p)


def test_provenance_pngs_and_html(spark, tmp_path):
    blob = np.random.default_rng(3).integers(0, 256, 600_000, dtype=np.uint8).tobytes()
    a, b = tmp_path / "a.bin", tmp_path / "b.bin"
    a.write_bytes(blob)
    b.write_bytes(blob[:300_000] + bytes(100) + blob[300_000:])
    chunks = chunk_files(spark, [str(a), str(b)]).cache()
    out = write_provenance_pngs(chunks, str(tmp_path / "pngs"))
    assert len(out) == 3  # two files + merged
    for p in out:
        _check_png(p)
    html = multidoc_diff_html(chunks)
    assert html.count("display:inline-block") == 2
    assert "opacity:0.25" in html  # shared chunks exist
    chunks.unpersist()
