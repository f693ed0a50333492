"""Result presentation (O4-O8, de/display.py): sort, best-in-group
highlight, threshold coloring, pivot, and a markdown report.

Driver-side rendering over a collected results DataFrame — presentation is
not a distributed concern; the relational prep (sort, window-min, pivot)
runs as DataFrame ops first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def humanize(n: float) -> str:
    """Humanized byte sizes (de/display.py uses humanize.naturalsize)."""
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} PiB"


def sorted_results(results: DataFrame) -> DataFrame:
    """O4: display order (de/display.py:36)."""
    return results.orderBy("group", "dedup_ratio")


def with_best_in_group(results: DataFrame) -> DataFrame:
    """O5: flag the min rounded ratio per group (de/display.py:39-43)."""
    w = Window.partitionBy("group")
    best = F.min(F.round("dedup_ratio", 2)).over(w)
    return results.withColumn(
        "is_best", F.round("dedup_ratio", 2) == best
    )


def ratio_bucket(results: DataFrame, col: str = "dedup_ratio") -> DataFrame:
    """O6: threshold bucketing above the ideal ratio 1/numfiles
    (de/display.py:9-19): good/ok/bad color classes."""
    ideal = 1.0 / F.col("numfiles")
    span = 1.0 - ideal
    rel = (F.col(col) - ideal) / span
    bucket = (
        F.when(rel <= 0.15, "good")
        .when(rel <= 0.5, "ok")
        .otherwise("bad")
    )
    return results.withColumn("ratio_class", bucket)


def pivot_by_format(results: DataFrame) -> DataFrame:
    """O7: formats × groups grid of ratios (de/display.py:91-137)."""
    return (
        results.groupBy("format")
        .pivot("group")
        .agg(F.first(F.round("dedup_ratio", 4)))
        .orderBy("format")
    )


def markdown_report(spark: SparkSession, results: DataFrame) -> str:
    """O8: markdown table per group with humanized sizes and best-in-group
    bolding (de/display.py:32-88 Rich table equivalent)."""
    rows = with_best_in_group(sorted_results(results)).collect()
    lines = []
    current_group = None
    for r in rows:
        if r.group != current_group:
            current_group = r.group
            lines.append(f"\n### {current_group or 'results'}\n")
            lines.append("| format | files | total | unique | compressed | dedup ratio | write |")
            lines.append("|---|---|---|---|---|---|---|")
        ratio = f"{r.dedup_ratio * 100:.0f}%"
        if r.is_best:
            ratio = f"**{ratio}**"
        fps = getattr(r, "write_files_per_s", 0.0) or 0.0
        write = f"{fps:.1f} files/s" if fps else "—"
        lines.append(
            f"| {r.format} | {r.numfiles} | {humanize(r.total_len)} | "
            f"{humanize(r.chunk_bytes)} | {humanize(r.compressed_chunk_bytes)} | {ratio} | {write} |"
        )
    return "\n".join(lines)
