"""Interactive HTML chart rendering (reference de/display.py:91-137
``plot_bars``) — dependency-free inline SVG instead of plotly.

Semantics mirror the reference: horizontal grouped bars of dedup ratios,
format on the y axis sorted so the best (lowest) ratio sits on top, one
series per group, percent x axis fixed to [0, 100%], value labels at the
bar ends, legend only when there is more than one series.

Rendering is a driver-side edge over the collected results rows
(presentation is not a distributed concern); all heavy lifting happened in
the estimate pipeline. The categorical palette/mark treatment follows a
validated 8-slot scheme (fixed slot order, light+dark stepped variants,
2px surface gap between bars in a group, 4px rounding on the data end
only, text in ink tokens rather than series colors).
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame

# Categorical slots (validated for adjacent-mark use, light / dark pairs).
_SERIES = [
    ("#2a78d6", "#3987e5"),
    ("#eb6834", "#d95926"),
    ("#1baf7a", "#199e70"),
    ("#eda100", "#c98500"),
    ("#e87ba4", "#d55181"),
    ("#008300", "#008300"),
    ("#4a3aa7", "#9085e9"),
    ("#e34948", "#e66767"),
]

_CSS = """
.viz-root { color-scheme: light;
  --surface-1:#fcfcfb; --text-primary:#0b0b0b; --text-secondary:#52514e;
  --grid:#e4e3df;
  %(light_vars)s
  font-family: system-ui, sans-serif; background: var(--surface-1);
  padding: 16px; border-radius: 8px; max-width: 760px; }
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root { color-scheme: dark;
    --surface-1:#1a1a19; --text-primary:#ffffff; --text-secondary:#c3c2b7;
    --grid:#33322f;
    %(dark_vars)s } }
:root[data-theme="dark"] .viz-root { color-scheme: dark;
  --surface-1:#1a1a19; --text-primary:#ffffff; --text-secondary:#c3c2b7;
  --grid:#33322f;
  %(dark_vars)s }
.viz-title { color: var(--text-primary); font-size: 15px; font-weight: 600;
  margin: 0 0 10px; }
.viz-legend { display: flex; gap: 14px; margin: 0 0 8px;
  color: var(--text-secondary); font-size: 12px; }
.viz-legend .chip { display: inline-block; width: 10px; height: 10px;
  border-radius: 3px; margin-right: 5px; vertical-align: -1px; }
.viz-root text { fill: var(--text-secondary); font-size: 11px; }
.viz-root .ylab { fill: var(--text-primary); font-size: 12px; }
.viz-root .gridline { stroke: var(--grid); stroke-width: 1; }
.viz-root rect.bar:hover { opacity: 0.82; }
"""


def grouped_bar_html(
    results: DataFrame, title: str = "Dedup ratio by format (lower = better)"
) -> str:
    """EstimationResult rows → standalone HTML document with an SVG grouped
    bar chart (one bar series per ``group``)."""
    rows = results.select("format", "group", "dedup_ratio").collect()
    all_groups = sorted({r.group for r in rows})
    groups = all_groups[: len(_SERIES)]
    n_omitted = len(all_groups) - len(groups)
    by_key = {(r.format, r.group): r.dedup_ratio for r in rows}
    best = {}
    for r in rows:
        best[r.format] = min(best.get(r.format, 1e9), r.dedup_ratio)
    formats = sorted(best, key=lambda f: best[f])  # best (lowest) first = top

    bar_h, gap, group_pad = 16, 2, 12
    row_h = len(groups) * (bar_h + gap) - gap + group_pad
    left, right, top = 170, 70, 8
    plot_w = 420
    height = top + len(formats) * row_h + 24
    width = left + plot_w + right

    light_vars = "\n  ".join(
        f"--series-{i + 1}:{_SERIES[i][0]};" for i in range(len(groups))
    )
    dark_vars = "\n    ".join(
        f"--series-{i + 1}:{_SERIES[i][1]};" for i in range(len(groups))
    )

    parts = []
    # gridlines + % ticks
    for pct in (0, 25, 50, 75, 100):
        x = left + plot_w * pct / 100
        parts.append(
            f'<line class="gridline" x1="{x:.0f}" y1="{top}" x2="{x:.0f}" '
            f'y2="{height - 20}"/>'
            f'<text x="{x:.0f}" y="{height - 6}" text-anchor="middle">{pct}%</text>'
        )
    for fi, fmt in enumerate(formats):
        y0 = top + fi * row_h
        parts.append(
            f'<text class="ylab" x="{left - 8}" y="{y0 + row_h / 2 - group_pad / 2 + 4:.0f}" '
            f'text-anchor="end">{_html.escape(fmt)}</text>'
        )
        for gi, g in enumerate(groups):
            ratio = by_key.get((fmt, g))
            if ratio is None:
                continue
            y = y0 + gi * (bar_h + gap)
            w = max(plot_w * min(ratio, 1.0), 1)
            r_end = min(4, w / 2)
            # rounded on the data end only: right-rounded path from baseline
            parts.append(
                f'<path class="bar" fill="var(--series-{gi + 1})" d="M{left},{y} '
                f"h{w - r_end:.1f} a{r_end},{r_end} 0 0 1 {r_end},{r_end} "
                f"v{bar_h - 2 * r_end} a{r_end},{r_end} 0 0 1 -{r_end},{r_end} "
                f'h-{w - r_end:.1f} z">'
                f"<title>{_html.escape(fmt)}"
                f"{' · ' + _html.escape(g) if g else ''}: {ratio:.1%}</title></path>"
            )
            parts.append(
                f'<text x="{left + w + 6:.1f}" y="{y + bar_h - 4}">{ratio:.1%}</text>'
            )

    legend = ""
    if len(groups) > 1 or n_omitted:
        chips = "".join(
            f'<span><span class="chip" style="background:var(--series-{i + 1})">'
            f"</span>{_html.escape(g or 'default')}</span>"
            for i, g in enumerate(groups)
        )
        if n_omitted:
            # never silently drop series: say what the chart is missing
            chips += (
                f"<span>⚠ {n_omitted} more group(s) not shown "
                f"(8-series palette cap) — use the table view</span>"
            )
        legend = f'<div class="viz-legend">{chips}</div>'

    css = _CSS % {"light_vars": light_vars, "dark_vars": dark_vars}
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<style>{css}</style></head><body>"
        f'<div class="viz-root"><p class="viz-title">{_html.escape(title)}</p>'
        f"{legend}"
        f'<svg width="{width}" height="{height}" role="img" '
        f'aria-label="{_html.escape(title)}">{"".join(parts)}</svg>'
        "</div></body></html>"
    )
