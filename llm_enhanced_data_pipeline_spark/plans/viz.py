"""Dependency-free SVG renderers for the reference's visualization
artifacts (Data_Analysis/evaluation/visualize_improvement.py:34-286,
which emits paper_quality_comparison.png / paper_quality_radar.png /
quality_improvement.png via matplotlib/seaborn — neither library ships
in this container, so the same three charts render here as plain SVG
text, byte-deterministic and XML-testable).

Rendering is inherently driver-side work over the D-row stats frames
(stage_comparison_frame and friends): collect() of a handful of rows,
never of data. Charts take `rows` as list[dict] so callers can feed
either a collected Spark frame or literal numbers.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

_PALETTE = ["#3498db", "#e74c3c", "#2ecc71", "#f39c12", "#9b59b6", "#34495e"]


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _svg(width: int, height: int, body: list[str], title: str) -> str:
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="sans-serif">'
    )
    caption = (
        f'<text x="{width / 2:g}" y="24" text-anchor="middle" '
        f'font-size="16" font-weight="bold">{_esc(title)}</text>'
    )
    return "\n".join([head, caption, *body, "</svg>"])


def grouped_bar_svg(
    rows: Sequence[dict],
    group_col: str,
    value_cols: Sequence[str],
    title: str = "Quality metrics across processing stages",
    y_max: float | None = None,
    width: int = 900,
    height: int = 420,
) -> str:
    """The grouped-bar comparison chart (visualize_improvement.py:34-
    149): one bar cluster per row (stage), one bar per metric, value
    labels on top, y-axis gridlines. Bars carry data-* attributes so
    tests can assert height-value proportionality mechanically."""
    left, right, top, bottom = 60, 20, 50, 60
    plot_w, plot_h = width - left - right, height - top - bottom
    vmax = y_max or max(
        (float(r[c] or 0.0) for r in rows for c in value_cols), default=1.0
    ) * 1.1 or 1.0
    body = []
    # gridlines + y labels
    for i in range(5):
        yv = vmax * i / 4
        y = top + plot_h - plot_h * i / 4
        body.append(
            f'<line x1="{left}" y1="{y:.1f}" x2="{width - right}" '
            f'y2="{y:.1f}" stroke="#ddd"/>'
        )
        body.append(
            f'<text x="{left - 6}" y="{y + 4:.1f}" text-anchor="end" '
            f'font-size="10">{yv:.2f}</text>'
        )
    n_groups, n_bars = len(rows), len(value_cols)
    group_w = plot_w / max(n_groups, 1)
    bar_w = group_w * 0.8 / max(n_bars, 1)
    for gi, r in enumerate(rows):
        gx = left + gi * group_w
        for bi, col in enumerate(value_cols):
            v = float(r[col] or 0.0)
            h = plot_h * v / vmax
            x = gx + group_w * 0.1 + bi * bar_w
            y = top + plot_h - h
            color = _PALETTE[bi % len(_PALETTE)]
            body.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w:.1f}" '
                f'height="{h:.1f}" fill="{color}" stroke="black" '
                f'stroke-width="0.5" data-metric="{_esc(col)}" '
                f'data-group="{_esc(r[group_col])}" data-value="{v:g}"/>'
            )
            body.append(
                f'<text x="{x + bar_w / 2:.1f}" y="{y - 3:.1f}" '
                f'text-anchor="middle" font-size="8">{v:g}</text>'
            )
        body.append(
            f'<text x="{gx + group_w / 2:.1f}" y="{top + plot_h + 16}" '
            f'text-anchor="middle" font-size="11">{_esc(r[group_col])}</text>'
        )
    # legend
    for bi, col in enumerate(value_cols):
        lx = left + bi * (plot_w / max(n_bars, 1))
        ly = height - 18
        body.append(
            f'<rect x="{lx:.1f}" y="{ly - 9}" width="10" height="10" '
            f'fill="{_PALETTE[bi % len(_PALETTE)]}"/>'
        )
        body.append(
            f'<text x="{lx + 14:.1f}" y="{ly}" font-size="10">{_esc(col)}</text>'
        )
    return _svg(width, height, body, title)


def radar_svg(
    rows: Sequence[dict],
    group_col: str,
    value_cols: Sequence[str],
    title: str = "Quality profile radar",
    v_max: float | None = None,
    size: int = 420,
) -> str:
    """The radar/spider chart (visualize_improvement.py:151-204): one
    closed polygon per row over the metric axes."""
    cx, cy, radius = size / 2, size / 2 + 10, size / 2 - 70
    vmax = v_max or max(
        (float(r[c] or 0.0) for r in rows for c in value_cols), default=1.0
    ) or 1.0
    n = len(value_cols)
    body = []

    def point(idx: int, frac: float) -> tuple[float, float]:
        ang = -math.pi / 2 + 2 * math.pi * idx / n
        return cx + radius * frac * math.cos(ang), cy + radius * frac * math.sin(ang)

    for ring in (0.25, 0.5, 0.75, 1.0):
        pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in (point(i, ring) for i in range(n)))
        body.append(f'<polygon points="{pts}" fill="none" stroke="#ddd"/>')
    for i, col in enumerate(value_cols):
        x, y = point(i, 1.12)
        body.append(
            f'<text x="{x:.1f}" y="{y:.1f}" text-anchor="middle" '
            f'font-size="10">{_esc(col)}</text>'
        )
        ex, ey = point(i, 1.0)
        body.append(f'<line x1="{cx}" y1="{cy}" x2="{ex:.1f}" y2="{ey:.1f}" stroke="#eee"/>')
    for ri, r in enumerate(rows):
        pts = " ".join(
            f"{x:.1f},{y:.1f}"
            for x, y in (
                point(i, float(r[c] or 0.0) / vmax) for i, c in enumerate(value_cols)
            )
        )
        color = _PALETTE[ri % len(_PALETTE)]
        body.append(
            f'<polygon points="{pts}" fill="{color}" fill-opacity="0.15" '
            f'stroke="{color}" stroke-width="2" data-group="{_esc(r[group_col])}"/>'
        )
    return _svg(size, size, body, title)


def improvement_bar_svg(
    first: dict,
    last: dict,
    value_cols: Sequence[str],
    title: str = "Quality improvement (first vs last stage)",
    width: int = 700,
    height: int = 320,
) -> str:
    """The per-metric %-improvement chart (visualize_improvement.py:
    206-245): (last - first) / first per metric, positive bars up,
    negative down, zero line marked."""
    left, right, top, bottom = 60, 20, 50, 50
    plot_w, plot_h = width - left - right, height - top - bottom
    pcts = {}
    for c in value_cols:
        base = float(first[c] or 0.0)
        pcts[c] = 0.0 if base == 0 else 100.0 * (float(last[c] or 0.0) - base) / base
    span = max(max((abs(v) for v in pcts.values()), default=1.0), 1e-9) * 1.15
    zero_y = top + plot_h / 2
    body = [
        f'<line x1="{left}" y1="{zero_y:.1f}" x2="{width - right}" '
        f'y2="{zero_y:.1f}" stroke="#888"/>'
    ]
    bar_w = plot_w / max(len(value_cols), 1) * 0.6
    for i, c in enumerate(value_cols):
        v = pcts[c]
        h = (plot_h / 2) * abs(v) / span
        x = left + (i + 0.2) * plot_w / len(value_cols)
        y = zero_y - h if v >= 0 else zero_y
        color = "#2ecc71" if v >= 0 else "#e74c3c"
        body.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w:.1f}" '
            f'height="{h:.1f}" fill="{color}" data-metric="{_esc(c)}" '
            f'data-pct="{v:.2f}"/>'
        )
        ly = y - 4 if v >= 0 else y + h + 11
        body.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{ly:.1f}" text-anchor="middle" '
            f'font-size="9">{v:+.1f}%</text>'
        )
        body.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{height - 24}" '
            f'text-anchor="middle" font-size="10">{_esc(c)}</text>'
        )
    return _svg(width, height, body, title)


def render_stage_report(
    stage_rows: Sequence[dict],
    out_dir: str,
    group_col: str = "stage",
    value_cols: Sequence[str] | None = None,
) -> dict[str, str]:
    """The full visualize_improvement.py artifact set over a collected
    stage-comparison frame: writes the three SVGs into ``out_dir`` and
    returns {artifact_name: path}."""
    import os

    rows = list(stage_rows)
    if value_cols is None:
        numeric = [
            k
            for k in rows[0]
            if k != group_col and isinstance(rows[0][k], (int, float))
        ]
        value_cols = numeric[:5]
    arts = {
        "quality_comparison.svg": grouped_bar_svg(rows, group_col, value_cols),
        "quality_radar.svg": radar_svg(rows, group_col, value_cols),
        "quality_improvement.svg": improvement_bar_svg(
            rows[0], rows[-1], value_cols
        ),
    }
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for name, svg in arts.items():
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write(svg)
        out[name] = path
    return out
