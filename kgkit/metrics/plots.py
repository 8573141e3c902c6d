"""Analyzer plot artifact — the reference's 2x2 dataset figure, SVG.

The reference's analyze step draws a matplotlib 2x2 grouped-bar figure
(nerblackbox/modules/datasets/plots.py:17-49, via analyzer.py:92):
  (0) sentences & tokens per phase, normalized to the total
  (1) tags/sentence per tag, grouped by phase
  (2) tag distribution relative WITH 'O'
  (3) tag distribution relative WITHOUT 'O'

matplotlib is absent from this sandbox, so the same figure is rendered
as a dependency-free SVG: identical panel semantics, grouped bars with
the reference's phase order (total, train, val, test), colors and
offsets (plots.py clr/shift/width).  The statistics come from ONE
distributed pass (groupBy(phase, tag) over the word-tag stream + a
sentence count per phase); only the ≤ |phases|x|tags| aggregate is
collected to build the drawing.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASES = ["total", "train", "val", "test"]
COLORS = {"total": "#000000", "train": "#008000",
          "val": "#ffa500", "test": "#ff0000"}   # k g orange r
SHIFT = {"total": -0.3, "train": -0.1, "val": 0.1, "test": 0.3}
BAR_W = 0.1  # in group units


def dataset_plot_stats(word_tags_with_phase: DataFrame) -> Tuple[dict, dict]:
    """(stats, n_sentences): stats[phase][plain_tag] = {count,
    per_sentence, rel_with_o, rel_without_o}; n_sentences[phase].
    Input: (url, tag, phase) word-tag rows (tag any scheme; classes are
    reduced to plain)."""
    plain = word_tags_with_phase.select(
        "phase", "url",
        F.regexp_replace("tag", "^[BILU]-", "").alias("tag"),
    )
    counts = {
        (r["phase"], r["tag"]): r["n"]
        for r in plain.groupBy("phase", "tag").agg(F.count("*").alias("n")).collect()
    }
    sents = {
        r["phase"]: r["n"]
        for r in plain.groupBy("phase").agg(
            F.count_distinct("url").alias("n")).collect()
    }
    tags = sorted({t for _, t in counts})
    phases = [p for p in PHASES if p == "total" or p in sents]
    stats: Dict[str, Dict[str, dict]] = {}
    n_sentences: Dict[str, int] = {}
    for phase in phases:
        if phase == "total":
            per_tag = {t: sum(counts.get((p, t), 0) for p in sents) for t in tags}
            n_sent = sum(sents.values())
        else:
            per_tag = {t: counts.get((phase, t), 0) for t in tags}
            n_sent = sents[phase]
        tot = sum(per_tag.values())
        tot_no_o = tot - per_tag.get("O", 0)
        stats[phase] = {
            t: {
                "count": c,
                "per_sentence": c / n_sent if n_sent else 0.0,
                "rel_with_o": c / tot if tot else 0.0,
                "rel_without_o": (0.0 if t == "O"
                                  else (c / tot_no_o if tot_no_o else 0.0)),
            }
            for t, c in per_tag.items()
        }
        n_sentences[phase] = n_sent
    return stats, n_sentences


def _panel(x0: float, y0: float, w: float, h: float, title: str,
           groups: List[str], series: Dict[str, List[float]],
           y_max: float) -> List[str]:
    """One grouped-bar panel as SVG fragments."""
    out = [f'<text x="{x0 + w / 2:.1f}" y="{y0 - 6:.1f}" '
           f'text-anchor="middle" font-size="12">{title}</text>',
           f'<rect x="{x0}" y="{y0}" width="{w}" height="{h}" '
           f'fill="none" stroke="#999"/>']
    n = max(len(groups), 1)
    gw = w / n
    for gi, g in enumerate(groups):
        gx = x0 + gi * gw + gw / 2
        out.append(
            f'<text x="{gx:.1f}" y="{y0 + h + 12:.1f}" text-anchor="middle" '
            f'font-size="9">{g}</text>'
        )
        for phase, values in series.items():
            v = values[gi]
            bh = 0.0 if y_max <= 0 else min(v / y_max, 1.0) * h
            bx = gx + SHIFT[phase] * gw - (BAR_W * gw) / 2
            out.append(
                f'<rect class="bar" data-phase="{phase}" data-group="{g}" '
                f'data-value="{v:.6f}" x="{bx:.1f}" y="{y0 + h - bh:.1f}" '
                f'width="{BAR_W * gw:.1f}" height="{bh:.1f}" '
                f'fill="{COLORS[phase]}"/>'
            )
    return out


def render_dataset_svg(stats: dict, n_sentences: dict, path: str) -> None:
    """Write the 2x2 analyzer figure as an SVG file."""
    phases = [p for p in PHASES if p in stats]
    tags = sorted(next(iter(stats.values())).keys())
    n_tokens = {
        p: sum(v["count"] for v in stats[p].values()) for p in phases
    }

    def norm(d: Dict[str, float]) -> List[float]:
        base = d.get("total") or (max(d.values()) if d else 1)
        return [d[p] / base if base else 0.0 for p in phases]

    panels = []
    # panel 0: sentences & tokens, normalized to the 'total' bar
    s0 = {p: [] for p in phases}
    sent_norm = norm({p: float(n_sentences[p]) for p in phases})
    tok_norm = norm({p: float(n_tokens[p]) for p in phases})
    for i, p in enumerate(phases):
        s0[p] = [sent_norm[i], tok_norm[i]]
    panels.append(("sentences / tokens", ["sentences", "tokens"], s0, 1.0))

    for title, key, ymax in (
        ("tags/sentence", "per_sentence", None),
        ("tags relative w/ O", "rel_with_o", 1.0),
        ("tags relative w/o O", "rel_without_o", 1.0),
    ):
        series = {p: [stats[p][t][key] for t in tags] for p in phases}
        top = ymax or max((v for vs in series.values() for v in vs), default=1.0)
        panels.append((title, tags, series, top or 1.0))

    W, H, M = 720, 520, 50
    pw, ph = (W - 3 * M) / 2, (H - 3 * M) / 2
    frags = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" '
             f'height="{H}" font-family="sans-serif">']
    for i, (title, groups, series, ymax) in enumerate(panels):
        x0 = M + (i % 2) * (pw + M)
        y0 = M + (i // 2) * (ph + M)
        frags.extend(_panel(x0, y0, pw, ph, title, groups, series, ymax))
    legend_y = H - 12
    for j, p in enumerate(phases):
        frags.append(f'<rect x="{M + j * 110}" y="{legend_y - 9}" width="10" '
                     f'height="10" fill="{COLORS[p]}"/>')
        frags.append(f'<text x="{M + j * 110 + 14}" y="{legend_y}" '
                     f'font-size="10">{p} (n={n_sentences[p]})</text>')
    frags.append("</svg>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(frags))


def analyze_and_plot(spark, sf_dir: str, out_path: str) -> dict:
    """Analyzer lifecycle over the corpus: word tags + X1 phase split
    -> aggregate -> SVG artifact (the analyze+plot step of
    base_formatter/analyzer.py; stats numbers are the same family the
    `dataset_stats` oracle checks).  Returns the stats dict."""
    from kgkit.operators.mentions import word_tags
    from kgkit.queries import _pages

    wt = word_tags(_pages(spark, sf_dir))
    doc_id = F.substring_index("url", "//", -1).cast("long")
    with_phase = wt.withColumn(
        "phase",
        F.when(doc_id % 10 < 8, "train")
        .when(doc_id % 10 == 8, "val")
        .otherwise("test"),
    )
    stats, n_sent = dataset_plot_stats(with_phase)
    render_dataset_svg(stats, n_sent, out_path)
    return stats
