"""Analyzer SVG artifact (kgkit/metrics/plots.py) — the matplotlib-free
twin of the reference's 2x2 dataset figure (plots.py:17-49)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest


def _bars(svg_path):
    root = ET.parse(svg_path).getroot()
    ns = "{http://www.w3.org/2000/svg}"
    return [e for e in root.iter(f"{ns}rect") if e.get("class") == "bar"]


class TestDatasetPlot:
    def test_stats_and_svg_from_fixture(self, spark, tmp_path):
        from kgkit.metrics.plots import dataset_plot_stats, render_dataset_svg

        df = spark.createDataFrame(
            [
                ("doc://1", "B-OP", "train"), ("doc://1", "O", "train"),
                ("doc://1", "I-OP", "train"), ("doc://2", "B-TECH", "val"),
                ("doc://2", "O", "val"), ("doc://3", "O", "test"),
            ],
            "url string, tag string, phase string",
        )
        stats, n_sent = dataset_plot_stats(df)
        assert n_sent == {"total": 3, "train": 1, "val": 1, "test": 1}
        assert stats["train"]["OP"]["count"] == 2
        assert stats["train"]["OP"]["per_sentence"] == 2.0
        assert stats["train"]["OP"]["rel_with_o"] == pytest.approx(2 / 3)
        assert stats["train"]["OP"]["rel_without_o"] == 1.0
        assert stats["total"]["O"]["rel_without_o"] == 0.0
        assert stats["test"]["OP"]["count"] == 0

        out = str(tmp_path / "dataset.svg")
        render_dataset_svg(stats, n_sent, out)
        bars = _bars(out)
        # 4 phases x (2 groups in panel 0 + 3 tags x 3 tag panels)
        assert len(bars) == 4 * (2 + 3 * 3)
        # bar metadata carries the exact values (machine-checkable plot)
        val = {
            (b.get("data-phase"), b.get("data-group")): float(b.get("data-value"))
            for b in bars
        }
        assert val[("train", "OP")] in (2.0, pytest.approx(2 / 3), 1.0)

    def test_e2e_over_corpus(self, spark, tmp_path):
        from kgkit.metrics.plots import analyze_and_plot

        out = str(tmp_path / "corpus.svg")
        stats = analyze_and_plot(spark, "/root/testdata/sf0.001", out)
        assert set(stats) == {"total", "train", "val", "test"}
        assert len(_bars(out)) > 0
        # phase counts must agree with the split_phases arithmetic
        # (doc_id % 10: 8 train buckets, 1 val, 1 test) — planted pages
        # (doc_id 200000+...) land in train via the same rule
        assert stats["total"]["OP"]["count"] == sum(
            stats[p]["OP"]["count"] for p in ("train", "val", "test")
        )
