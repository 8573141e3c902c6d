"""North-rule gate: Spark triples == single-process reference path
(P/R >= 0.95; byte-identical extracted text per url).  Full methodology
in tools/triple_parity.py; sf0.001 here for CI speed."""

from __future__ import annotations

import pytest


class TestTripleParity:
    SF = "/root/testdata/sf0.001"

    def test_precision_recall(self, spark):
        from kgkit.queries import QUERIES
        from tools.triple_parity import reference_triples

        ref, violations = reference_triples(self.SF)
        got = {
            (r["subj"], r["pred"], r["obj"])
            for r in QUERIES["kg_triples"](spark, self.SF).collect()
        }
        tp = len(ref & got)
        assert violations == 0
        assert tp / len(got) >= 0.95      # precision (measured: 1.0)
        assert tp / len(ref) >= 0.95      # recall    (measured: 1.0)

    def test_byte_identity_in_spark_path(self, spark):
        """Every extracted surface is a byte-identical slice of its page
        text — checked IN SPARK over all mentions (input_hint)."""
        from pyspark.sql import functions as F

        from kgkit.operators.mentions import detect_mentions
        from kgkit.sources.pages import load_pages, pages_for_mentions

        pages = pages_for_mentions(load_pages(spark, self.SF))
        m = detect_mentions(pages).join(pages.select("url", "text"), "url")
        bad = m.filter(
            F.expr("substring(text, char_start + 1, char_end - char_start)")
            != F.col("surface")
        ).count()
        assert bad == 0
