"""End-to-end crawl-to-training-data composition: WARC segments ->
pages -> per-host boilerplate strip -> composed hygiene (url/exact/
near-dup + quality) -> packed training sequences.  Every stage is an
individually-oracled/tested operator; this pins that the COMPOSITION
holds together — byte-exact boilerplate inversion, conservation of the
drop accounting, planted-duplicate removal, and bit-reproducible
sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
NL = "\n"


@pytest.fixture(scope="module")
def crawl_docs(spark, tmp_path_factory):
    """WARC fixture -> pages -> (doc_id, url, host, text) with a
    deterministic per-host banner/footer wrap (the template chrome a
    real crawl carries; the WARC text extractor collapses newlines, so
    the chrome is re-applied at the doc layer where line structure
    lives)."""
    from kgkit.sources.warc import synth_warc_fixture, warc_pages

    glob = synth_warc_fixture(
        spark, SF, out_dir=str(tmp_path_factory.mktemp("warc"))
    )
    pages = warc_pages(spark, glob)
    host = F.lower(F.try_parse_url(F.col("url"), F.lit("HOST")))
    return pages.select(
        F.regexp_extract("url", r"/d/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        host.alias("host"),
        F.col("text").alias("body"),
    ).withColumn(
        "text",
        F.concat(
            F.lit("site "), F.col("host"), F.lit(" navigation" + NL),
            F.col("body"),
            F.lit(NL + "copyright "), F.col("host"),
        ),
    )


class TestCrawlToTrainingExport:
    def test_boilerplate_strip_inverts_the_chrome(self, spark, crawl_docs):
        """Every host has ~60 docs >> min_docs, so the banner and the
        footer are template chrome on every host and the strip must
        recover exactly the original body — byte identity, per doc."""
        from kgkit.operators.boilerplate import remove_boilerplate_lines

        cleaned = remove_boilerplate_lines(
            crawl_docs.select("doc_id", "host", "text"), min_docs=5
        )
        joined = cleaned.join(
            crawl_docs.select("doc_id", "body"), "doc_id"
        )
        bad = joined.filter(F.col("clean_text") != F.col("body")).count()
        assert bad == 0
        assert cleaned.count() == crawl_docs.count()
        # exactly the two chrome lines went, body lines stayed
        assert joined.filter(F.col("n_removed") != 2).count() == 0

    def test_hygiene_accounting_and_planted_duplicates(
        self, spark, crawl_docs
    ):
        from kgkit.operators.boilerplate import remove_boilerplate_lines
        from kgkit.operators.corpus_clean import clean_corpus

        stripped = remove_boilerplate_lines(
            crawl_docs.select("doc_id", "host", "text"), min_docs=5
        ).select(
            "doc_id", F.col("clean_text").alias("text")
        ).join(crawl_docs.select("doc_id", "url"), "doc_id")

        # plant one exact mirror (same text, different url/id) and one
        # url duplicate (same url re-crawled under a tracking param)
        mirror = stripped.filter(F.col("doc_id") == 7).select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.lit("https://mirror.example.net/copy").alias("url"),
            "text",
        )
        recrawl = stripped.filter(F.col("doc_id") == 9).select(
            (F.col("doc_id") + 200_000).alias("doc_id"),
            F.concat(F.col("url"), F.lit("?utm_source=feed")).alias("url"),
            "text",
        )
        docs = stripped.unionByName(mirror.select("doc_id", "url", "text")) \
                       .unionByName(recrawl.select("doc_id", "url", "text"))

        cleaned, stats = clean_corpus(docs)
        # conservation: every input doc is kept or accounted to a stage
        dropped = sum(v for k, v in stats.items() if k.startswith("dropped"))
        assert stats["input"] == stats["after_quality"] + dropped
        # the recrawl collapses at stage 1 (canonical url), the mirror
        # at stage 2 (md5) — and the ORIGINALS (min doc_id) survive
        assert stats["dropped_url_dedup"] >= 1
        assert stats["dropped_exact"] >= 1
        kept = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
        assert 7 in kept and 9 in kept
        assert 100_007 not in kept and 200_009 not in kept

    def test_packed_export_is_bit_reproducible(self, spark, crawl_docs):
        from kgkit.operators.boilerplate import remove_boilerplate_lines
        from kgkit.operators.corpus_clean import clean_corpus
        from kgkit.operators.packing import pack_sequences

        stripped = remove_boilerplate_lines(
            crawl_docs.select("doc_id", "host", "text"), min_docs=5
        ).select("doc_id", F.col("clean_text").alias("text")).join(
            crawl_docs.select("doc_id", "url"), "doc_id"
        )
        cleaned, _ = clean_corpus(stripped)

        def _export():
            return sorted(
                (r["shard"], r["seq_id"], r["n_tokens"], r["n_docs"],
                 r["seq_hash"])
                for r in pack_sequences(
                    cleaned.select("doc_id", "text"),
                    max_len=128, n_shards=8,
                ).collect()
            )

        once, twice = _export(), _export()
        assert len(once) > 0 and once == twice
        # concat-then-chunk with tail drop: every window is full
        assert all(r[2] == 128 for r in once)
