"""Catalog resolver contract (kgkit/sources/catalog.py): the Iceberg
swap must be a CONFIG change.  No Iceberg jars ship in this sandbox, so
the table-ref branch is pinned with a recording stub (the exact
writeTo/using/partitionedBy chain Iceberg's Spark runtime implements),
and the path branch is driven end-to-end through write_triples."""

from __future__ import annotations

import os


class _RecordingWriter:
    """Stub of DataFrameWriterV2 capturing the fluent chain."""

    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def partitionedBy(self, *cols):
        self.calls.append(("partitionedBy", cols))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))


class _RecordingDF:
    def __init__(self):
        self.calls = []

    def writeTo(self, ref):
        self.calls.append(("writeTo", ref))
        return _RecordingWriter(self.calls)


class TestCatalogDispatch:
    def test_table_ref_uses_iceberg_writeto_chain(self):
        from kgkit.sources.catalog import write_table

        df = _RecordingDF()
        write_table(df, "lake.kg.triples", partition_cols=("bucket",))
        assert df.calls == [
            ("writeTo", "lake.kg.triples"),
            ("using", "iceberg"),
            ("partitionedBy", ("bucket",)),
            ("createOrReplace",),
        ]

    def test_is_path_dispatch(self):
        from kgkit.sources.catalog import is_path

        assert is_path("/tmp/anywhere/triples")
        assert is_path("rel/dir")
        assert not is_path("lake.kg.triples")

    def test_write_triples_roundtrips_through_resolver(self, spark, tmp_path):
        """Path branch end-to-end: assemble -> write_triples ->
        resolve_table, row parity + on-disk bucket partitioning."""
        from kgkit.operators.linking import link_mentions
        from kgkit.operators.mentions import detect_mentions
        from kgkit.operators.canonicalize import canonical_map
        from kgkit.operators.triples import assemble_triples, write_triples
        from kgkit.sources.catalog import resolve_table
        from kgkit.sources.pages import load_pages, pages_for_mentions

        sf = "/root/testdata/sf0.001"
        pages = pages_for_mentions(load_pages(spark, sf))
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        triples = assemble_triples(
            link_mentions(detect_mentions(pages), emb), canonical_map(spark)
        )
        out = str(tmp_path / "triples")
        write_triples(triples, out)

        back = resolve_table(spark, out)
        assert back.count() == triples.count()
        buckets = sorted(
            int(d.split("=")[1]) for d in os.listdir(out)
            if d.startswith("bucket=")
        )
        assert len(buckets) > 1  # genuinely partitioned on url-hash buckets
        got = {tuple(r) for r in back.select("subj", "pred", "obj").collect()}
        want = {tuple(r) for r in triples.select("subj", "pred", "obj").collect()}
        assert got == want
