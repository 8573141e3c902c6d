"""N-Triples export: Spark==python-twin differential on hostile
strings, grammar validation + independent-parser round-trip, and the
real stage-3 triples composition through the gzip text sink."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

NASTY = [
    ("Q5", "mentions", "plain"),
    ("doc://434", "mentions", "Q3"),
    ('he said "hi"', "pred with space", 'obj\\back"slash'),
    ("tab\there", "new\nline", "carriage\rreturn"),
    ("<angle>", "{curly}", "pipe|caret^tick`"),
    ("pct %25 literal", "%", "a%20b"),
    ("ünïcode", "日本語", "emoji \U0001f600"),
    ("", "empty-subject", ""),
    ("http://site.example.com:8080/p?q=1&r=2", "cites",
     "https://other.example.net/x y"),
    # a crawled URL's own percent-encoding must survive byte-identical
    ("https://ex.example.org/a%20b?q=r%2Fs", "cites", "Q1"),
    ("ctrl\x01char", "be\x02ll", "nu\x1fll"),
]


@pytest.fixture(scope="module")
def lines(spark):
    from kgkit.sources.rdf import ntriples_lines

    df = spark.createDataFrame(NASTY, "subj string, pred string, obj string")
    return [r["value"] for r in ntriples_lines(df).collect()]


class TestNTriples:
    def test_matches_python_twin(self, spark, lines):
        from kgkit.sources.rdf import ntriples_line_py

        want = {ntriples_line_py(*t) for t in NASTY}
        assert set(lines) == want

    def test_every_line_is_grammatical(self, lines):
        from kgkit.sources.rdf import parse_ntriples_line

        for line in lines:
            parse_ntriples_line(line)  # raises on grammar violation

    def test_roundtrip_decodes_to_input(self, lines):
        """MINTED names decode back exactly (their encoding is
        injective); KEPT URLs come back in sanitized form — their own
        %-sequences untouched.  The only lossy steps are C0 stripping
        and kept-URL sanitization of genuinely-forbidden characters
        (both documented)."""
        import re

        from kgkit.sources.rdf import (
            _IRI_SAN,
            _SCHEME_RE,
            parse_ntriples_line,
        )

        strip = lambda s: "".join(ch for ch in s if ch >= " ")  # noqa: E731

        def expect(term):
            t = strip(term)
            if re.match(_SCHEME_RE, term):
                for a, b in _IRI_SAN:
                    t = t.replace(a, b)
            return t

        got = {parse_ntriples_line(l)[:3] for l in lines}
        want = {tuple(expect(t) for t in row) for row in NASTY}
        assert got == want

    def test_kept_url_percent_is_byte_identical(self, lines):
        """'https://ex.example.org/a%20b?q=r%2Fs' names a resource; the
        exported IRI must be that exact byte string, not a
        double-encoded %2520 variant."""
        kept = [l for l in lines if "ex.example.org" in l]
        assert kept and "<https://ex.example.org/a%20b?q=r%2Fs>" in kept[0]
        assert "%2520" not in kept[0]  # no double-encoding of kept URLs
        # MINTED names still encode '%' (injective, decodable): the
        # minted local name 'a%20b' must become a%2520b
        minted = [l for l in lines if "pct" in l]
        assert minted and "a%2520b" in minted[0]

    def test_literal_objects(self, spark):
        from kgkit.sources.rdf import ntriples_lines, parse_ntriples_line

        df = spark.createDataFrame(
            [("Q1", "label", 'a "quoted"\nname')],
            "subj string, pred string, obj string",
        )
        [line] = [r["value"] for r in
                  ntriples_lines(df, literal_objs=True).collect()]
        s, p, o, is_lit = parse_ntriples_line(line)
        assert is_lit and o == 'a "quoted"\nname'

    def test_stage3_export_roundtrip(self, spark, tmp_path):
        """The real pipeline's triples through the gzip sink: every
        line grammatical, and the decoded graph equals the source
        table exactly (urls keep their scheme, entities mint)."""
        from kgkit.queries import QUERIES
        from kgkit.sources.rdf import parse_ntriples_line, write_ntriples

        t = (
            QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")
            .select("subj", "pred", "obj")
            .localCheckpoint()
        )
        out = str(tmp_path / "kg_nt")
        write_ntriples(t, out)
        part = [f for f in os.listdir(out) if f.startswith("part-")]
        assert part and all(f.endswith(".gz") for f in part)
        decoded = set()
        for f in part:
            with gzip.open(os.path.join(out, f), "rt", encoding="utf-8") as fh:
                for line in fh:
                    s, p, o, is_lit = parse_ntriples_line(line.rstrip("\n"))
                    assert not is_lit
                    decoded.add((s, p, o))  # parser unmints minted names
        want = {(r["subj"], r["pred"], r["obj"])
                for r in t.distinct().collect()}
        assert decoded == want and decoded

    def test_export_plan_is_shuffle_free(self, spark):
        from kgkit.sources.rdf import ntriples_lines

        df = spark.createDataFrame(NASTY, "subj string, pred string, obj string")
        plan = (
            ntriples_lines(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
