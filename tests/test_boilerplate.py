"""Per-host boilerplate line removal (operators/boilerplate.py).

Crafted multi-host fixture with planted template lines + a python
twin of the frequency rule, plus the scale pins: broadcast-only
removal pass and digest-keyed (never line-text-keyed) counting."""

from __future__ import annotations

import pytest

from kgkit.operators.boilerplate import (
    host_line_counts,
    remove_boilerplate_lines,
    with_template_lines,
)

BANNER_A = "welcome to site a"
FOOTER_A = "copyright a"


def _fixture(spark):
    rows = []
    # host a: 6 docs, all share the banner; 4 share the footer;
    # each has one unique body line
    for i in range(6):
        lines = [BANNER_A, f"unique content {i} for page"]
        if i < 4:
            lines.append(FOOTER_A)
        rows.append((i, "a", "\n".join(lines)))
    # host b: 2 docs sharing the SAME banner text as host a — below
    # b's own threshold, so per-host scoping must keep it there
    for i in range(2):
        rows.append((100 + i, "b", "\n".join([BANNER_A, f"b body {i}"])))
    # a doc whose lines are ALL template (host a)
    rows.append((50, "a", "\n".join([BANNER_A, FOOTER_A])))
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


class TestRemoveBoilerplate:
    def test_frequency_rule_per_host(self, spark):
        out = {
            r["doc_id"]: r
            for r in remove_boilerplate_lines(
                _fixture(spark), min_docs=4).collect()
        }
        # host a: banner (7 docs) and footer (5 docs) both stripped
        assert out[0]["clean_text"] == "unique content 0 for page"
        assert out[0]["n_removed"] == 2 and out[0]["n_kept"] == 1
        assert out[5]["clean_text"] == "unique content 5 for page"
        assert out[5]["n_removed"] == 1  # no footer on doc 5
        # host b keeps the identical banner string: 2 < min_docs there
        assert out[100]["clean_text"] == "\n".join([BANNER_A, "b body 0"])
        assert out[100]["n_removed"] == 0
        # fully-templated page survives with empty text
        assert out[50]["clean_text"] == "" and out[50]["n_kept"] == 0

    def test_line_order_preserved(self, spark):
        docs = spark.createDataFrame(
            [(1, "h", "keep one\nzap\nkeep two"),
             (2, "h", "zap\nother"),
             (3, "h", "zap\nthird")],
            "doc_id long, host string, text string",
        )
        out = {r["doc_id"]: r["clean_text"]
               for r in remove_boilerplate_lines(docs, min_docs=3).collect()}
        assert out[1] == "keep one\nkeep two"

    def test_within_doc_duplicates_count_once(self, spark):
        # the same line twice in ONE doc is 1 distinct doc, not 2
        docs = spark.createDataFrame(
            [(1, "h", "dup\ndup\nbody"), (2, "h", "other")],
            "doc_id long, host string, text string",
        )
        counts = {(r["host"], r["n_docs"])
                  for r in host_line_counts(docs).collect()}
        assert ("h", 2) not in counts
        out = remove_boilerplate_lines(docs, min_docs=2).collect()
        assert all(r["n_removed"] == 0 for r in out)

    def test_removal_pass_is_broadcast_only(self, spark):
        """Pass 2 must not shuffle the corpus: the docs-side join is a
        BroadcastHashJoin and no sort-merge join appears anywhere."""
        plan = (
            remove_boilerplate_lines(_fixture(spark), min_docs=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_template_fixture_registry_row(self, spark):
        from kgkit.queries import QUERIES

        df = QUERIES["boilerplate_lines"](spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert len(rows) > 0
        # the banner is shared by every page of its host: on the mega
        # host (half the corpus) it is always over threshold
        mega = [r for r in rows if r["host"] == "mega.example.org"]
        assert mega and all(r["n_removed"] >= 1 for r in mega)
        assert all(r["n_kept"] >= 1 for r in mega)  # body survives

    def test_template_fixture_matches_python(self, spark):
        import hashlib
        from kgkit.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        raw = {r["doc_id"]: r["text"]
               for r in docs.select("doc_id", "text").collect()}
        # python twin of fixture + rule at min_docs=5
        texts = {}
        for d, t in raw.items():
            host = ("mega.example.org" if d % 2 == 0
                    else f"h{d % 19}.example.net")
            w = t.split(" ")
            body = "\n".join(
                " ".join(w[i * 6:(i + 1) * 6])
                for i in range((len(w) + 5) // 6)
            )
            txt = f"site {host} navigation menu\n{body}"
            if d % 3 == 0:
                txt += f"\ncopyright {host}"
            texts[d] = (host, txt)
        freq: dict = {}
        for d, (h, t) in texts.items():
            for ln in set(t.split("\n")):
                freq[(h, ln)] = freq.get((h, ln), 0) + 1
        want = {}
        for d, (h, t) in texts.items():
            kept = [ln for ln in t.split("\n") if freq[(h, ln)] < 5]
            removed = sum(1 for ln in t.split("\n") if freq[(h, ln)] >= 5)
            want[d] = (h, len(kept), removed,
                       hashlib.md5("\n".join(kept).encode()).hexdigest())
        got = {
            r["doc_id"]: (r["host"], r["n_kept"], r["n_removed"],
                          r["clean_hash"])
            for r in QUERIES["boilerplate_lines"](spark, sf).collect()
        }
        assert got == want
