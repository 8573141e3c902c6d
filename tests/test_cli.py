"""CLI surface (python -m kgkit …) — the reference's thin command group
re-expressed over kgkit's entry points.  Spark-backed subcommands are
thin calls into run_kg_pipeline / QUERIES (covered by test_stages and
the oracle gate); these tests drive the pure-python paths end to end."""

from __future__ import annotations

import json


class TestPredictCommand:
    def test_args_mode_prints_json_records(self, capsys):
        from kgkit.cli import main

        assert main(["predict", "the spark hash join"]) == 0
        out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
        assert len(out) == 1
        recs = out[0]["predictions"]
        assert [(r["token"], r["tag"]) for r in recs] == [
            ("spark", "TECH"), ("hash join", "OP"),
        ]
        text = out[0]["text"]
        for r in recs:
            assert text[int(r["char_start"]):int(r["char_end"])] == r["token"]

    def test_stdin_mode_and_word_level(self, capsys, monkeypatch):
        import io

        from kgkit.cli import main

        monkeypatch.setattr("sys.stdin", io.StringIO("spark joins\n\ncustomer\n"))
        assert main(["predict", "--level", "word"]) == 0
        out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
        assert [o["text"] for o in out] == ["spark joins", "customer"]
        assert out[1]["predictions"][0]["tag"] == "B-DIM"


class TestParserSurface:
    def test_all_subcommands_registered(self):
        from kgkit.cli import build_parser

        sub = build_parser()._subparsers._group_actions[0]
        assert set(sub.choices) == {
            "predict", "predict-file", "run-pipeline", "evaluate", "lineage",
            "clean",
        }

    def test_run_pipeline_requires_pages_and_out(self):
        import pytest

        from kgkit.cli import build_parser

        with pytest.raises(SystemExit):
            build_parser().parse_args(["run-pipeline", "--out", "/tmp/x"])


class TestCleanCommand:
    def test_clean_writes_parquet_and_stats(self, spark, tmp_path, capsys):
        # spark fixture keeps the session alive; cmd_clean's
        # getOrCreate() reuses it
        from kgkit.cli import main
        from kgkit.operators.quality_clf import (
            corrupt_scramble,
            fluent_pages,
        )

        pos = fluent_pages(6, seed=77)
        rows = [(i, t) for i, t in enumerate(pos)]
        rows += [(50, pos[0]), (51, corrupt_scramble(pos[1], 5))]
        src, dst = str(tmp_path / "in.pq"), str(tmp_path / "out.pq")
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            rc = main(["clean", src, dst, "--clf", "default",
                       "--shuffle-partitions", "8"])
        finally:
            # cmd_clean's getOrCreate() applied its runtime conf to the
            # shared test session — restore for later modules
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        assert rc == 0
        import json as _json

        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        stats = out["stats"]
        assert stats["dropped_exact"] == 1          # doc 50
        assert stats["dropped_clf"] >= 1            # doc 51
        assert stats["after_clf"] == spark.read.parquet(dst).count()
