"""Sources/sinks + annotation-format converters (S1-S3, K1/K2, P8).

The doccano/labelstudio reshapes are differential-tested against the
reference's own file_conversion.py (pure python, loaded standalone)."""

from __future__ import annotations

import importlib.util
import os
import sys
import tempfile

import pytest

REF_FC = "/root/reference/nerblackbox/modules/annotation/file_conversion.py"
REF_CONLL = "/root/reference/nerblackbox/tests/test_data/original_data/eng.testa"


@pytest.fixture(scope="module")
def ref_fc():
    if not os.path.isfile(REF_FC):
        pytest.skip("reference unavailable")
    spec = importlib.util.spec_from_file_location("ref_fc", REF_FC)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_fc"] = mod
    spec.loader.exec_module(mod)
    return mod


SAMPLE = [
    {
        "text": "\n2020-05-20 John Doe pratar.",
        "tags": [
            {"char_start": 1, "char_end": 11, "token": "2020-05-20", "tag": "PI"},
            {"char_start": 12, "char_end": 20, "token": "John Doe", "tag": "PI"},
        ],
    },
    {"text": "inga taggar här", "tags": []},
    {
        "text": "spark kör join",
        "tags": [{"char_start": 10, "char_end": 14, "token": "join", "tag": "OP"}],
    },
]


def _sample_df(spark):
    from kgkit.sources.formats import JSONL_SCHEMA

    return spark.createDataFrame(
        [(r["text"], [tuple(t.values()) for t in r["tags"]]) for r in SAMPLE],
        JSONL_SCHEMA,
    )


class TestCsvJsonl:
    def test_jsonl_roundtrip(self, spark):
        from kgkit.sources.formats import read_standard_jsonl, write_standard_jsonl

        df = _sample_df(spark)
        with tempfile.TemporaryDirectory() as d:
            write_standard_jsonl(df, f"{d}/out")
            back = read_standard_jsonl(spark, f"{d}/out")
            got = sorted(
                (r["text"], tuple(map(tuple, r["tags"] or [])))
                for r in back.collect()
            )
            want = sorted(
                (r["text"], tuple(tuple(t.values()) for t in r["tags"]))
                for r in SAMPLE
            )
            assert got == want

    def test_csv_roundtrip(self, spark):
        from kgkit.sources.formats import read_pretokenized_csv, write_pretokenized_csv

        df = spark.createDataFrame(
            [("O B-PER I-PER", "hej John Doe"), ("O", "hejsan")],
            "tags string, text string",
        )
        with tempfile.TemporaryDirectory() as d:
            write_pretokenized_csv(df, f"{d}/out")
            back = read_pretokenized_csv(spark, f"{d}/out")
            assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


class TestDoccano:
    def test_to_doccano_matches_reference(self, spark, ref_fc):
        from kgkit.sources.formats import to_doccano

        want = ref_fc.nerblackbox2doccano([dict(r) for r in SAMPLE])
        got = [
            {
                "text": r["text"],
                "label": [[x["start"], x["end"], x["label"]] for x in r["label"]],
            }
            for r in to_doccano(_sample_df(spark)).collect()
        ]
        assert sorted(got, key=str) == sorted(want, key=str)

    def test_doccano_roundtrip_matches_reference(self, spark, ref_fc):
        from kgkit.sources.formats import from_doccano, to_doccano

        back = from_doccano(to_doccano(_sample_df(spark)))
        got = [
            {"text": r["text"],
             "tags": [t.asDict() for t in r["tags"]]}
            for r in back.collect()
        ]
        want = ref_fc.doccano2nerblackbox(
            ref_fc.nerblackbox2doccano([dict(r) for r in SAMPLE])
        )
        assert sorted(got, key=str) == sorted(want, key=str)


class TestLabelStudio:
    def test_to_labelstudio_matches_reference(self, spark, ref_fc):
        from kgkit.sources.formats import to_labelstudio

        rows = [(i, r["text"], [tuple(t.values()) for t in r["tags"]])
                for i, r in enumerate(SAMPLE)]
        df = spark.createDataFrame(
            rows, "line_id long, text string, tags array<struct<char_start:int,char_end:int,token:string,tag:string>>"
        )
        got_rows = to_labelstudio(df).orderBy("line_id").collect()
        got = []
        for r in got_rows:
            got.append({
                "data": {"text": r["data"]["text"]},
                "annotations": [{
                    "result": [
                        {
                            "id": x["id"], "from_name": x["from_name"],
                            "to_name": x["to_name"], "type": x["type"],
                            "value": {
                                "start": x["value"]["start"],
                                "end": x["value"]["end"],
                                "text": x["value"]["text"],
                                "labels": list(x["value"]["labels"]),
                            },
                        }
                        for x in r["annotations"][0]["result"]
                    ],
                }],
            })
        want = ref_fc.nerblackbox2labelstudio([dict(r) for r in SAMPLE])
        assert got == want

    def test_labelstudio_roundtrip_matches_reference(self, spark, ref_fc):
        from kgkit.sources.formats import from_labelstudio, to_labelstudio

        rows = [(i, r["text"], [tuple(t.values()) for t in r["tags"]])
                for i, r in enumerate(SAMPLE)]
        df = spark.createDataFrame(
            rows, "line_id long, text string, tags array<struct<char_start:int,char_end:int,token:string,tag:string>>"
        )
        back = from_labelstudio(to_labelstudio(df))
        got = [
            {"text": r["text"], "tags": [t.asDict() for t in r["tags"]]}
            for r in back.collect()
        ]
        want = ref_fc.labelstudio2nerblackbox(
            ref_fc.nerblackbox2labelstudio([dict(r) for r in SAMPLE])
        )
        assert sorted(got, key=str) == sorted(want, key=str)


class TestConll:
    @pytest.mark.skipif(not os.path.isfile(REF_CONLL), reason="fixture unavailable")
    def test_parse_eng_testa(self, spark):
        from kgkit.sources.conll import read_conll

        df = read_conll(spark, REF_CONLL).orderBy("sentence_id", "pos")
        rows = df.collect()
        assert all(r["word"] != "-DOCSTART-" for r in rows)
        first = [(r["word"], r["tag"]) for r in rows if r["sentence_id"] == rows[0]["sentence_id"]]
        # IOB1 'I-PER' at sentence start becomes 'B-PER' in IOB2
        assert first[0] == ("Det", "B-PER")
        raw = read_conll(spark, REF_CONLL, iob2=False).orderBy(
            "sentence_id", "pos"
        ).collect()
        assert (raw[0]["word"], raw[0]["tag"]) == ("Det", "I-PER")
        # sentence count = blank-line separated groups with content
        n_sent = df.select("sentence_id").distinct().count()
        assert n_sent >= 2


class TestFunctionsTags:
    def test_apply_tag_mapping(self, spark):
        from pyspark.sql import functions as F

        from kgkit.functions.tags import apply_tag_mapping

        df = spark.createDataFrame(
            [("B-PER",), ("B-ORG",), ("0",), ("O",)], "tag string"
        )
        got = [
            r["m"]
            for r in df.select(
                apply_tag_mapping(
                    F.col("tag"), {"B-PER": "B-PI"}, default_to_o=True
                ).alias("m")
            ).collect()
        ]
        assert got == ["B-PI", "O", "O", "O"]
        got2 = [
            r["m"]
            for r in df.select(
                apply_tag_mapping(F.col("tag"), {"B-PER": "B-PI"}).alias("m")
            ).collect()
        ]
        assert got2 == ["B-PI", "B-ORG", "O", "O"]

    def test_shift_spans(self, spark):
        from pyspark.sql import functions as F

        from kgkit.functions.tags import shift_spans

        df = spark.createDataFrame(
            [([(10, 14, "join", "OP")], 10)],
            "tags array<struct<char_start:int,char_end:int,token:string,tag:string>>, delta int",
        )
        [r] = df.select(shift_spans(F.col("tags"), F.col("delta")).alias("t")).collect()
        assert tuple(r["t"][0]) == (0, 4, "join", "OP")

    def test_seeded_shuffle_deterministic(self, spark):
        from kgkit.functions.tags import seeded_shuffle

        df = spark.range(50).withColumnRenamed("id", "k")
        a = [r["k"] for r in seeded_shuffle(df, "k", 4).collect()]
        b = [r["k"] for r in seeded_shuffle(df, "k", 4).collect()]
        c = [r["k"] for r in seeded_shuffle(df, "k", 5).collect()]
        assert a == b and a != c and sorted(a) == list(range(50))

    def test_split_fractions(self, spark):
        from kgkit.functions.tags import split_fractions

        df = spark.range(1000).withColumnRenamed("id", "k")
        out = split_fractions(
            df, "k", {"train": (0.0, 0.8), "val": (0.8, 0.9), "test": (0.9, 1.0)}
        )
        counts = {r["phase"]: r["count"] for r in out.groupBy("phase").count().collect()}
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
        assert sum(counts.values()) == 1000

    def test_write_predictions_jsonl(self, spark):
        import tempfile

        from kgkit.operators.mentions import detect_mentions
        from kgkit.sources.formats import read_standard_jsonl, write_predictions_jsonl
        from kgkit.sources.pages import load_pages, pages_for_mentions

        pages = pages_for_mentions(load_pages(spark, "/root/testdata/sf0.001")).limit(50)
        pages = pages.cache()
        mentions = detect_mentions(pages)
        with tempfile.TemporaryDirectory() as d:
            write_predictions_jsonl(pages, mentions, f"{d}/preds")
            back = read_standard_jsonl(spark, f"{d}/preds")
            assert back.count() == 50
            n_tags = back.selectExpr("sum(size(tags)) s").collect()[0]["s"]
            assert n_tags == mentions.count()


class TestSwedishFormatters:
    """The two Swedish corpus formatters' parse semantics
    (swedish_ner_corpus_formatter.py / suc_formatter.py) — download
    steps are env-blocked, the format logic is what's testable."""

    def test_swedish_ner_corpus(self, spark, tmp_path):
        from kgkit.sources.conll import read_swedish_ner_corpus

        p = tmp_path / "snc.txt"
        p.write_text(
            "Kalle PER\nbor 0\ni 0\nGöteborg LOC\n\n"
            "Volvo ORG*\nkör PRG\n"
        )
        rows = {
            (r["sentence_id"], r["pos"]): (r["word"], r["tag"])
            for r in read_swedish_ner_corpus(spark, str(p)).collect()
        }
        assert rows == {
            (0, 0): ("Kalle", "PER"), (0, 1): ("bor", "O"),
            (0, 2): ("i", "O"), (0, 3): ("Göteborg", "LOC"),
            (1, 0): ("Volvo", "ORG"), (1, 1): ("kör", "O"),
        }

    def test_suc(self, spark, tmp_path):
        from kgkit.sources.conll import read_suc

        def row(word, kind, cls):
            cols = ["x"] * 13
            cols[1] = word
            cols[-3] = kind
            cols[-2] = cls
            return "\t".join(cols)

        p = tmp_path / "suc.tsv"
        p.write_text(
            row("Det", "O", "_") + "\n"
            + row("Anna", "B", "person") + "\n"
            + row("Lindh", "I", "person") + "\n"
            + "short\trow\n"            # malformed -> skipped
            + "\n"
            + row("Stockholm", "B", "place") + "\n"
        )
        rows = {
            (r["sentence_id"], r["pos"]): (r["word"], r["tag"])
            for r in read_suc(spark, str(p)).collect()
        }
        assert rows == {
            (0, 0): ("Det", "O"),
            (0, 1): ("Anna", "B-person"),
            (0, 2): ("Lindh", "I-person"),
            (1, 0): ("Stockholm", "B-place"),
        }

    def test_swe_nerc(self, spark, tmp_path):
        from kgkit.sources.conll import read_swe_nerc

        p = tmp_path / "swenerc.txt"
        p.write_text(
            "Det O xyz\n"
            "Anna PER xyz B\n"
            "Lindh PER xyz\n"          # 3 fields, non-O -> I-PER
            "SKIP-THIS-TOKEN PER x B\n"
            "bad PER xyz C\n"          # 4 fields without B -> skipped
            "\n"
            "G bg LOC xyz B\n"    # nbsp inside word removed
        )
        rows = {
            (r["sentence_id"], r["pos"]): (r["word"], r["tag"])
            for r in read_swe_nerc(spark, str(p)).collect()
        }
        assert rows == {
            (0, 0): ("Det", "O"),
            (0, 1): ("Anna", "B-PER"),
            (0, 2): ("Lindh", "I-PER"),
            (1, 0): ("Gbg", "B-LOC"),
        }


class TestPredictOnFile:
    def test_file_in_predictions_out(self, spark, tmp_path):
        """Model.predict_on_file parity (api/model.py:282-307): every
        input line comes back with its predictions; no-entity lines get
        an empty tags array; offsets are byte-identical."""
        import json

        from kgkit.sources.formats import predict_on_file

        inp = tmp_path / "in.jsonl"
        inp.write_text(
            "\n".join(json.dumps({"text": t}) for t in [
                "the spark hash join runs",
                "no entities in this line",
                "customer table scan begins",
            ]) + "\n"
        )
        out = str(tmp_path / "out")
        predict_on_file(spark, str(inp), out)
        lines = [json.loads(l) for l in
                 spark.read.text(out + "/*.json").rdd.map(lambda r: r[0]).collect()]
        by_text = {l["text"]: l["tags"] for l in lines}
        assert len(by_text) == 3
        assert by_text["no entities in this line"] == []
        got = {(t["token"], t["tag"]) for t in by_text["the spark hash join runs"]}
        assert got == {("spark", "TECH"), ("hash join", "OP")}
        for text, tags in by_text.items():
            for t in tags:
                assert text[t["char_start"]:t["char_end"]] == t["token"]
