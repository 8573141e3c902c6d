"""End-to-end CLI lifecycle mirroring the reference's e2e API test
(/root/reference/e2e_tests/e2e_test_api.py:8-99): store setup ->
dataset phase files -> checkpoint load -> predict -> predict-file ->
evaluate, driven through ``python -m kgkit`` subprocesses so the whole
argv/stdout contract is exercised, with the evaluation numbers asserted
equal to ``metrics_fanout_df`` computed in-process (the reference
asserts training.get_result returns the EVALUATION_DICT scores).

Training itself is out of scope (north rule); the reference's
``Model.from_training`` checkpoint-load step is stood in by loading the
packaged trained head THROUGH the S7 ``ckpt:<path>`` source from a
store-layout copy, not by the in-process default."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, timeout=420):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "kgkit", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


class TestCliLifecycle:
    def test_store_dataset_checkpoint_predict_evaluate(self, spark, tmp_path):
        # -- 0/1. Store path + create (reference: Store.set_path/create)
        store = tmp_path / "store"
        for sub in ("datasets", "pretrained_models", "results"):
            (store / sub).mkdir(parents=True)

        # -- 2. dataset set_up: phase files written under the store
        #    (reference: Dataset('ehealth_kd').set_up() -> train/val/test
        #    jsonl). Texts come from the fixture corpus; the X1 split is
        #    the engine's own split_fractions semantics at file level.
        import duckdb

        # distinct texts (the synth corpus plants duplicates for dedup
        # tests; phase files should not share lines across phases)
        texts = [
            r[0]
            for r in duckdb.sql(
                f"SELECT text FROM '{SF_DIR}/documents.parquet' "
                "GROUP BY text ORDER BY min(doc_id) LIMIT 30"
            ).fetchall()
        ]
        ds_dir = store / "datasets" / "fixture_corpus"
        ds_dir.mkdir()
        phases = {"train": texts[:20], "val": texts[20:24], "test": texts[24:]}
        for phase, rows in phases.items():
            with open(ds_dir / f"{phase}.jsonl", "w") as f:
                for t in rows:
                    f.write(json.dumps({"text": t}, ensure_ascii=False) + "\n")
        for phase in phases:
            assert (ds_dir / f"{phase}.jsonl").is_file()

        # -- 3/5. checkpoint into the store + load via the S7 source
        #    (reference: Model.from_training reads the run's checkpoint)
        from kgkit.ner_core.trained import DEFAULT_CKPT

        ckpt = store / "pretrained_models" / "model.npz"
        shutil.copyfile(DEFAULT_CKPT, ckpt)

        # -- 6a. model.predict on a single text (argv surface, no Spark)
        probe = "the spark hash join beats a sort merge join"
        res = _run_cli(["predict", probe])
        assert res.returncode == 0, res.stderr
        rec = json.loads(res.stdout.strip().splitlines()[0])
        for p in rec["predictions"]:
            assert probe[int(p["char_start"]):int(p["char_end"])] == p["token"]

        # -- 6b. predict-file over the test phase with the store ckpt
        preds_path = store / "results" / "test_preds.jsonl"
        res = _run_cli(
            [
                "predict-file",
                str(ds_dir / "test.jsonl"),
                str(preds_path),
                "--model", f"ckpt:{ckpt}",
                "--shuffle-partitions", "8",
            ]
        )
        assert res.returncode == 0, res.stderr
        # the K3 sink is a distributed write -> a directory of parts
        import glob

        out_rows = []
        for part in sorted(glob.glob(str(preds_path / "part-*"))):
            with open(part) as f:
                out_rows.extend(json.loads(line) for line in f if line.strip())
        assert sorted(r["text"] for r in out_rows) == sorted(phases["test"])
        n_tags = 0
        for r in out_rows:
            for t in r["tags"]:
                n_tags += 1
                cs, ce = int(t["char_start"]), int(t["char_end"])
                assert r["text"][cs:ce] == t["token"]  # byte identity
        assert n_tags > 0  # the checkpoint actually tagged something

        # the ckpt:-loaded predictions equal the packaged trained head's
        # (proves the store checkpoint was USED, not a silent fallback)
        from kgkit.ner_core import predict
        from kgkit.ner_core.trained import default_trained_tagger

        by_text = {r["text"]: r["tags"] for r in out_rows}
        direct = predict(
            phases["test"], level="entity", autocorrect=True,
            tagger=default_trained_tagger(),
        )
        for text, want in zip(phases["test"], direct):
            got = [
                (int(t["char_start"]), int(t["char_end"]), t["tag"])
                for t in by_text[text]
            ]
            assert got == [
                (int(t["char_start"]), int(t["char_end"]), t["tag"])
                for t in want
            ]

        # -- 4. evaluate: CLI rows == metrics_fanout_df (EVALUATION_DICT
        #    parity — reference asserts get_result returns these scores)
        res = _run_cli(
            ["evaluate", "--sf-dir", SF_DIR, "--shuffle-partitions", "8"]
        )
        assert res.returncode == 0, res.stderr
        cli_rows = [
            json.loads(line) for line in res.stdout.strip().splitlines()
        ]
        from kgkit.queries import QUERIES

        want_rows = [r.asDict() for r in QUERIES["eval_fanout"](spark, SF_DIR).collect()]
        key = lambda r: (r["level"], r["subset"])  # noqa: E731
        assert sorted(map(key, cli_rows)) == sorted(map(key, want_rows))
        want_by = {key(r): r for r in want_rows}
        for r in cli_rows:
            w = want_by[key(r)]
            for col, v in r.items():
                if isinstance(v, float):
                    assert v == pytest.approx(w[col], abs=1e-9), (key(r), col)
                else:
                    assert v == w[col], (key(r), col)
