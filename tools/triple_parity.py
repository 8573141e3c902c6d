"""Triple-parity gate: Spark pipeline vs the single-process reference path.

North rule: emitted (subj, pred, obj) triples must match the reference
pipeline at P/R >= 0.95, with byte-identical extracted text per url.
torch/transformers are absent in this sandbox, so the reference path is
the same NER lifecycle the reference implements (kgkit.ner_core — fuzzed
output-identical against the reference's own tag-algebra modules in
tests/test_differential_reference.py) executed SINGLE-PROCESS in plain
Python, followed by a plain-Python re-implementation of linking,
canonicalization (union-find) and triple assembly.  The Spark pipeline
must reproduce it exactly; scoring is the same full-outer-join mechanism
as kgkit.metrics (SURVEY §2.9 J5).

    python tools/triple_parity.py [sf_dir]      # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_triples(sf_dir: str):
    """Single-process reference-path triples + per-url surface spans."""
    import duckdb

    from kgkit.ner_core import predict
    from kgkit.sources.alias_dict import ALIAS_ROWS, SYNONYM_EDGES

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    # the Spark pipeline's input includes the planted OOV/CJK pages
    # (kgkit.queries._pages); the reference path must see the same
    # corpus or the planted pages' triples score as false positives
    from kgkit.sources.planted import planted_ner_docs

    docs = list(docs) + planted_ner_docs()
    emb = {
        int(v): list(e)
        for v, e in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    }

    # alias dictionary + ambiguity
    by_alias: dict = {}
    for alias, eid, num, prior in ALIAS_ROWS:
        by_alias.setdefault(alias, []).append((eid, num, prior))

    # canonicalization: union-find over shared-alias + synonym edges
    parent = {eid: eid for _, eid, _, _ in ALIAS_ROWS}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # canonical = smaller numeric part of 'Q<n>'
            if int(ra[1:]) < int(rb[1:]):
                parent[rb] = ra
            else:
                parent[ra] = rb

    for cands in by_alias.values():
        for i in range(len(cands)):
            for j in range(i + 1, len(cands)):
                union(cands[i][0], cands[j][0])
    for a, b in SYNONYM_EDGES:
        union(a, b)

    def cosine(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a) ** 0.5
        nb = sum(float(y) * float(y) for y in b) ** 0.5
        return round(dot / (na * nb), 6)

    texts = [t for _, t in docs]
    results = predict(texts, level="entity", autocorrect=True)

    triples = set()
    byte_identity_violations = 0
    for (doc_id, text), records in zip(docs, results):
        url = f"doc://{doc_id}"
        linked = []
        for mid, r in enumerate(records):
            cs, ce = int(r["char_start"]), int(r["char_end"])
            if text[cs:ce] != r["token"]:
                byte_identity_violations += 1
            cands = by_alias.get(r["token"].lower())
            if not cands:
                continue
            if len(cands) == 1:
                eid = cands[0][0]
            else:
                scored = []
                for eid_c, num, prior in cands:
                    s = (
                        cosine(emb[doc_id], emb[num])
                        if doc_id in emb and num in emb
                        else 0.0
                    )
                    scored.append((-s, -prior, eid_c))
                eid = min(scored)[2]
            linked.append((cs, mid, find(eid)))
        linked.sort()
        for _, _, ent in linked:
            triples.add((url, "mentions", ent))
        for (a, b) in zip(linked, linked[1:]):
            triples.add((a[2], "cooccurs_with", b[2]))

    return triples, byte_identity_violations


def spark_triples(sf_dir: str):
    from bench import build_spark
    from kgkit.queries import QUERIES

    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "16")), "parity")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rows = QUERIES["kg_triples"](spark, sf_dir).collect()
        return {(r["subj"], r["pred"], r["obj"]) for r in rows}
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ref, violations = reference_triples(sf_dir)
    got = spark_triples(sf_dir)
    tp = len(ref & got)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(ref) if ref else 0.0
    print(json.dumps({
        "metric": "triple_parity",
        "sf_dir": sf_dir,
        "n_reference": len(ref),
        "n_spark": len(got),
        "tp": tp,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "byte_identity_violations": violations,
        "pass": precision >= 0.95 and recall >= 0.95 and violations == 0,
    }))


if __name__ == "__main__":
    main()
