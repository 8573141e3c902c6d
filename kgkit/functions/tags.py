"""Column-level tag/span helpers (SURVEY §2.3 P4/P5/P10, §2.7 X2).

All pure column expressions over broadcast map literals — Catalyst
folds them into the scan projection."""

from __future__ import annotations

from itertools import chain
from typing import Dict, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_tag_mapping(tag: Column, mapping: Dict[str, str],
                      default_to_o: bool = False) -> Column:
    """Dataset tag rename via a map literal (P4: ner_tag_mapping.json,
    base_formatter.py:293-312; P5: eval class mapping with unknown -> 'O',
    api/model.py:886-917).  '0' is normalized to 'O' like the reference."""
    normalized = F.when(tag == "0", F.lit("O")).otherwise(tag)
    if not mapping:
        return normalized
    map_lit = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    mapped = F.element_at(map_lit, normalized)
    fallback = F.lit("O") if default_to_o else normalized
    return F.coalesce(mapped, fallback)


def shift_spans(tags: Column, delta: Column) -> Column:
    """Shift a tags array's char offsets by ``delta`` (P10: document- to
    sentence-relative boundary normalization,
    huggingface_datasets_formatter.py:321-348)."""
    return F.transform(
        tags,
        lambda t: F.struct(
            (t["char_start"] - delta).cast("int").alias("char_start"),
            (t["char_end"] - delta).cast("int").alias("char_end"),
            t["token"].alias("token"),
            t["tag"].alias("tag"),
        ),
    )


def seeded_shuffle(df: DataFrame, key: str, seed: int) -> DataFrame:
    """Deterministic corpus shuffle (X2, base_formatter.py:371-415).

    The reference uses random.Random(seed).shuffle — an in-memory
    permutation that cannot scale past one node.  The distributed
    equivalent orders by a seeded hash of the row key: deterministic
    across runs/cluster sizes, uniformly mixing, O(n log n) in one
    shuffle.  (Same intent, different permutation than CPython's
    Mersenne twister — the reference's tests run shuffle=False paths.)
    """
    return df.orderBy(F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(key).cast("string"))))


def split_fractions(df: DataFrame, key: str,
                    fractions: Dict[str, Tuple[float, float]]) -> DataFrame:
    """Deterministic hash split (X1): adds 'phase' from [lo, hi) buckets
    of pmod(xxhash64(key), 100)/100."""
    bucket = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(100)) / 100.0
    expr = F.lit(None).cast("string")
    out = None
    for phase, (lo, hi) in fractions.items():
        cond = (bucket >= lo) & (bucket < hi)
        out = F.when(cond, phase) if out is None else out.when(cond, phase)
    return df.withColumn("phase", out)
