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


SEED_SHUFFLE = {"train": 4, "val": 5, "test": 6}  # base_formatter.py:15-19


def mersenne_shuffle(df: DataFrame, key: str, seed: int) -> DataFrame:
    """EXACT-RNG corpus shuffle (X2, base_formatter.py:371-415): the
    same permutation as the reference's ``random.Random(seed).shuffle``
    (CPython Mersenne-twister Fisher-Yates), reproduced bit-for-bit.

    The reference shuffles a per-phase PYTHON LIST of sentences — a
    driver-memory object by construction — so replicating it is
    inherently a driver-side permutation of the key list: collect the
    ordered keys (per-phase corpora; bounded like the reference's own
    lists), shuffle them with the identical RNG, and broadcast-join the
    resulting (key, shuffle_pos) map back onto the rows.  The ROW data
    never moves through the driver, only the keys.  For corpora too
    large for any single node — where the reference itself cannot run —
    use ``seeded_shuffle`` (the distributed seeded-hash order).

    Input keys are collected in ascending ``key`` order (the reference
    shuffles its file-order list; callers with a meaningful file order
    should pre-sort accordingly).  ``key`` must be UNIQUE per row — the
    (key, shuffle_pos) map joins back by equality, so a duplicated key
    would fan its rows out once per duplicate position (asserted)."""
    import random

    keys = [r[0] for r in df.select(key).orderBy(key).collect()]
    if len(keys) != len(set(keys)):
        raise ValueError(
            f"mersenne_shuffle requires unique values in {key!r}: "
            f"{len(keys)} rows but {len(set(keys))} distinct keys"
        )
    random.Random(seed).shuffle(keys)
    pos_df = df.sparkSession.createDataFrame(
        [(k, i) for i, k in enumerate(keys)],
        f"{key} {dict(df.dtypes)[key]}, shuffle_pos bigint",
    )
    return df.join(F.broadcast(pos_df), key, "inner")


def split_off_validation_set(
    df: DataFrame, order_key: str, val_fraction: float
) -> Tuple[DataFrame, DataFrame]:
    """K4 — prefix/suffix resplit (base_formatter.py:449-467):
    split_index = int(n * (1 - val_fraction)); rows before it form the
    remainder, rows from it on form the validation set.  Faithful to
    the reference's POSITIONAL iloc split, expressed as a row_number
    window over ``order_key``.  The global window is the price of
    positional semantics; phase corpora are bounded (the reference
    holds them in a pandas frame)."""
    from pyspark.sql import Window

    n = df.count()
    split_index = int(n * (1 - val_fraction))
    w = Window.orderBy(order_key)
    pos = df.withColumn("_pos", F.row_number().over(w) - 1)
    remainder = pos.filter(F.col("_pos") < split_index).drop("_pos")
    val = pos.filter(F.col("_pos") >= split_index).drop("_pos")
    return remainder, val


def resplit_train_val_test(
    df: DataFrame, order_key: str, val_fraction: float
) -> Dict[str, DataFrame]:
    """K4 — single-phase corpus -> train/val/test, the sic_formatter
    composition (sic_formatter.py:161-167): split off the test suffix
    first, then the val suffix of the remainder, same fraction twice."""
    train_val, test = split_off_validation_set(df, order_key, val_fraction)
    train, val = split_off_validation_set(train_val, order_key, val_fraction)
    return {"train": train, "val": val, "test": test}


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
