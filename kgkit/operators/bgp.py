"""Basic-graph-pattern matching — querying the constructed KG.

A knowledge graph is only useful if it can be QUERIED, and the lingua
franca for that is the SPARQL basic graph pattern: a conjunction of
(subject, predicate, object) triple patterns whose shared variables
must bind consistently.  ``match_patterns`` compiles a BGP directly to
DataFrame operations over any (subj, pred, obj) table — the durable
triples store, the typed relation table, or the streaming store's
latest-version view:

    match_patterns(t, [("?d", "mentions", "Q1"),
                       ("?d", "mentions", "?x")])

Compilation, pattern by pattern:
  * constants become pushed-down scan filters (at a pred/subj-bucketed
    store they prune partitions — the pattern scan reads only its
    slice of 100 TB);
  * variables become projected, variable-named columns (a variable
    repeated WITHIN a pattern becomes an equality filter);
  * patterns join on their shared variables.  Join ORDER is the
    classic static heuristic — most-constant (most selective) pattern
    first, then always a pattern connected to the already-bound
    variables, so a connected BGP never degenerates to a cartesian
    product mid-plan (disconnected components genuinely ARE cartesian
    in SPARQL semantics; allowed, documented, and last).  The
    PHYSICAL strategy stays Catalyst's: selective pattern frames are
    AQE-broadcast under the configured threshold, the rest shuffle on
    the join variables exactly like any relational plan.

This is deliberately a RELATIONAL compilation (the worst-case-optimal
/ multiway-join literature is out of scope): every stage is a plain
equi-join Catalyst can reorder, broadcast, and skew-split, which is
the right default at cluster scale.

Verification: tests/test_bgp.py runs every pattern shape against a
DuckDB SQL self-join twin generated from the same BGP (independent
engine, independent compilation) on deterministic synthetic graphs,
plus a composition test over the real stage-3 triples table.

No reference analog (nerblackbox constructs no graph); cite:
SPARQL 1.1 BGP semantics (W3C REC), the standard relational
compilation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Pattern = Tuple[str, str, str]
_POS = ("subj", "pred", "obj")


def is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _vars(p: Pattern) -> List[str]:
    # order-stable unique variable names, '?' stripped
    return list(dict.fromkeys(t[1:] for t in p if is_var(t)))


def _compile_one(triples: DataFrame, p: Pattern, i: int) -> DataFrame:
    """One pattern -> a frame with one column per distinct variable."""
    df = triples
    seen: Dict[str, str] = {}  # var name -> first column bound to it
    cols = []
    for col, term in zip(_POS, p):
        if not is_var(term):
            df = df.filter(F.col(col) == F.lit(term))
        elif term[1:] in seen:  # repeated var within the pattern
            df = df.filter(F.col(col) == F.col(seen[term[1:]]))
        else:
            seen[term[1:]] = col
            cols.append(F.col(col).alias(term[1:]))
    if not cols:
        # fully-constant pattern: binds no variables but, under the
        # SPARQL bag semantics the SQL twin implements, contributes
        # its SUPPORT MULTIPLICITY (one row per matching triple) —
        # a limit(1) here would silently collapse duplicate support
        return df.select(F.lit(1).alias(f"_const{i}"))
    return df.select(*cols)


def _order(patterns: Sequence[Pattern]) -> List[Pattern]:
    """Most-constant pattern first, then stay connected to the bound
    variable set; a disconnected component starts (cartesian) only
    when nothing connected remains."""
    remaining = list(patterns)
    n_const = lambda p: sum(0 if is_var(t) else 1 for t in p)  # noqa: E731
    ordered: List[Pattern] = []
    bound: set = set()
    while remaining:
        connected = [p for p in remaining if bound & set(_vars(p))]
        pool = connected or remaining
        # tie-break on the pattern tuple itself: deterministic plans
        best = max(pool, key=lambda p: (n_const(p), p))
        ordered.append(best)
        remaining.remove(best)
        bound |= set(_vars(best))
    return ordered


def match_patterns(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    select: Optional[Sequence[str]] = None,
    where: Optional[Column] = None,
    distinct: bool = False,
) -> DataFrame:
    """Match a conjunction of (s, p, o) patterns ('?name' = variable)
    against a (subj, pred, obj) table; returns one column per variable
    (bag semantics — pass ``distinct=True`` for set semantics, and an
    optional ``where`` Column as the SPARQL FILTER).

    The input is scanned once per pattern: callers composing over an
    expensive lineage (the stage-3 UDF pipeline) should hand in a
    materialized frame (the multi-branch fan-out discipline —
    localCheckpoint or a read of the durable store)."""
    if not patterns:
        raise ValueError("empty pattern list")
    # '_const' prefixes the internal constant-filter columns dropped
    # below — a user variable named '?_const…' would silently vanish
    # from the result instead of binding (ADVICE r5)
    for p in patterns:
        for v in _vars(p):
            if v.startswith("_const"):
                raise ValueError(
                    f"variable name {v!r} uses the reserved '_const' prefix"
                )
    ordered = _order(patterns)
    out = _compile_one(triples, ordered[0], 0)
    for i, p in enumerate(ordered[1:], start=1):
        nxt = _compile_one(triples, p, i)
        shared = [
            c for c in out.columns
            if c in nxt.columns and not c.startswith("_const")
        ]
        out = out.join(nxt, shared) if shared else out.crossJoin(nxt)
    out = out.drop(*[c for c in out.columns if c.startswith("_const")])
    if where is not None:
        out = out.filter(where)
    if select:
        missing = [v for v in select if v not in out.columns]
        if missing:
            raise ValueError(f"unbound variables in select: {missing}")
        out = out.select(*select)
    return out.distinct() if distinct else out


def bgp_to_sql(
    patterns: Sequence[Pattern],
    table: str = "triples",
    select: Optional[Sequence[str]] = None,
    where: Optional[str] = None,
    distinct: bool = False,
) -> str:
    """The same BGP as ANSI self-join SQL (the DuckDB differential twin
    in tests/test_bgp.py — an independent compilation path: no join
    reordering, variables bound via WHERE equalities)."""
    if not patterns:
        raise ValueError("empty pattern list")
    conds: List[str] = []
    first_bind: Dict[str, str] = {}
    for i, p in enumerate(patterns):
        for col, term in zip(_POS, p):
            ref = f"t{i}.{col}"
            if not is_var(term):
                conds.append(f"{ref} = '" + term.replace("'", "''") + "'")
            elif term[1:] in first_bind:
                conds.append(f"{ref} = {first_bind[term[1:]]}")
            else:
                first_bind[term[1:]] = ref
    sel = select or list(first_bind)
    if not sel:
        raise ValueError("no variables to select")
    cols = ", ".join(f"{first_bind[v]} AS {v}" for v in sel)
    frm = ", ".join(f"{table} t{i}" for i in range(len(patterns)))
    sql = f"SELECT {'DISTINCT ' if distinct else ''}{cols} FROM {frm}"
    if conds or where:
        sql += " WHERE " + " AND ".join(conds + ([where] if where else []))
    return sql
