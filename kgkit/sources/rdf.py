"""RDF N-Triples export — the interop sink for the constructed KG.

The repo's triples live as parquet/Iceberg for pipeline consumers
(operators/triples.py::write_triples); the EXCHANGE format every
triple store (Jena, Virtuoso, QLever, Oxigraph) bulk-loads is W3C
N-Triples: one ``<s> <p> <o> .`` line per triple, UTF-8, order-free —
which also makes it the perfect distributed sink (every partition
writes its own shard of lines; no shuffle, no ordering contract).

Minting (documented, deterministic):
  * a value that already looks like an IRI (``scheme://...``) is kept
    and sanitized; anything else (entity ids like ``Q5``, predicate
    names like ``mentions``) is minted under ``base`` + percent-encoded
    local name.  ``base`` defaults to the RFC 2606 documentation
    domain.
  * IRI sanitization percent-encodes the characters N-Triples forbids
    inside ``<>`` (space ``<>"{}|^`\\`` and ``%`` itself, %-first so
    nothing double-encodes) and strips other C0 controls (cannot
    appear in an IRI at all; documented loss, impossible for the
    pipeline's url/entity vocabulary).
  * literal objects get the ECHAR escapes (``\\ " \\n \\r \\t``).

Everything is a chain of built-in string expressions — the export runs
inside the scan projection at any scale, and ``write_ntriples`` just
appends ``spark.write.text`` (optionally gzip, the bulk-load
convention).  The python twins below are the unit-test spec; the
emitted lines are additionally validated against the N-Triples
grammar and round-tripped through an independent parser
(tests/test_rdf.py).

Reference: W3C RDF 1.1 N-Triples (REC-n-triples-20140225).  No
nerblackbox analog (the reference emits no graph).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BASE = "http://example.org/kg/"

# characters invalid inside <IRI>: %-encoded.  Two tables: a KEPT
# (scheme-bearing) URL is already an IRI whose '%' sequences are its
# own percent-encoding — re-encoding '%' would rewrite
# 'https://x/a%20b' into the DIFFERENT resource '<https://x/a%2520b>'
# (% is legal inside IRIREF); only the genuinely-forbidden characters
# are sanitized.  A MINTED local name is arbitrary text, so there '%'
# IS encoded (% first — nothing double-encodes) and the minting stays
# injective/decodable.
_IRI_SAN = [(" ", "%20"), ("<", "%3C"), (">", "%3E"),
            ('"', "%22"), ("{", "%7B"), ("}", "%7D"), ("|", "%7C"),
            ("^", "%5E"), ("`", "%60"), ("\\", "%5C")]
_IRI_ENC = [("%", "%25")] + _IRI_SAN
# ECHAR escapes for literals: backslash FIRST
_LIT_ENC = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"),
            ("\t", "\\t")]
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"
_CONTROLS = "".join(chr(i) for i in range(0x20) if chr(i) not in "\n\r\t")


def _chain(col: Column, table) -> Column:
    for a, b in table:
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def iri_col(value: Column, base: str = DEFAULT_BASE) -> Column:
    """``<...>`` IRI term: keep-and-sanitize if the value already has a
    scheme (its own %-sequences untouched), else mint under ``base``
    with full (injective) percent-encoding."""
    stripped = F.regexp_replace(value, f"[{re.escape(_CONTROLS)}\n\r\t]", "")
    iri = F.when(
        value.rlike(_SCHEME_RE), _chain(stripped, _IRI_SAN)
    ).otherwise(F.concat(F.lit(base), _chain(stripped, _IRI_ENC)))
    return F.concat(F.lit("<"), iri, F.lit(">"))


def literal_col(value: Column) -> Column:
    """``"..."`` literal term with ECHAR escapes; stray C0 controls
    (other than the escapable three) are stripped."""
    body = F.regexp_replace(
        _chain(value, _LIT_ENC), f"[{re.escape(_CONTROLS)}]", ""
    )
    return F.concat(F.lit('"'), body, F.lit('"'))


def ntriples_lines(
    triples: DataFrame,
    base: str = DEFAULT_BASE,
    literal_objs: bool = False,
) -> DataFrame:
    """(subj, pred, obj, ...) -> one-column frame of N-Triples lines.
    ``literal_objs`` emits objects as string literals (for attribute
    tables) instead of IRIs (the entity-graph default)."""
    obj = (
        literal_col(F.col("obj"))
        if literal_objs
        else iri_col(F.col("obj"), base)
    )
    return triples.select(
        F.concat(
            iri_col(F.col("subj"), base), F.lit(" "),
            iri_col(F.col("pred"), base), F.lit(" "),
            obj, F.lit(" ."),
        ).alias("value")
    )


def write_ntriples(
    triples: DataFrame,
    path: str,
    base: str = DEFAULT_BASE,
    literal_objs: bool = False,
    compression: Optional[str] = "gzip",
) -> None:
    """Distributed N-Triples export: a pure projection per partition,
    zero shuffle; gzip by default (the bulk-load convention — triple
    stores ingest .nt.gz directly)."""
    w = ntriples_lines(triples, base, literal_objs).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


# ---------------------------------------------------------------------------
# python twins (the unit-test spec) + a tiny independent parser
# ---------------------------------------------------------------------------

def iri_py(value: str, base: str = DEFAULT_BASE) -> str:
    body = "".join(ch for ch in value if ch >= " ")  # strip all C0
    kept = bool(re.match(_SCHEME_RE, value))
    for a, b in (_IRI_SAN if kept else _IRI_ENC):
        body = body.replace(a, b)
    return f"<{body}>" if kept else f"<{base}{body}>"


def literal_py(value: str) -> str:
    body = value
    for a, b in _LIT_ENC:
        body = body.replace(a, b)
    # \n\r\t are already two-char escapes; strip the remaining C0
    body = "".join(ch for ch in body if ch >= " ")
    return f'"{body}"'


def ntriples_line_py(
    s: str, p: str, o: str,
    base: str = DEFAULT_BASE, literal_obj: bool = False,
) -> str:
    ot = literal_py(o) if literal_obj else iri_py(o, base)
    return f"{iri_py(s, base)} {iri_py(p, base)} {ot} ."


_LINE_RE = re.compile(
    r'^<([^\x00-\x20<>"{}|^`\\]*)> <([^\x00-\x20<>"{}|^`\\]*)> '
    r'(<[^\x00-\x20<>"{}|^`\\]*>|"(?:[^"\\\n\r]|\\.)*") \.$'
)


def parse_ntriples_line(line: str, base: str = DEFAULT_BASE):
    """Independent grammar check + decode: (s, p, o, is_literal).
    MINTED names (under ``base``) decode exactly — their encoding is
    injective; a KEPT URL comes back as-is (sanitized form) because
    its own %-sequences are indistinguishable from encoding."""
    m = _LINE_RE.match(line)
    if not m:
        raise ValueError(f"not a valid N-Triples line: {line!r}")
    s, p, ot = m.groups()

    def _deciri(x: str) -> str:
        if not x.startswith(base):
            return x  # kept URL: sanitized-only, not decodable
        x = x[len(base):]
        for a, b in reversed(_IRI_ENC):
            x = x.replace(b, a)
        return x

    if ot.startswith("<"):
        return _deciri(s), _deciri(p), _deciri(ot[1:-1]), False
    body = ot[1:-1]
    out, i = [], 0
    dec = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}
    while i < len(body):
        if body[i] == "\\":
            out.append(dec[body[i + 1]])
            i += 2
        else:
            out.append(body[i])
            i += 1
    return _deciri(s), _deciri(p), "".join(out), True
