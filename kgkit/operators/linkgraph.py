"""Link graph + host authority — the web-graph quality signal.

A 100-TB webtext pipeline weights documents by the authority of their
host (Common-Crawl harmonic-centrality ranks, OpenWebText's karma
filter): crawl hygiene needs to know which hosts the web itself vouches
for.  Reference parallel: nerblackbox has no web-graph stage (its
inputs are curated datasets); this family is part of the LLM-pipeline
surface kgkit adds on top (SURVEY §2.3).

Scale shape, in three tiers that shrink by orders of magnitude each:

1. ``page_links`` — href extraction is a JVM regexp projection over the
   page scan (no Python; the WARC payload is already in memory), one
   explode.  Page-level output is corpus-sized: never materialized, it
   flows straight into the host aggregation.
2. ``host_edges`` — one groupBy on (src_host, dst_host).  Map-side
   combine collapses the page fan-in before the shuffle, so what
   shuffles is the HOST×HOST edge frame (~10^7 rows for the whole web,
   vs ~10^11 pages).
3. ``pagerank`` — iterates on the host graph only, with shuffle width
   sized to the GRAPH (the connected_components discipline,
   canonicalize.py): log-ish rounds of a join+groupBy on a frame a
   million times smaller than the corpus, each round localCheckpointed
   to cut lineage.

Integer exactness: ranks live on a 2^40 grid and every update is pure
BIGINT (multiply, sum, integer ``div``), so the recurrence is
bit-identical between Spark and the DuckDB oracle
(oracles._host_authority_sql) and the driver hash-checks the final
ranks exactly — the same no-cross-engine-floats rule as the trained
head and the k-means centroids.  Dangling hosts (no out-links) leak
their damped mass by design (the rank vector is a fixpoint ranking, not
a probability simplex); both engines implement the identical variant.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rank grid — large enough that Q div n keeps ~28 bits of precision
#: even at n = 10^7 hosts, small enough that damping-numerator products
#: (num * sum-of-contribs <= num * Q ~ 2^47) never approach int64.
Q_GRID = 1 << 40

_HREF_RE = r"""(?i)<a\s[^>]*href\s*=\s*["']([^"']*)["']"""


def hrefs_col(html: Column) -> Column:
    """All <a href> targets of an HTML column, as an array — a single
    JVM ``regexp_extract_all`` so extraction stays in the scan
    projection (same budget class as html_text_col)."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), 1)


def page_links(pages: DataFrame, url_col: str = "url",
               html_col: str = "html") -> DataFrame:
    """(url, html) -> (src_url, dst_url), one row per resolvable href.

    Absolute http(s) targets pass through; protocol-relative (//h/p)
    take the source scheme; root-relative (/p) resolve against the
    source origin.  Everything else — mailto:/javascript:/fragment/
    directory-relative — is dropped: at crawl scale those are
    link-graph noise, and directory-relative resolution needs the full
    RFC 3986 merge that belongs in a recrawl frontier, not a ranking
    signal."""
    exploded = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(hrefs_col(F.col(html_col))).alias("href"),
    )
    href = F.col("href")
    scheme = F.lower(F.try_parse_url(F.col("src_url"), F.lit("PROTOCOL")))
    origin = F.concat(
        scheme, F.lit("://"),
        F.lower(F.try_parse_url(F.col("src_url"), F.lit("HOST"))),
    )
    resolved = (
        F.when(href.rlike(r"(?i)^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
    )
    return (
        exploded.select("src_url", resolved.alias("dst_url"))
        .filter(F.col("dst_url").isNotNull())
    )


def host_edges(links: DataFrame) -> DataFrame:
    """(src_url, dst_url) -> (src, dst, weight): host-level link
    counts.  Self-host edges are dropped — intra-site navigation says
    nothing about authority (and at host granularity it is most of the
    raw link mass).  One aggregation; partial (map-side) combine does
    the corpus-to-graph collapse before the only shuffle."""
    src = F.lower(F.try_parse_url(F.col("src_url"), F.lit("HOST")))
    dst = F.lower(F.try_parse_url(F.col("dst_url"), F.lit("HOST")))
    return (
        links.select(src.alias("src"), dst.alias("dst"))
        .filter(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def pagerank(edges: DataFrame, iters: int = 5,
             damping: Tuple[int, int] = (85, 100),
             q_grid: int = Q_GRID) -> DataFrame:
    """edges(src, dst, weight) -> (node, rank_q): ``iters`` rounds of
    the integer-exact PageRank recurrence on the 1/q_grid grid::

        n         = |nodes|
        r_0(v)    = Q div n
        base      = ((den - num) * (Q div n)) div den
        c_t(v)    = sum over in-edges (u,v,w) of (r_t(u) * w) div out_w(u)
        r_{t+1}(v) = base + (num * c_t(v)) div den

    with damping = (num, den) = 85/100.  Every step is BIGINT, so the
    result is bit-identical to the oracle's unrolled SQL CTE chain.
    Fixed iteration count (not convergence-tested) keeps the plan
    deterministic; 5 rounds ranks a host web to well under the grid's
    resolution of interest (contribs contract by 0.85 per round).

    The graph frame is tiny relative to the corpus: shuffle width is
    sized to the edge count (~100k edges/partition, the
    connected_components discipline) and each iteration is
    localCheckpointed so lineage stays O(1).
    """
    num, den = damping
    spark = edges.sparkSession
    n_edges = edges.count()
    n_parts = max(1, min(64, n_edges // 100_000))
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
        e = (
            edges.join(out_w, "src")
            .select("src", "dst", "weight", "out_w")
            .repartition(n_parts, "src")
            .localCheckpoint()
        )
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("rank_q", F.lit(0).cast("long"))
        r0 = q_grid // n
        base = ((den - num) * r0) // den
        ranks = nodes.withColumn("rank_q", F.lit(r0).cast("long"))
        for _ in range(iters):
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .select(
                    F.col("dst"),
                    F.expr("rank_q * weight div out_w").alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            ranks = (
                nodes.join(contrib, nodes.node == contrib.dst, "left")
                .select(
                    "node",
                    F.expr(
                        f"{base}L + ({num}L * coalesce(contrib, 0L)) div {den}L"
                    ).cast("long").alias("rank_q"),
                )
                .localCheckpoint()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return ranks


def host_authority(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html", iters: int = 5,
                   damping: Tuple[int, int] = (85, 100),
                   q_grid: int = Q_GRID) -> DataFrame:
    """The composed signal: pages -> link extraction -> host graph ->
    integer PageRank, joined with each host's in/out link mass.
    Returns (host, rank_q, out_w, in_w) — the frame a quality gate
    joins (broadcast — it is host-sized) onto the corpus."""
    # fan-out: edges feeds pagerank + out_w + in_w.  Materialize the
    # host-sized frame once so the corpus-wide extraction lineage (WARC
    # parse UDF) is not replayed per branch (no ReusedExchange above
    # mapInPandas — the repo-wide persist-at-fanout rule).
    edges = host_edges(page_links(pages, url_col, html_col)).localCheckpoint()
    ranks = pagerank(edges, iters=iters, damping=damping, q_grid=q_grid)
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    in_w = edges.groupBy("dst").agg(F.sum("weight").alias("in_w"))
    return (
        ranks.join(out_w, ranks.node == out_w.src, "left")
        .join(in_w, ranks.node == in_w.dst, "left")
        .select(
            F.col("node").alias("host"),
            "rank_q",
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
        )
    )
