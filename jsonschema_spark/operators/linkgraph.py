"""Link-graph extraction and iterative host rank over crawl pages.

Curation pipelines weight documents by the link structure of the crawl
(Common Crawl publishes host-level harmonic/PageRank centrality; quality
samplers consume it as a prior). This module builds the host link graph
from the ``html`` column and runs a fixed-iteration PageRank on it,
Spark-first.

Scale shape:
- ``extract_links`` is ONE ``regexp_extract_all`` inside the scan
  projection (JVM, zero Python);
- the edge list is hosts×hosts — orders of magnitude smaller than the
  corpus; ``link_edges_df`` pays one distinct-shuffle to build it;
- each rank iteration is one join (edges ⋈ ranks on src) + one groupBy
  (dst) — the groupBy's map-side partial sums defuse in-degree skew
  (every crawl has a few hosts with millions of in-links); out-degree
  skew on the join is AQE's skew-join case. At crawl scale, bucket the
  edge table by src so the per-iteration join is co-located and only the
  small rank table moves;
- per-iteration ``localCheckpoint`` truncates lineage — the classic
  iterative-algorithm discipline that keeps plan size O(1) in rounds.

Cross-engine contract: ALL rank arithmetic is int64 — mass starts at
1e6 ppm per host, each hop moves ``rank div outdeg`` along every edge
and damps by ``(85 * in_mass) div 100 + 150000``. Integer division both
sides means the DuckDB oracle (``host_rank_sql`` mirrors the same
unrolled iterations) matches bit-for-bit at any iteration count; doubles
would drift in the last ulp. Mass at hosts without out-links leaks
(standard simplification; both engines leak identically). Overflow
headroom: total mass ≤ 1e6 × hosts ≤ 1e15 at 10^9 hosts; 85× that is
still two decades under int64.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# href extraction: absolute http(s) links in double-quoted href attributes.
# Group 1 = the URL up to any #fragment (consumed outside the group —
# fragments are client-side and never part of the fetched resource).
# RE2∩Java-safe; shared verbatim with the oracle.
HREF_RE = r'(?i)href="(https?://[^"#]+)[^"]*"'

# host component of an absolute URL (mirrors urltools host parsing)
HOST_RE = r"^[a-zA-Z][^:/?#]*://([^/?#:]+)"

BASE_PPM = 150_000   # (1 - d) * 1e6
DAMP_PCT = 85        # d * 100


def extract_links(html_col: Column, *, binary: bool = True) -> Column:
    """Array of absolute hrefs in an HTML column (entity-decoded ``&amp;``
    only — the one entity legal inside a URL attribute). Pure JVM."""
    s = F.decode(html_col, "UTF-8") if binary else html_col
    links = F.regexp_extract_all(s, F.lit(HREF_RE), 1)
    return F.transform(links, lambda u: F.replace(u, F.lit("&amp;"), F.lit("&")))


def link_edges_df(
    df: DataFrame,
    src_host_col: str = "src_host",
    html_col: str = "html",
    *,
    binary: bool = True,
) -> DataFrame:
    """Distinct (src_host, dst_host) edges, self-loops dropped.

    One explode + one distinct shuffle; output is host-granular (tiny
    relative to the page table)."""
    dst = F.lower(F.regexp_extract(F.col("_link"), HOST_RE, 1))
    return (
        df.select(F.col(src_host_col).alias("src_host"),
                  F.explode(extract_links(F.col(html_col), binary=binary)).alias("_link"))
        .select("src_host", dst.alias("dst_host"))
        .where((F.col("dst_host") != "") & (F.col("dst_host") != F.col("src_host")))
        .distinct()
    )


def host_rank_df(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Fixed-iteration integer PageRank over (src_host, dst_host) edges.

    Returns (host, rank_ppm) for every host on either edge side. See the
    module docstring for the arithmetic contract and scale shape."""
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("src_host").agg(F.count("*").alias("deg"))
    # deg rides along each edge so iterations only ever join on ranks
    ed = edges.join(outdeg, "src_host").localCheckpoint(eager=False)

    ranks = nodes.select("host", F.lit(1_000_000).cast("long").alias("rank_ppm"))
    for _ in range(n_iter):
        inmass = (
            ed.join(ranks, ed.src_host == ranks.host)
            .select(F.col("dst_host").alias("host"),
                    F.expr("rank_ppm div deg").alias("share"))
            .groupBy("host")
            .agg(F.sum("share").alias("m"))
        )
        ranks = (
            nodes.join(inmass, "host", "left")
            .select(
                "host",
                (F.lit(BASE_PPM)
                 + F.expr(f"({DAMP_PCT} * coalesce(m, 0L)) div 100")
                 ).cast("long").alias("rank_ppm"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def host_rank_sql(edges_cte: str, n_iter: int = 3) -> str:
    """DuckDB mirror: unrolled iterations of the SAME integer formula.

    ``edges_cte`` must be a CTE body producing (src_host, dst_host)."""
    parts = [
        f"e AS ({edges_cte})",
        "n AS (SELECT DISTINCT host FROM (SELECT src_host AS host FROM e "
        "UNION ALL SELECT dst_host FROM e))",
        "od AS (SELECT src_host, count(*)::BIGINT AS deg FROM e GROUP BY 1)",
        "r0 AS (SELECT host, 1000000::BIGINT AS r FROM n)",
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"m{t} AS (SELECT e.dst_host AS host, sum(r{t-1}.r // od.deg)::BIGINT AS m "
            f"FROM e JOIN r{t-1} ON e.src_host = r{t-1}.host "
            f"JOIN od ON e.src_host = od.src_host GROUP BY 1)"
        )
        parts.append(
            f"r{t} AS (SELECT n.host, "
            f"({BASE_PPM} + ({DAMP_PCT} * coalesce(m{t}.m, 0)) // 100)::BIGINT AS r "
            f"FROM n LEFT JOIN m{t} USING (host))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT host, r AS rank_ppm FROM r{n_iter}"
    )


# a whole <a ...href="http...">…</a> element (group 0 used; inner parsing
# happens per element). RE2∩Java-safe, shared with the oracle.
ANCHOR_EL_RE = r'(?is)<a\s[^>]*href="https?://[^"]*"[^>]*>.*?</a>'
# strip tags inside an element; collapse to the visible anchor text
_TAGS_RE = r"(?s)<[^>]*>"
_WS_RE = r"\s+"


def anchor_text_df(
    df: DataFrame,
    src_host_col: str = "src_host",
    html_col: str = "html",
    *,
    binary: bool = True,
) -> DataFrame:
    """(src_host, dst_host, anchor) per absolute link with visible text.

    Anchor text is what the LINKING page says the target is — the classic
    web relevance/quality signal (used by search engines and by corpus
    quality priors alike). Extraction: whole <a> elements found by ONE
    regexp_extract_all in the scan projection, then per-element href +
    tag-stripped, entity-decoded, whitespace-collapsed inner text. Pure
    JVM throughout (the per-element transforms run over a handful of
    links per page); one explode, no shuffle. Links with empty visible
    text (image links) are dropped.
    """
    s = F.decode(F.col(html_col), "UTF-8") if binary else F.col(html_col)
    el = F.explode(F.regexp_extract_all(s, F.lit(ANCHOR_EL_RE), 0)).alias("_el")
    url = F.replace(F.regexp_extract(F.col("_el"), HREF_RE, 1),
                    F.lit("&amp;"), F.lit("&"))
    anchor = F.regexp_replace(F.col("_el"), _TAGS_RE, " ")
    for lit, rep in (("&nbsp;", " "), ("&amp;", "&")):
        anchor = F.replace(anchor, F.lit(lit), F.lit(rep))
    anchor = F.trim(F.regexp_replace(anchor, _WS_RE, " "))
    dst = F.lower(F.regexp_extract(url, HOST_RE, 1))
    return (
        df.select(F.col(src_host_col).alias("src_host"), el)
        .select("src_host", dst.alias("dst_host"), anchor.alias("anchor"))
        .where((F.col("dst_host") != "") & (F.col("anchor") != ""))
    )


def anchor_text_sql(pages_cte: str) -> str:
    """DuckDB mirror of ``anchor_text_df`` over a (src_host, html VARCHAR)
    CTE body — same regexes, same step order."""
    return f"""
SELECT src_host, dst_host, anchor FROM (
  SELECT src_host,
         lower(regexp_extract(replace(regexp_extract(el, '{HREF_RE}', 1),
                                      '&amp;', '&'), '{HOST_RE}', 1)) AS dst_host,
         trim(regexp_replace(replace(replace(
              regexp_replace(el, '{_TAGS_RE}', ' ', 'g'),
              '&nbsp;', ' '), '&amp;', '&'), '{_WS_RE}', ' ', 'g')) AS anchor
  FROM (SELECT src_host,
               unnest(regexp_extract_all(html, '{ANCHOR_EL_RE}', 0)) AS el
        FROM ({pages_cte})))
WHERE dst_host <> '' AND anchor <> ''"""


def host_hits_df(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) over (src_host, dst_host)
    edges: hubs point at good authorities, authorities are pointed at by
    good hubs — the complementary centrality to PageRank (a page hub
    score is a *curation* signal: link farms are hubs with no authority).

    Iteration (the classic order): authₜ = Σ_in hubₜ₋₁, then
    hubₜ = Σ_out authₜ; each vector renormalizes to max = 1e6 ppm via
    ``floor(s·1e6 / max)`` computed as ONE int64→double multiply + divide
    + floor — bit-identical in Spark and DuckDB (pure-int64 would
    overflow at 1e6·in-degree·1e6 for crawl-scale degrees; L2 norms need
    sqrt, which no integer oracle can replay). Hosts with no in-links
    get authority 0 after round 1 (and mirror-wise for hubs).

    Returns (host, hub_ppm, auth_ppm) for every host on either side.

    Scale shape: per round, one src-join + dst-groupBy and one dst-join +
    src-groupBy (map-side partials defuse degree skew both directions),
    plus one scalar max broadcast back as a literal row — no action, no
    driver state. Edge table and per-round vectors localCheckpoint so
    plan size stays O(1) in rounds (same discipline as host_rank_df).
    Pass DISTINCT edges (link_edges_df emits them); multi-edges would
    weight by multiplicity.
    """
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ed = edges.localCheckpoint(eager=False)

    def _norm(raw: DataFrame) -> DataFrame:
        mx = raw.agg(F.max("s").alias("mx"))
        return (
            nodes.join(raw, "host", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "host",
                F.coalesce(
                    F.floor(F.col("s").cast("double") * F.lit(1_000_000) / F.col("mx")),
                    F.lit(0),
                ).cast("long").alias("s"),
            )
            .localCheckpoint(eager=False)
        )

    hubs = nodes.select("host", F.lit(1_000_000).cast("long").alias("s"))
    auth = None
    for _ in range(n_iter):
        araw = (
            ed.join(hubs, ed.src_host == hubs.host)
            .groupBy(ed.dst_host.alias("host"))
            .agg(F.sum("s").alias("s"))
        )
        auth = _norm(araw)
        hraw = (
            ed.join(auth, ed.dst_host == auth.host)
            .groupBy(ed.src_host.alias("host"))
            .agg(F.sum("s").alias("s"))
        )
        hubs = _norm(hraw)
    return (
        nodes.join(hubs.withColumnRenamed("s", "hub_ppm"), "host")
        .join(auth.withColumnRenamed("s", "auth_ppm"), "host")
    )


def host_hits_sql(edges_cte: str, n_iter: int = 3) -> str:
    """DuckDB mirror of host_hits_df: unrolled iterations of the same
    normalize-by-max integer/double formula. Every round CTE is
    MATERIALIZED — each is referenced twice (join + max subquery), so
    default CTE inlining re-expands the whole prior-round tree per
    reference and planning goes exponential in rounds (measured: 2 rounds
    1 s, 3 rounds 7 s, 4 rounds > 2 min on a 13-node graph)."""
    parts = [
        f"e AS MATERIALIZED ({edges_cte})",
        "n AS MATERIALIZED (SELECT DISTINCT host FROM "
        "(SELECT src_host AS host FROM e UNION ALL SELECT dst_host FROM e))",
        "h0 AS MATERIALIZED (SELECT host, 1000000::BIGINT AS s FROM n)",
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"ar{t} AS MATERIALIZED (SELECT e.dst_host AS host, "
            f"sum(h{t-1}.s)::BIGINT AS s "
            f"FROM e JOIN h{t-1} ON e.src_host = h{t-1}.host GROUP BY 1)"
        )
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT n.host, "
            f"coalesce(floor(ar{t}.s::DOUBLE * 1000000 "
            f"/ (SELECT max(s) FROM ar{t}))::BIGINT, 0) AS s "
            f"FROM n LEFT JOIN ar{t} USING (host))"
        )
        parts.append(
            f"hr{t} AS MATERIALIZED (SELECT e.src_host AS host, "
            f"sum(a{t}.s)::BIGINT AS s "
            f"FROM e JOIN a{t} ON e.dst_host = a{t}.host GROUP BY 1)"
        )
        parts.append(
            f"h{t} AS MATERIALIZED (SELECT n.host, "
            f"coalesce(floor(hr{t}.s::DOUBLE * 1000000 "
            f"/ (SELECT max(s) FROM hr{t}))::BIGINT, 0) AS s "
            f"FROM n LEFT JOIN hr{t} USING (host))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT n.host, h{n_iter}.s AS hub_ppm, a{n_iter}.s AS auth_ppm "
        f"FROM n JOIN h{n_iter} USING (host) JOIN a{n_iter} USING (host)"
    )


def link_stats_df(
    df: DataFrame,
    src_host_col: str = "src_host",
    html_col: str = "html",
    *,
    binary: bool = True,
) -> DataFrame:
    """Per-page outlink statistics — the SEO-spam / link-farm feature
    block (a page with hundreds of external links to distinct hosts and
    barely any text is an ad farm): total absolute links, internal vs
    external (same lowercased host as the page), distinct external
    hosts. One pure-JVM projection per page — the link array is exploded
    NOWHERE; counts come from higher-order aggregates over the extracted
    array (bounded by links-per-page, not corpus size), so the operator
    composes inside any scan with zero shuffles.

    Output: (src_host, n_links, n_internal, n_external, n_ext_hosts).
    """
    links = extract_links(F.col(html_col), binary=binary)
    hosts = F.transform(
        links, lambda u: F.lower(F.regexp_extract(u, HOST_RE, 1))
    )
    src = F.lower(F.col(src_host_col))
    n_links = F.size(links).cast("long")
    n_int = F.size(F.filter(hosts, lambda h: h == src)).cast("long")
    ext = F.filter(hosts, lambda h: (h != src) & (h != ""))
    return df.select(
        F.col(src_host_col),
        n_links.alias("n_links"),
        n_int.alias("n_internal"),
        F.size(ext).cast("long").alias("n_external"),
        F.size(F.array_distinct(ext)).cast("long").alias("n_ext_hosts"),
    )


def host_reciprocity(edges: DataFrame) -> DataFrame:
    """Reciprocal-link profile per source host — the classic link-farm /
    link-exchange spam signal: organic sites link asymmetrically, farms
    trade edges both ways. Input: distinct (src_host, dst_host) edges
    (link_edges_df output shape).

    Output: (host, n_out, n_recip, recip_ppm) — out-degree, reciprocated
    out-edges (the reversed edge exists), and their ratio in ppm.

    Scale shape: ONE equi-join of the edge table against its own
    reversal on the composite key (shuffle on (src,dst) — high-entropy,
    skew-safe) + ONE map-side-partial groupBy(src). No windows, no
    explosion: output is host-table-sized."""
    e = edges.select(F.col("src_host").alias("s"),
                     F.col("dst_host").alias("d")) \
        .where(F.col("src_host") != F.col("dst_host")).distinct()
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = e.join(rev, ["s", "d"], "left_semi") \
        .groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("n_recip"))
    out = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("n_out"))
    j = out.join(recip, "s", "left")
    n_recip = F.coalesce(F.col("n_recip"), F.lit(0))
    return j.select(
        F.col("s").alias("host"), "n_out",
        n_recip.alias("n_recip"),
        F.floor(n_recip * 1_000_000 / F.col("n_out")).cast("long")
        .alias("recip_ppm"),
    )


def trustrank_df(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
) -> DataFrame:
    """Fixed-iteration integer TrustRank (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004): PageRank whose teleport mass goes ONLY to a
    hand-vetted trusted seed set, so trust attenuates with link
    distance from the seeds and link-farm islands get none. The spam
    signal downstream is high host_rank with low trustrank.

    ``seeds`` is a one-column (host) DataFrame — at web scale a few
    hundred curated hosts, always broadcastable. Same integer-ppm
    arithmetic contract as ``host_rank_df`` (seed nodes start at 1e6
    and receive the 150000-ppm teleport base; everyone else starts at
    0 and inherits trust only through in-links: rank = base_seed +
    (85·inmass) div 100, inmass = Σ rank div outdeg); per-iteration
    localCheckpoint cuts the lineage, edges carry their outdeg so
    iterations only ever join on the rank table."""
    seed_flag = seeds.select(
        F.col(seeds.columns[0]).alias("host"), F.lit(1).alias("_seed"))
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
        .join(F.broadcast(seed_flag), "host", "left")
        .select("host", F.coalesce("_seed", F.lit(0)).alias("_seed"))
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("src_host").agg(F.count("*").alias("deg"))
    ed = edges.join(outdeg, "src_host").localCheckpoint(eager=False)

    base = (F.col("_seed") * BASE_PPM).cast("long")
    ranks = nodes.select(
        "host", (F.col("_seed") * 1_000_000).cast("long").alias("trust_ppm"))
    for _ in range(n_iter):
        inmass = (
            ed.join(ranks, ed.src_host == ranks.host)
            .select(F.col("dst_host").alias("host"),
                    F.expr("trust_ppm div deg").alias("share"))
            .groupBy("host")
            .agg(F.sum("share").alias("m"))
        )
        ranks = (
            nodes.join(inmass, "host", "left")
            .select(
                "host",
                (base + F.expr(f"({DAMP_PCT} * coalesce(m, 0L)) div 100")
                 ).cast("long").alias("trust_ppm"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def trustrank_sql(edges_cte: str, seeds_cte: str, n_iter: int = 3) -> str:
    """DuckDB mirror of ``trustrank_df`` — unrolled iterations of the
    same integer formula. ``seeds_cte`` must produce one column
    ``host``."""
    parts = [
        f"e AS ({edges_cte})",
        f"sd AS ({seeds_cte})",
        # graph nodes only — a seed host absent from the graph gets no row,
        # matching the Spark side (nodes derive from edges, seeds left-join)
        "n AS (SELECT g.host, CASE WHEN sd.host IS NOT NULL THEN 1 ELSE 0 "
        "END AS s FROM (SELECT DISTINCT host FROM ("
        "SELECT src_host AS host FROM e UNION ALL SELECT dst_host FROM e"
        ")) g LEFT JOIN sd ON g.host = sd.host)",
        "od AS (SELECT src_host, count(*)::BIGINT AS deg FROM e GROUP BY 1)",
        "r0 AS (SELECT host, (s * 1000000)::BIGINT AS r FROM n)",
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"m{t} AS (SELECT e.dst_host AS host, "
            f"sum(r{t-1}.r // od.deg)::BIGINT AS m "
            f"FROM e JOIN r{t-1} ON e.src_host = r{t-1}.host "
            f"JOIN od ON e.src_host = od.src_host GROUP BY 1)"
        )
        parts.append(
            f"r{t} AS (SELECT n.host, "
            f"(n.s * {BASE_PPM} + ({DAMP_PCT} * coalesce(m{t}.m, 0)) // 100)"
            f"::BIGINT AS r FROM n LEFT JOIN m{t} USING (host))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT host, r AS trust_ppm FROM r{n_iter}"
    )


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Redirect-chain resolution by pointer jumping — collapse every
    HTTP 3xx chain to its terminal URL in O(log max_hops) rounds, the
    crawl-ingest step that turns (url, Location) hop pairs into the
    canonical fetch target. Chains are short in the mean but adversarial
    in the tail (SEO redirect laundering, tracking-hop stacks, outright
    loops); browsers cap at ~20 hops, so ``max_hops`` is a contract, not
    a tuning knob.

    Input: one row per observed redirect hop (``src_col`` → ``dst_col``).
    A source with several recorded Locations (content-dependent
    redirects, refetch churn) deterministically keeps ``min(dst)``.

    Output: one row per redirect SOURCE —
    (url, final_url, n_hops, resolved):

    - resolved=true: ``final_url`` is a terminal (no outgoing redirect)
      reached in exactly ``n_hops`` hops within the horizon;
    - resolved=false: a loop, or a chain longer than the horizon;
      ``final_url`` is the walk position after exactly ``n_hops``
      (= horizon) hops — still useful as the politeness-budget charge.

    URLs that never redirect don't emit rows (union them as identity).

    The horizon is ``2**ceil(log2(max_hops))`` ≥ max_hops: after round
    r every pointer has advanced ``min(chain_len, 2**r)`` hops (the
    doubling invariant holds for walks into cycles too), so
    ``ceil(log2(max_hops))`` self-joins replace ``max_hops`` sequential
    ones — O(log d) exchanges where naive following is O(d), the same
    reason connected components pointer-jump (``dedup.py``).

    Scale shape: state is one (node, ptr, n_hops) row per redirect
    source; each round is ONE self-equi-join on the pointer (shuffle on
    a high-entropy URL key — skew-free because every node has exactly
    one pointer) over a ``localCheckpoint``-ed state (self-joins
    recompute both sides otherwise; lineage stays O(1) in rounds). The
    terminal flag is one left join against the source set. Nothing is
    collected, nothing broadcast.

    Cross-engine: hop counts are exact int64; the DuckDB mirror is a
    recursive CTE capped at the same horizon (``WHERE hops < 2**r``)
    taking ``arg_max(ptr, hops)`` per node — bit-identical n_hops and
    final_url including loop rows (both engines stop at exactly the
    horizon). Reference analogue: resolution/redirect following in the
    reference's HTTP ``$ref`` resolver (src/core documentation surface);
    here it is the data-plane operator a frontier needs.
    """
    import math

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    p = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.min(dst_col).alias("ptr"))
    state = p.select(
        "node", "ptr", F.lit(1).cast("long").alias("n_hops"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        a, b = state.alias("a"), state.alias("b")
        state = a.join(b, F.col("a.ptr") == F.col("b.node"), "left").select(
            F.col("a.node").alias("node"),
            F.coalesce(F.col("b.ptr"), F.col("a.ptr")).alias("ptr"),
            (F.col("a.n_hops")
             + F.coalesce(F.col("b.n_hops"), F.lit(0).cast("long")))
            .alias("n_hops"),
        ).localCheckpoint(eager=True)
    srcs = p.select(F.col("node").alias("_t"), F.lit(1).alias("_has_out"))
    return state.join(srcs, state["ptr"] == srcs["_t"], "left").select(
        F.col("node").alias("url"),
        F.col("ptr").alias("final_url"),
        "n_hops",
        F.col("_has_out").isNull().alias("resolved"),
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation over the undirected simple
    graph — the link-farm clique signal `host_reciprocity` can't see
    (mutual links are 2-cycles; a farm is a dense triangle mesh).
    Output: (host, n_triangles), nodes in ≥1 triangle only.

    Scale shape is the degree-ordered orientation (compact-forward /
    Latapy 2008): orient every edge from the (degree, node)-smaller
    endpoint to the larger, then wedges are pairs of OUT-edges of a
    common low-degree endpoint and close iff the oriented (v, w) edge
    exists. Under this orientation out-degree is O(√E), so the wedge
    self-join fans out per-task-bounded even when a hub carries
    millions of links — the lexicographic orientation a simpler
    implementation would use keeps a hub that merely SORTS low as a
    full-fan-out wedge center. Each triangle materializes exactly
    once. Three narrow exchanges (dedup, degree, wedge join on the
    low endpoint) + one closure join; the oriented edge set is
    localCheckpointed once because wedge and closure both consume it.
    Self-loops dropped; duplicate / reversed raw edges collapse in
    the canonical dedup.
    """
    s, d = F.col(src), F.col(dst)
    e0 = (
        edges.where(s.isNotNull() & d.isNotNull() & (s != d))
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    deg = (
        e0.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n").agg(F.count(F.lit(1)).alias("dg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("dg").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("dg").alias("_db"))
    ed = e0.join(da, "a").join(db, "b")
    lo = F.struct(F.col("_da").alias("dg"), F.col("a").alias("n")) \
        < F.struct(F.col("_db").alias("dg"), F.col("b").alias("n"))
    e = ed.select(
        F.when(lo, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo, F.col("_db")).otherwise(F.col("_da")).alias("_dv"),
    ).localCheckpoint(eager=True)
    p = e.select(F.col("u"), F.col("v"), F.col("_dv"))
    q = e.select(F.col("u").alias("u2"), F.col("v").alias("w"),
                 F.col("_dv").alias("_dw"))
    # each unordered out-neighbor pair once, ordered by (deg, node)
    wedge = p.join(q, (F.col("u") == F.col("u2"))
                   & (F.struct(F.col("_dv").alias("dg"),
                               F.col("v").alias("n"))
                      < F.struct(F.col("_dw").alias("dg"),
                                 F.col("w").alias("n"))))
    closer = e.select(F.col("u").alias("_cu"),
                      F.col("v").alias("_cv"))
    tri = wedge.join(
        closer, (F.col("v") == F.col("_cu"))
        & (F.col("w") == F.col("_cv")))
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
