"""Graph analytics over edge tables: PageRank.

Semi-naive iterative DataFrame implementation — per iteration one join
(rank ⋈ edges on the source) and one aggregation (contributions per
destination), both shuffling on node ids; the edge table is broadcast
when small (same AUTO rule as the closure operators). Dangling-node mass
(nodes with no out-edges) is redistributed uniformly each iteration, so
ranks sum to 1 at every step — the textbook formulation, which is also
expressible as a recursive CTE, making the whole iteration
value-oracle-able in DuckDB (contract query ``pagerank_orders``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .hierarchy import BROADCAST_EDGE_ROW_LIMIT


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank steps.

    rank_{t+1}(v) = (1-d)/N + d·(Σ_{u→v} rank_t(u)/deg(u) + dangling_t/N)

    Ranks are exact doubles (no sampling); cross-partition summation
    order is the only nondeterminism, worth ~1 ulp per in-degree — the
    contract oracle compares at 6 decimals. The dangling mass is FOLDED
    into the plan as a broadcast one-row aggregate cross-joined onto the
    rank update (round-3 review item: the scalar used to be collected
    with a separate .first() per iteration — now there is exactly ONE
    driver action per iteration, the eager checkpoint that materializes
    the new ranks and truncates lineage so every iteration is computed
    exactly once).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e = e.localCheckpoint(eager=True)
    if e.count() <= BROADCAST_EDGE_ROW_LIMIT:
        e = F.broadcast(e)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        with_deg = ranks.join(deg, ranks.node == deg.src, "left").select(
            "node", "rank", "deg"
        )
        # dangling mass (total rank on nodes with no out-edges) as a
        # ONE-ROW broadcast frame, not a collected scalar: the cross join
        # is a broadcast of 8 bytes and keeps the whole update in one plan
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .join(e, with_deg.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.col("_dangling") / F.lit(float(n))
                        + F.coalesce("contrib", F.lit(0.0))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pmi_edges(
    mention_rows: DataFrame,
    n_salt: int = 16,
    conv_col: str = "conv_id",
    code_col: str = "code",
) -> DataFrame:
    """Pointwise-mutual-information weighting of co-mention edges — the
    standard signal for pruning coincidental co-occurrence from a
    knowledge graph before materializing (entity, related-to, entity)
    edges (reference analogue: fhir-owl emits only told is-a/synonym
    edges; a transcript-derived graph needs a statistical filter for the
    soft edges mention detection creates):

        pmi(a,b)  = log2( P(a,b) / (P(a)·P(b)) )  over conversations
        npmi(a,b) = pmi / (-log2 P(a,b))     in [-1, 1], 1 ⇔ always
                    together (defined as 1.0 when P(a,b) = 1)

    Scale shape: ONE conv-keyed shuffle (collect_set — each
    conversation's entity set is dictionary-bounded), then map-side
    nested-transform pair expansion into a combiner-backed count (see
    the inline comment: measured ~2× the conv-keyed-self-join form at
    6M turns); the two marginal tables are dictionary-bounded so they
    join BROADCAST; the conversation total folds in as a one-row
    broadcast cross-join (the PageRank dangling-mass pattern — no
    driver action, no collect). ``n_salt`` is accepted for API
    compatibility; the set-expansion form needs no salting because the
    pair count's map-side combine collapses each partition to
    ≤ |dict|² rows before the shuffle. Output is one row per unordered
    pair with ``n_convs``, ``pmi``, ``npmi`` rounded to 6 decimals for
    cross-engine oracle stability.
    """
    # ONE conv-keyed shuffle builds the per-conversation entity SET;
    # everything else derives from that materialized frame (#convs rows,
    # each array bounded by the dictionary — the smallest possible
    # representation of the co-occurrence structure):
    #   pairs     — map-side nested-transform expansion of each sorted
    #               set (no conv-keyed SELF-JOIN: the join form shuffles
    #               the projection twice and materializes the full
    #               quadratic fan-out as join output; here the fan-out
    #               explodes straight into a combiner-backed count, so
    #               the second shuffle carries ≤ |dict|² rows — measured
    #               at 6M turns: 18.9 s join form → 9.7 s this form)
    #   marginals — explode of the same sets + count
    #   totals    — count of the sets frame
    # A hub conversation mentioning k distinct entities still costs
    # O(k²) pair rows (same worst case as the join form, dictionary-
    # bounded by construction) but as map-side COMPUTE, not shuffle.
    sets = (
        mention_rows.select(
            F.col(conv_col).alias("conv_id"), F.col(code_col).alias("code")
        )
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_set("code")).alias("_cs"))
        .localCheckpoint(eager=True)
    )
    totals = sets.agg(F.count(F.lit(1)).cast("double").alias("_n_total"))
    marginals = (
        sets.select(F.explode("_cs").alias("code"))
        .groupBy("code")
        .agg(F.count(F.lit(1)).cast("double").alias("_n_code"))
    )
    n = F.size("_cs")
    pair_array = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("_cs"), i).alias("code_a"),
                    F.element_at(F.col("_cs"), j).alias("code_b"),
                ),
            ),
        )
    )
    pairs = (
        sets.filter(n >= 2)
        .select(F.explode(pair_array).alias("_p"))
        .select("_p.code_a", "_p.code_b")
        .groupBy("code_a", "code_b")
        .agg(F.count(F.lit(1)).alias("n_convs"))
    )
    joined = (
        pairs.join(
            F.broadcast(
                marginals.select(
                    F.col("code").alias("code_a"),
                    F.col("_n_code").alias("_n_a"),
                )
            ),
            "code_a",
        )
        .join(
            F.broadcast(
                marginals.select(
                    F.col("code").alias("code_b"),
                    F.col("_n_code").alias("_n_b"),
                )
            ),
            "code_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    n_ab = F.col("n_convs").cast("double")
    pmi = F.log2(
        (n_ab * F.col("_n_total")) / (F.col("_n_a") * F.col("_n_b"))
    )
    npmi = F.when(n_ab == F.col("_n_total"), F.lit(1.0)).otherwise(
        pmi / -F.log2(n_ab / F.col("_n_total"))
    )
    return joined.select(
        "code_a",
        "code_b",
        F.col("n_convs").cast("long").alias("n_convs"),
        F.round(pmi, 6).alias("pmi"),
        F.round(npmi, 6).alias("npmi"),
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-vertex triangle participation counts over an undirected graph.

    Triadic closure is the standard KG-quality signal over the soft
    (entity, related-to, entity) edge family ``pmi_edges`` materializes:
    an edge embedded in many triangles is corroborated by its neighbors,
    one in none is more likely band noise. Returns (node, n_triangles)
    for every vertex that closes at least one triangle.

    Shape — the degree-orientation algorithm (the standard distributed
    formulation, cf. Suri & Vassilvitskii WWW'11): edges are oriented
    from the (degree, id)-SMALLER endpoint to the larger, so every
    wedge enumeration fans out only over a vertex's LOWER-degree
    out-neighborhood — total wedge volume is O(m^{3/2}) regardless of
    hub degree, the reason a star hub (the fixture's 30%-of-turns
    entity) contributes zero wedges rather than deg² of them. Three
    shuffles: the degree agg, the wedge self-join on the apex, and the
    closing equi-join on (v, w) — no cartesian anywhere, every key a
    node id or an id pair.

    Deterministic total order (degree, id) makes the orientation — and
    therefore the oracle's CTE replica — engine-independent.
    """
    # NOTE on materialization: `e` and `oriented` each feed multiple
    # subtrees, but every consumer pair shares an identical child plan,
    # so Catalyst dedupes them via ReusedExchange for free — measured on
    # the 5M-edge power-law bench graph, adding localCheckpoint here
    # (the pagerank pattern) makes the job 2.5x SLOWER (40 s vs 16 s)
    # because the checkpoint write costs more than the reused shuffle.
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = _degrees(e)
    return _triangle_counts_from(e, deg)


def _degrees(e: DataFrame) -> DataFrame:
    """(node, deg) over a normalized (u < v, distinct) edge frame."""
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _triangle_counts_from(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree-oriented wedge enumeration over pre-normalized edges and
    their degree table — shared by triangle_counts and
    clustering_coefficients so the caller pays the edge distinct and the
    degree shuffle exactly once."""
    ed = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("d"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
    )
    # wedges (s; x, y) with x before y in the same (degree, id) order,
    # closed by the oriented edge (x, y)
    w1 = oriented.select(
        F.col("s"), F.col("d").alias("x"), F.col("dd").alias("dx")
    )
    w2 = oriented.select(
        F.col("s"), F.col("d").alias("y"), F.col("dd").alias("dy")
    )
    wedges = w1.join(w2, "s").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("s").alias("x"), F.col("d").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select("s", "x", "y")
    return (
        tri.select(
            F.explode(F.array(F.col("s"), F.col("x"), F.col("y"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def clustering_coefficients(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-vertex local clustering coefficient cc = 2·T / (deg·(deg−1))
    over an undirected graph — the normalized form of
    ``triangle_counts``: how close a vertex's neighborhood is to a
    clique, the per-entity corroboration score for soft related-to
    edges (a high-degree entity with near-zero cc is a hub artifact;
    a moderate-degree one with high cc sits in a real cluster).

    Adds one degree join to the triangle plan; vertices with deg < 2
    get cc = 0.0 by definition, vertices with no triangles get 0.0 via
    the left join. The ratio is emitted rounded to 6 decimals from an
    all-integer numerator/denominator, so cross-engine comparison is
    exact.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = _degrees(e)
    tri = _triangle_counts_from(e, deg)
    joined = deg.join(tri, "node", "left").withColumn(
        "n_triangles", F.coalesce("n_triangles", F.lit(0))
    )
    cc = F.when(
        F.col("deg") >= 2,
        F.round(
            (F.lit(2) * F.col("n_triangles")).cast("double")
            / (F.col("deg") * (F.col("deg") - F.lit(1))).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        cc.alias("clustering_coeff"),
    )


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    walk_length: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    hash_fn=None,
    max_degree: int | None = None,
) -> DataFrame:
    """DeepWalk-style deterministic random walks over the undirected
    graph — the corpus-generation pass for graph-embedding training
    (each walk becomes a 'sentence' of entities for a skip-gram model,
    the node2vec/DeepWalk recipe applied to the co-mention KG).

    DETERMINISTIC by construction (the engine-wide sampling discipline,
    like operators.sampling's hash-identity sampling): the step-i choice
    from node v on walk (start, w) is
    ``neighbors[ hash(start|w|i|v) mod deg(v) ]`` over the SORTED
    neighbor array — partition-invariant, re-runnable, and (with the
    default DuckDB-reproducible ``md5_60bit``) value-oracle-able
    cross-engine. Pass ``hash_fn=F.xxhash64`` for the faster JVM hash
    when oracle parity is not needed.

    Returns (start, walk_idx, step, node): step 0 is the start itself,
    so each (start, walk_idx) group is a (walk_length+1)-token sentence.
    Isolated nodes have no adjacency row and emit nothing.

    Shape: adjacency = one groupBy(node) collect (arrays bounded by
    degree — pass ``max_degree`` on power-law graphs so a super-hub's
    row stays bounded: the cap keeps the ``max_degree`` neighbors with
    the smallest hash(node|nbr), a deterministic unbiased sample, the
    standard DeepWalk degree cap); each of the ``walk_length`` steps is
    ONE node-keyed join against the adjacency (AQE handles hub-degree
    skew) — walks never materialize as driver state and the step joins
    carry only (start, walk_idx, cur), never the path.
    """
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    if max_degree is not None and max_degree < 1:
        raise ValueError(f"max_degree must be >= 1, got {max_degree}")
    if hash_fn is None:
        from .dedup import md5_60bit

        hash_fn = md5_60bit

    both = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("nbr")
    ).unionByName(
        edges.select(F.col(dst_col).alias("node"), F.col(src_col).alias("nbr"))
    ).filter(F.col("node") != F.col("nbr"))
    if max_degree is not None:
        # hub guard: a power-law super-hub would otherwise materialize a
        # degree-sized neighbor ARRAY in one row (100 MB+ at web scale).
        # Keep the max_degree neighbors with the smallest
        # hash(node|nbr) — deterministic, partition-invariant, unbiased
        # by id order; walks through the hub then sample a fixed-size
        # deterministic neighborhood (the standard DeepWalk degree cap).
        # ONE node-keyed shuffle (collect_set with map-side combine) and
        # a map-side array cap — the struct sort on (hash, nbr) is the
        # same total order the previous dropDuplicates + row_number
        # window used, at half the shuffles and no per-partition sort
        # (verified identical adjacency on the 5M-edge anchor; 10.2 s →
        # 4.2 s). The capped array is max_degree-bounded BEFORE it is
        # re-sorted, so hub rows shrink at the earliest possible point.
        hashed = F.transform(
            "_nbrs",
            lambda x: F.struct(
                hash_fn(
                    F.concat_ws(
                        "|", F.col("node").cast("string"), x.cast("string")
                    )
                ).alias("h"),
                x.alias("nbr"),
            ),
        )
        adj = (
            both.groupBy("node")
            .agg(F.collect_set("nbr").alias("_nbrs"))
            .select(
                "node",
                F.array_sort(
                    F.transform(
                        F.slice(F.array_sort(hashed), 1, max_degree),
                        lambda s: s["nbr"],
                    )
                ).alias("nbrs"),
            )
        )
    else:
        adj = (
            both.groupBy("node")
            .agg(F.array_sort(F.collect_set("nbr")).alias("nbrs"))
        )
    # the adjacency feeds the step-0 seed frame and every one of the
    # walk_length step joins — O(walk_length²) references across the
    # final union's branches. Materialize once; blocks are
    # degree-bounded (≤ max_degree per row when capped).
    adj = adj.localCheckpoint(eager=True)

    cur = adj.select(
        F.col("node").alias("start"),
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("walk_idx"),
        F.col("node").alias("node"),
    )
    out = [cur.withColumn("step", F.lit(0))]
    for i in range(1, walk_length + 1):
        seed = F.concat_ws(
            "|",
            F.col("start").cast("string"),
            F.col("walk_idx").cast("string"),
            F.lit(str(i)),
            F.col("node").cast("string"),
        )
        idx = F.pmod(hash_fn(seed), F.size("nbrs"))
        cur = (
            cur.join(adj, "node")
            .select(
                "start",
                "walk_idx",
                F.element_at("nbrs", (idx + F.lit(1)).cast("int")).alias("node"),
            )
        )
        out.append(cur.withColumn("step", F.lit(i)))
    import functools

    return functools.reduce(DataFrame.unionByName, out).select(
        "start", "walk_idx", F.col("step").cast("long").alias("step"), "node"
    )
