"""Driver-side exact folds for the co-purchase graph family.

The graph operators (PageRank, LPA, k-core, degree distribution,
assortativity) are exact-integer algorithms over an edge list derived
from ``lineitem``. At cluster scale the distributed Pregel-shaped loops
in ``queries/analytics.py`` are the only viable plan — but when the
WHOLE graph provably fits the driver, a fleet of distributed rounds
(one join + one aggregate + one lineage cut per round, each a scheduled
job) is pure overhead: the same exact computation runs in milliseconds
as vectorized int64 numpy. This is the established bounded-driver-fold
discipline (``dedup._driver_union_find`` under CC_DRIVER_MAX_EDGES,
``text_textrank_keywords`` under TR_DRIVER_MAX_EDGES): an EXPLICIT
bound decides, the distributed loop stands unchanged above it, and the
fold reproduces the distributed semantics bit-for-bit (integer
recurrences, IEEE-double finals) so the declared results are identical
— proven by differential tests and the DuckDB oracle gate, which runs
the fold path at every verified SF.

Gate: the ``lineitem`` parquet FOOTER row count (metadata-only, the
``_node_dim_hint`` discipline — never Catalyst estimates). At
GRAPH_FOLD_MAX_LI_ROWS = 8M rows the collected projection is
2 x int64 x 8M = 128 MB — the same order as a broadcast build side and
far under ``spark.driver.maxResultSize`` disciplines; basket-bounded
pair expansion is additionally guarded by GRAPH_FOLD_MAX_PAIRS so a
degenerate single-basket input can never blow up the driver (it falls
back to the distributed path instead). At 100 TB lineitem is ~10^11
rows: the gate reads a handful of footers and sends every operator down
its distributed plan.

Numeric discipline: every intermediate is int64 (exact; the operands are
bounded so no sum can overflow below the gate), every division mirrors
the Spark expression (``div`` on non-negative BIGINTs == floor division;
final ratios are single IEEE-double operations in the same order), so
fold == distributed == oracle on any gated input.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

#: driver fold fires at or below this many lineitem rows (parquet footer
#: count). 8M rows -> 128 MB collected; the sf0.1 bench fixture is 600k.
GRAPH_FOLD_MAX_LI_ROWS = 8_000_000

#: defensive bound on the basket pair expansion: TPC-H baskets hold <= 7
#: items so pairs ~ 3.3x li rows, but a degenerate input (one giant
#: basket) is quadratic — past this the fold declines and the
#: distributed path (whose fanout story is its own documented property)
#: takes over.
GRAPH_FOLD_MAX_PAIRS = 64_000_000


def li_rows_within_cap(sf_dir: str) -> bool:
    """Metadata-only gate: lineitem footer row count <= the fold cap.
    Unknown layout -> False (scale-safe: the distributed path runs)."""
    try:
        import pyarrow.parquet as pq

        from mysql_streamer_spark.connectors.python_source import _parquet_files
        from mysql_streamer_spark.tables import table_path

        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _parquet_files(table_path(sf_dir, "lineitem"))
        )
    except Exception:  # noqa: BLE001 - unknown layout -> distributed
        return False
    return n <= GRAPH_FOLD_MAX_LI_ROWS


def _li_arrays(spark: SparkSession, sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(l_orderkey, l_partkey) int64 arrays via the column-pruned
    distributed scan + one Arrow transfer."""
    from mysql_streamer_spark.tables import load_table

    tbl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .toArrow()
    )
    ok = tbl.column("l_orderkey").to_numpy().astype(np.int64, copy=False)
    pk = tbl.column("l_partkey").to_numpy().astype(np.int64, copy=False)
    return ok, pk


def copurchase_edge_arrays(
    spark: SparkSession, sf_dir: str, directed: bool
) -> tuple[np.ndarray, np.ndarray] | None:
    """The DISTINCT co-purchase edge set as numpy arrays — exactly the
    row set of ``_copurchase_edges(spark, sf_dir, directed)``:
    directed -> (src, dst) with both orientations of every u != v pair;
    undirected -> (u, v) with u < v. None when the basket expansion
    would exceed GRAPH_FOLD_MAX_PAIRS (caller falls back)."""
    ok, pk = _li_arrays(spark, sf_dir)
    if len(ok) == 0:
        e = np.empty(0, dtype=np.int64)
        return (e, e.copy())
    # distinct (orderkey, partkey), encoded into one int64. Key values are
    # data (not dense); remap only if the direct encoding could overflow.
    pk_stride = int(pk.max()) + 1
    if int(ok.max()) > (2**62) // pk_stride:
        ok = np.unique(ok, return_inverse=True)[1]
    enc = np.unique(ok * pk_stride + pk)
    ok_e = enc // pk_stride
    pk_e = enc % pk_stride
    # basket group bounds (enc sorted => ok_e sorted)
    starts = np.concatenate([[0], np.nonzero(ok_e[1:] != ok_e[:-1])[0] + 1])
    ends = np.concatenate([starts[1:], [len(ok_e)]])
    sizes = ends - starts
    if int((sizes * (sizes - 1) // 2).sum()) > GRAPH_FOLD_MAX_PAIRS:
        return None
    # all (i < j) index pairs within each basket, fully vectorized:
    # element at global position p (basket end e) pairs with the
    # (e - 1 - p) elements after it.
    pos = np.arange(len(ok_e))
    reps = np.repeat(ends, sizes) - 1 - pos
    a_idx = np.repeat(pos, reps)
    run_starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
    off = np.arange(len(a_idx)) - np.repeat(run_starts, reps) + 1
    b_idx = a_idx + off
    u = pk_e[a_idx]
    v = pk_e[b_idx]
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    ekey = np.unique(lo * pk_stride + hi)
    lo = ekey // pk_stride
    hi = ekey % pk_stride
    if directed:
        return np.concatenate([lo, hi]), np.concatenate([hi, lo])
    return lo, hi


def _dense(*cols: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """(sorted unique node ids, each column remapped to dense indices)."""
    nodes = np.unique(np.concatenate(cols)) if cols else np.empty(0, np.int64)
    return nodes, [np.searchsorted(nodes, c) for c in cols]


# ---------------------------------------------------------------------------
# per-operator folds — each mirrors its distributed loop exactly
# ---------------------------------------------------------------------------


def pagerank_fold(
    spark: SparkSession,
    sf_dir: str,
    *,
    scale: int,
    iters: int,
    top_k: int,
) -> DataFrame | None:
    """Exact mirror of q_analytics_copurchase_pagerank's integer power
    loop: r0 = SCALE div n; r' = (15*base) div 100 + (85*sum(r div deg))
    div 100 over in-edges; top_k by (rank desc, part asc)."""
    if not li_rows_within_cap(sf_dir):
        return None
    arrs = copurchase_edge_arrays(spark, sf_dir, directed=True)
    if arrs is None:
        return None
    src, dst = arrs
    if len(src) == 0:
        return None  # empty graph: exact parity via the distributed path
    nodes, inv = np.unique(src, return_inverse=True)
    deg = np.bincount(inv).astype(np.int64)
    n = len(nodes)
    dst_i = np.searchsorted(nodes, dst)
    base = scale // max(n, 1)
    r = np.full(n, base, dtype=np.int64)
    for _ in range(iters):
        c = r // deg
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, dst_i, c[inv])
        r = (15 * base) // 100 + (85 * sums) // 100
    order = np.lexsort((nodes, -r))[:top_k]
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "part": nodes[order],
            "deg": deg[order],
            "rank_micros": r[order],
            "rank_frac": r[order].astype(np.float64) / float(scale),
        }
    )
    return spark.createDataFrame(
        pdf, schema="part long, deg long, rank_micros long, rank_frac double"
    )


def lpa_fold(
    spark: SparkSession, sf_dir: str, *, rounds: int
) -> DataFrame | None:
    """Exact mirror of q_analytics_community_lpa's synchronous rounds:
    votes = neighbor labels (over directed edges) + self; new label =
    argmax by (count desc, label asc); after ROUNDS rounds emit
    (part, community, n_members)."""
    if not li_rows_within_cap(sf_dir):
        return None
    arrs = copurchase_edge_arrays(spark, sf_dir, directed=True)
    if arrs is None:
        return None
    src, dst = arrs
    if len(src) == 0:
        return None  # empty graph: exact parity via the distributed path
    nodes, inv = np.unique(src, return_inverse=True)
    n = len(nodes)
    dst_i = np.searchsorted(nodes, dst)
    # labels are node ids -> track them as dense indices (order-isomorphic:
    # nodes is sorted, so dense comparisons == id comparisons)
    labels = np.arange(n, dtype=np.int64)
    self_nodes = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        vote_node = np.concatenate([dst_i, self_nodes])
        vote_label = np.concatenate([labels[inv], labels])
        enc = vote_node * n + vote_label
        uniq, cnt = np.unique(enc, return_counts=True)
        g_node = uniq // n
        g_label = uniq % n
        # argmax per node by (cnt desc, label asc); lexsort is stable,
        # last key is primary
        order = np.lexsort((g_label, -cnt, g_node))
        first = np.concatenate([[True], g_node[order][1:] != g_node[order][:-1]])
        sel = order[first]
        # every node self-votes, so g_node[sel] == 0..n-1 in order
        labels = g_label[sel]
    import pandas as pd

    members = np.bincount(labels, minlength=n).astype(np.int64)
    pdf = pd.DataFrame(
        {
            "part": nodes,
            "community": nodes[labels],
            "n_members": members[labels],
        }
    )
    return spark.createDataFrame(
        pdf, schema="part long, community long, n_members long"
    )


def kcore_fold(
    spark: SparkSession, sf_dir: str, *, k: int, max_rounds: int
) -> DataFrame | None:
    """Exact mirror of q_analytics_kcore's peel: live = deg >= K; restrict
    edges to both-live; recompute; fixpoint when the live count stops
    falling; survivors with their within-core degree."""
    if not li_rows_within_cap(sf_dir):
        return None
    arrs = copurchase_edge_arrays(spark, sf_dir, directed=False)
    if arrs is None:
        return None
    u, v = arrs
    if len(u) == 0:
        return None  # empty graph: exact parity via the distributed path
    nodes, (u_i, v_i) = _dense(u, v)
    n = len(nodes)
    deg = np.bincount(np.concatenate([u_i, v_i]), minlength=n).astype(np.int64)
    live_n_prev = -1
    for _ in range(max_rounds):
        live = deg >= k
        live_n = int(live.sum())
        if live_n == live_n_prev or live_n == 0:
            break
        live_n_prev = live_n
        keep = live[u_i] & live[v_i]
        u_i, v_i = u_i[keep], v_i[keep]
        deg = np.bincount(np.concatenate([u_i, v_i]), minlength=n).astype(
            np.int64
        )
    else:
        raise RuntimeError(
            f"k-core peel did not converge within {max_rounds} rounds"
        )
    import pandas as pd

    surv = deg >= k
    pdf = pd.DataFrame({"part": nodes[surv], "core_degree": deg[surv]})
    return spark.createDataFrame(pdf, schema="part long, core_degree long")


def degree_distribution_fold(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """Exact mirror of q_analytics_degree_distribution: log2 buckets by
    integer bit length, per-bucket stats, IEEE shares and node CDF."""
    if not li_rows_within_cap(sf_dir):
        return None
    arrs = copurchase_edge_arrays(spark, sf_dir, directed=False)
    if arrs is None:
        return None
    u, v = arrs
    if len(u) == 0:
        return None  # empty graph: exact parity via the distributed path
    _, (u_i, v_i) = _dense(u, v)
    deg = np.bincount(np.concatenate([u_i, v_i])).astype(np.int64)
    deg = deg[deg > 0]
    # bucket = bit length of d (exact integer log2; no float log)
    uniq_d = np.unique(deg)
    bl = np.array([int(d).bit_length() for d in uniq_d], dtype=np.int64)
    bucket = bl[np.searchsorted(uniq_d, deg)]
    buckets = np.unique(bucket)
    rows = []
    cum = 0
    t_nodes = int(len(deg))
    t_mass = int(deg.sum())
    for b in buckets:
        m = bucket == b
        dn = int(m.sum())
        mass = int(deg[m].sum())
        cum += dn
        rows.append(
            {
                "bucket": int(b),
                "lo_degree": 1 << (int(b) - 1),
                "n_nodes": dn,
                "degree_mass": mass,
                "min_degree": int(deg[m].min()),
                "max_degree": int(deg[m].max()),
                "node_share": float(dn) / float(t_nodes),
                "mass_share": float(mass) / float(t_mass),
                "cum_nodes": cum,
                "node_cdf": float(cum) / float(t_nodes),
            }
        )
    import pandas as pd

    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(
        pdf,
        schema=(
            "bucket long, lo_degree long, n_nodes long, degree_mass long, "
            "min_degree long, max_degree long, node_share double, "
            "mass_share double, cum_nodes long, node_cdf double"
        ),
    )


def assortativity_fold(
    spark: SparkSession, sf_dir: str, *, neutral: float
) -> DataFrame | None:
    """Exact mirror of q_analytics_assortativity: exact int64 moment sums
    over the edge-endpoint degrees, one fixed IEEE expression at the
    end (same operation order as the Spark column expression)."""
    if not li_rows_within_cap(sf_dir):
        return None
    arrs = copurchase_edge_arrays(spark, sf_dir, directed=False)
    if arrs is None:
        return None
    u, v = arrs
    if len(u) == 0:
        return None  # empty graph: exact parity via the distributed path
    _, (u_i, v_i) = _dense(u, v)
    deg = np.bincount(np.concatenate([u_i, v_i])).astype(np.int64)
    du = deg[u_i]
    dv = deg[v_i]
    m_edges = int(len(u))
    s_jk = int((du * dv).sum())
    s_sum = int((du + dv).sum())
    s_sq = int((du * du + dv * dv).sum())
    m = float(m_edges)
    sjk = float(s_jk)
    ssum = float(s_sum)
    ssq = float(s_sq)
    r = (4.0 * m * sjk - ssum * ssum) / (2.0 * m * ssq - ssum * ssum)
    band = (
        "assortative"
        if r > neutral
        else ("disassortative" if r < -neutral else "neutral")
    )
    import pandas as pd

    pdf = pd.DataFrame(
        [
            {
                "m_edges": m_edges,
                "s_jk": s_jk,
                "s_sum": s_sum,
                "s_sq": s_sq,
                "assortativity": r,
                "band": band,
            }
        ]
    )
    return spark.createDataFrame(
        pdf,
        schema=(
            "m_edges long, s_jk long, s_sum long, s_sq long, "
            "assortativity double, band string"
        ),
    )
