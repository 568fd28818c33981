"""Graph-based ANN — the Spark-native analog of the reference's named HNSW
index (/root/reference/SEMANTIC-SEARCH-ROADMAP.md:260-283 lists HNSW as the
index structure; LSH/IVF/SQ in similarity.py are the bucketed substitutes).

HNSW itself is a sequentially-built, pointer-chasing in-RAM structure — a
poor fit for a data-parallel engine. This module keeps the two properties
that matter (a navigable neighbor graph; greedy/beam search over it) and
re-expresses each phase in the engine's strengths:

- BUILD (distributed): candidate pairs from multi-table sign-RP LSH banding
  (the same Arrow-matmul bucketing as dedup), exact cosine on candidates
  only, then per-node top-M neighbors via a partitioned window — every step
  an equi-join/aggregation, O(N) shuffle, never all-pairs.
- SERVE (distributed over QUERIES): the finished graph + normalized vector
  matrix are broadcast — like any in-memory ANN index, the index rides the
  node and the query stream is the parallel axis. Each query runs a
  deterministic best-first beam search (fixed strided entry points, ties by
  id) inside one Arrow batch.

Scale posture: the broadcast index is (N·M ints + N·D floats) — the same
"index fits the serving node" assumption HNSW itself makes. Past that,
shard by IVF cell (similarity.ivf_topk's codebook) and build one graph per
cell; the build and serve shapes here are unchanged per shard.

Determinism: LSH planes are md5-derived (functions.vectors.plane_signs),
window ties break on id, beam ties break on (score, id) — identical output
at any parallelism (pinned by tests/test_graph_ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_knn_graph(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 12,
    n_planes: int = 5,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """(src, dst, cosine): each node's top-``m`` neighbors among its LSH
    candidates, symmetrized before ranking (an edge found once serves both
    endpoints — doubles effective recall for free).

    More tables raise graph recall (a true neighbor missed by every table
    is lost); more planes shrink buckets. Candidate volume ≈ T·N²/2^planes
    — the same dial as the banded dedup."""
    from .dedup import _banded_buckets_arrow

    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    buckets = _banded_buckets_arrow(base, n_planes, n_tables, seed, dim)
    cand = (
        buckets.alias("a").join(buckets.alias("b"), ["tbl", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    paired = cand.join(va, "id_a").join(vb, "id_b")

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array([np.asarray(x, dtype=np.float64) for x in pdf["va"]])
            B = np.array([np.asarray(x, dtype=np.float64) for x in pdf["vb"]])
            c = (A * B).sum(axis=1) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
            yield pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"], "c": c})

    id_type = base.schema["id"].dataType.simpleString()
    scored = paired.mapInPandas(score, f"id_a {id_type}, id_b {id_type}, c double")
    sym = scored.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), F.col("c").alias("cosine")
    ).unionByName(
        scored.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"),
            F.col("c").alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        sym.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= m)
        .select("src", "dst", F.round("cosine", 6).alias("cosine"))
    )


def graph_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 12,
    beam: int = 48,
    n_entries: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    dim: int = 64,
    graph: DataFrame | None = None,
    **build_kw,
) -> DataFrame:
    """(query_id, id, score): top-k per query via beam search over the kNN
    graph. ``queries`` is a DataFrame — the distributed axis; pass ``graph``
    to reuse a prebuilt index (else built here with ``build_kw``).

    Beam search: maintain the ``beam`` best scored nodes; repeatedly expand
    the best unexpanded node's neighbors; stop when the best frontier
    candidate scores below the beam's floor (the standard HNSW layer-0
    termination). Entry points are an id-strided sample — deterministic,
    no stored medoids."""
    import numpy as np

    if graph is None:
        graph = build_knn_graph(emb, id_col, vec_col, m=m, dim=dim, **build_kw)

    id_type = emb.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    out_schema = f"query_id {qid_type}, id {id_type}, score double"

    rows = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).collect()
    if not rows:  # empty corpus: top-k of nothing is nothing
        return emb.sparkSession.createDataFrame([], out_schema)
    rows.sort(key=lambda r: r.id)
    # ids stay raw (long OR string — the index is id-type-agnostic, like
    # build_knn_graph); only the vectors become a dense matrix
    ids = [r.id for r in rows]
    V = np.array([np.asarray(r.v, dtype=np.float64) for r in rows])
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    pos = {i: p for p, i in enumerate(ids)}
    adj: dict = {}
    for r in graph.select("src", "dst").collect():
        adj.setdefault(r.src, []).append(r.dst)
    for v in adj.values():
        v.sort()
    stride = max(len(ids) // max(n_entries, 1), 1)
    entries = ids[::stride][:n_entries]

    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((ids, V, pos, adj, entries))

    def search(batches):
        import heapq

        import pandas as pd

        ids_, V_, pos_, adj_, entries_ = bc.value
        for pdf in batches:
            out_q, out_id, out_s = [], [], []
            for qid, qv in zip(pdf[query_id_col], pdf[query_vec_col]):
                q = np.asarray(qv, dtype=np.float64)
                qn = q / max(np.linalg.norm(q), 1e-300)

                def s(node):
                    return float(V_[pos_[node]] @ qn)

                best: list[tuple[float, int]] = []   # min-heap of (score, id)
                frontier: list[tuple[float, int]] = []  # max-heap via -score
                seen = set()
                for e in entries_:
                    if e in seen:
                        continue
                    seen.add(e)
                    se = s(e)
                    heapq.heappush(frontier, (-se, e))
                    heapq.heappush(best, (se, e))
                while frontier:
                    neg, node = heapq.heappop(frontier)
                    if len(best) >= beam and -neg < best[0][0]:
                        break  # frontier can no longer improve the beam
                    for nb in adj_.get(node, ()):  # noqa: B023
                        if nb in seen:
                            continue
                        seen.add(nb)
                        snb = s(nb)
                        heapq.heappush(frontier, (-snb, nb))
                        heapq.heappush(best, (snb, nb))
                        if len(best) > beam:
                            heapq.heappop(best)
                top = sorted(best, key=lambda t: (-t[0], t[1]))[:k]
                out_q.extend([qid] * len(top))
                out_id.extend(i for _, i in top)
                out_s.extend(round(sc_, 6) for sc_, _ in top)
            yield pd.DataFrame({"query_id": out_q, "id": out_id, "score": out_s})

    return queries.select(query_id_col, query_vec_col).mapInPandas(
        search, out_schema
    )
