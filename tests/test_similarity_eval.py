"""IVF ANN, embedding near-dup dedup, retrieval eval, hydration join —
golden tests on small constructed inputs plus parity checks on testdata."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import dedup, search, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _brute_ids(emb, q, k, exclude=None):
    got = similarity.cosine_topk(emb, q, k=k).collect()
    return [r.id for r in got]


def test_ivf_subset_of_brute(emb):
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    ivf = similarity.ivf_topk(emb, q, k=10, centroid_stride=50, nprobe=2).collect()
    assert len(ivf) == 10
    # query itself lives in a probed cell → rank 1 with score 1.0
    assert ivf[0].id == 0 and ivf[0].score == pytest.approx(1.0)
    # scores sorted desc, deterministic tie-break
    scores = [r.score for r in ivf]
    assert scores == sorted(scores, reverse=True)
    # every IVF hit must carry its true cosine (spot parity vs brute list)
    brute = {r.id: r.score for r in similarity.cosine_topk(emb, q, k=500).collect()}
    for r in ivf:
        assert brute[r.id] == pytest.approx(r.score, abs=1e-9)


def test_ivf_nprobe_widens_recall(emb):
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0].embedding)
    ids_1 = {r.id for r in similarity.ivf_topk(emb, q, k=10, nprobe=1).collect()}
    ids_4 = {r.id for r in similarity.ivf_topk(emb, q, k=10, nprobe=4).collect()}
    brute = set(_brute_ids(emb, q, 10))
    assert len(ids_4 & brute) >= len(ids_1 & brute)


def test_embedding_near_dups_self_pairs(spark):
    # two identical vectors + one orthogonal: exactly one pair at cos=1
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = dedup.embedding_near_dups(df, threshold=0.95, n_planes=2).collect()
    assert [(r.id_a, r.id_b, r.cosine) for r in got] == [(1, 2, 1.0)]


def test_embedding_near_dups_blocking_never_false_positives(emb):
    got = dedup.embedding_near_dups(emb, threshold=0.9, n_planes=4).collect()
    for r in got:  # verification step guarantees threshold on every pair
        assert r.cosine >= 0.9 and r.id_a < r.id_b


def test_eval_retrieval_golden(spark):
    retrieved = spark.createDataFrame(
        [(10, 0.9), (11, 0.8), (12, 0.7), (13, 0.6)], "id long, score double"
    )
    relevant = spark.createDataFrame([(11,), (13,), (99,)], "id long")
    row = search.eval_retrieval(retrieved, relevant, k=3).collect()[0]
    # top-3 = [10, 11, 12]; hits = {11} → recall 1/3, precision 1/3, mrr 1/2
    assert row.recall_at_k == pytest.approx(1 / 3, abs=1e-6)
    assert row.precision_at_k == pytest.approx(1 / 3, abs=1e-6)
    assert row.mrr == pytest.approx(0.5, abs=1e-6)


def test_eval_retrieval_no_hits(spark):
    retrieved = spark.createDataFrame([(1, 0.5)], "id long, score double")
    relevant = spark.createDataFrame([(42,)], "id long")
    row = search.eval_retrieval(retrieved, relevant, k=1).collect()[0]
    assert (row.recall_at_k, row.precision_at_k, row.mrr) == (0.0, 0.0, 0.0)


def test_hydrate_broadcast_join(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    results = spark.createDataFrame([(0, 1.0), (3, 0.5)], "id long, score double")
    got = {r.id: r for r in search.hydrate(results, docs, id_col="doc_id").collect()}
    assert set(got) == {0, 3}
    assert len(got[0].snippet) <= 80
    plan = search.hydrate(results, docs, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sq_quantization_error_bounded(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.uniform(-2, 2, 16)]) for i in range(50)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    sq = similarity.sq_quantize(emb, dim=16)
    rows = sq.collect()
    orig = dict(vecs)
    for r in rows:
        deq = [m + c * s / 255.0 for c, m, s in zip(r.codes, r.mins, r.spans)]
        err = max(abs(a - b) for a, b in zip(deq, orig[r.id]))
        span = max(r.spans)
        assert err <= span / 510 + 1e-6  # half a code step per dimension
        assert all(0 <= c <= 255 for c in r.codes)


def test_sq_topk_close_to_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    exact = [r.id for r in similarity.cosine_topk(emb, q, k=10).collect()]
    approx = [r.id for r in similarity.sq_cosine_topk(emb, q, k=10, dim=64).collect()]
    # int8 codes keep at least 8 of the true top-10 (recall@10 >= 0.8)
    assert len(set(exact) & set(approx)) >= 8


def test_pq_codebook_members_reconstruct_exactly(emb):
    """A vector that IS a codeword (vec_id % 50 == 0) quantizes to itself
    in every subspace, so its PQ score equals its exact cosine score."""
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    bc = similarity.pq_codebooks(emb, n_sub=8, codebook_stride=50)
    rec = {
        r.id: (list(r.codes), list(r.dv))
        for r in similarity.pq_reconstruct(emb, bc).collect()
    }
    orig = {r.vec_id: list(r.embedding) for r in emb.collect()}
    members = [i for i in orig if i % 50 == 0]
    assert members
    for i in members:
        codes, dv = rec[i]
        assert codes == [i] * 8, f"member {i} must pick itself per subspace"
        assert dv == pytest.approx(orig[i])
    # non-members carry valid codeword ids
    cids = set(members)
    for i, (codes, _dv) in rec.items():
        assert set(codes) <= cids


def test_bq_pack_matches_driver_mirror(emb):
    """Spark-side bq_quantize and the driver-side pack_sign_bits produce
    identical packed words for every row — the invariant that makes the
    query-vector Hamming prefilter comparable to the corpus signatures."""
    rows = similarity.bq_quantize(emb, dim=64).collect()
    orig = {r.vec_id: list(r.embedding) for r in emb.collect()}
    assert rows
    for r in rows:
        assert list(r.words) == similarity.pack_sign_bits(orig[r.id], dim=64)
        assert len(r.words) == 2  # 64 dims / 32-bit words


def test_bq_topk_exact_rerank(emb):
    """The Hamming prefilter only selects candidates; survivors are scored
    by the exact cosine, so the query itself (Hamming 0) must lead with
    score 1.0 and scores must be non-increasing. With n_candidates covering
    a large slice of sf0.001, recall vs exact stays high."""
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    exact = [r.id for r in similarity.cosine_topk(emb, q, k=10).collect()]
    bq = similarity.bq_cosine_topk(emb, q, k=10, dim=64, n_candidates=50).collect()
    assert bq[0].id == 0 and bq[0].score == pytest.approx(1.0)
    scores = [r.score for r in bq]
    assert scores == sorted(scores, reverse=True)
    # sign-bit Hamming on random uniform vectors: floor recall@10 >= 0.4
    assert len(set(exact) & {r.id for r in bq}) >= 4


def test_pq_topk_close_to_exact(emb):
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    exact = [r.id for r in similarity.cosine_topk(emb, q, k=10).collect()]
    pq = similarity.pq_cosine_topk(emb, q, k=10).collect()
    # query is a codebook member → exact self-match leads
    assert pq[0].id == 0 and pq[0].score == pytest.approx(1.0)
    # 10 codewords/subspace on near-orthogonal data: measured recall@10
    # 0.5-0.6 (sf0.001/sf0.01); floor at 0.4
    assert len(set(exact) & {r.id for r in pq}) >= 4
    scores = [r.score for r in pq]
    assert scores == sorted(scores, reverse=True)


def test_mine_hard_negatives_excludes_positives(spark):
    import math

    # 8 vectors on a ring: neighbors are most similar
    rows = [
        (i, [math.cos(2 * math.pi * i / 8), math.sin(2 * math.pi * i / 8)])
        for i in range(8)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    # label the self-pair and the nearest ring neighbor as positives
    pos = spark.createDataFrame([(0, 0), (0, 1)], "qid long, did long")
    out = similarity.mine_hard_negatives(q, emb, pos, k=3).collect()
    got = [(r.rid, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    # 0 and 1 excluded; 7 is the nearest remaining, then 2, then 6
    assert got == [(7, 1), (2, 2), (6, 3)]
    assert all(r.lid == 0 for r in out)


def test_mine_hard_negatives_empty_positives(spark):
    rows = [(i, [1.0 * i, 1.0]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pos = spark.createDataFrame([], "qid long, did long")
    out = similarity.mine_hard_negatives(
        emb.filter(F.col("vec_id") == 0), emb, pos, k=2
    ).collect()
    assert len(out) == 2   # nothing excluded, top-2 kept (self included)


def test_eval_retrieval_duplicate_judgments_not_double_counted(spark):
    """Concatenated qrels files repeat judgments — the join must not fan
    out (hits double-counted, precision > 1.0 possible)."""
    retrieved = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "id long, score double")
    rel = spark.createDataFrame([(1,), (1,), (3,)], "id long")
    r = search.eval_retrieval(retrieved, rel, k=3).collect()[0]
    assert r.recall_at_k == 1.0
    assert r.precision_at_k == pytest.approx(2 / 3, abs=1e-6)
    assert r.mrr == 1.0


def test_eval_retrieval_by_query_duplicate_judgments(spark):
    retrieved = spark.createDataFrame(
        [("q1", 1, 0.9), ("q1", 2, 0.8)], "query_id string, id long, score double")
    rel = spark.createDataFrame(
        [("q1", 1), ("q1", 1)], "query_id string, id long")
    r = search.eval_retrieval_by_query(retrieved, rel, k=2).collect()[0]
    assert (r.recall_at_k, r.precision_at_k, r.mrr) == (1.0, 0.5, 1.0)


def test_pq_codebook_rejects_indivisible_dim(spark):
    rows = [(i * 10, [float(j) for j in range(10)]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_codebooks(emb, n_sub=8, codebook_stride=10)


def test_mrl_funnel_scores_are_exact_cosines(emb):
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    got = similarity.mrl_funnel_topk(emb, q, k=10, d_prime=16, shortlist=40).collect()
    assert len(got) == 10
    assert got[0].id == 0 and got[0].score == pytest.approx(1.0)
    brute = {r.id: r.score for r in similarity.cosine_topk(emb, q, k=2000).collect()}
    for r in got:
        assert brute[r.id] == pytest.approx(r.score, abs=1e-9)


def test_mrl_funnel_full_shortlist_equals_brute(emb):
    # shortlist = corpus size degrades to exact search: identical top-k
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0].embedding)
    exact = [(r.id, r.score) for r in similarity.cosine_topk(emb, q, k=10).collect()]
    funnel = [
        (r.id, r.score)
        for r in similarity.mrl_funnel_topk(
            emb, q, k=10, d_prime=16, shortlist=emb.count()
        ).collect()
    ]
    assert funnel == exact


def test_mrl_funnel_recall_reasonable(emb):
    # prefix shortlist keeps most of the true top-10 even on random
    # (non-MRL-trained) vectors at 4x shortlist headroom
    q = list(emb.filter(F.col("vec_id") == 7).collect()[0].embedding)
    brute = set(_brute_ids(emb, q, 10))
    got = {
        r.id
        for r in similarity.mrl_funnel_topk(
            emb, q, k=10, d_prime=16, shortlist=40
        ).collect()
    }
    assert len(got & brute) >= 3


def test_eval_by_category_macro_average(spark):
    """byCategory (roadmap EvalResult.byCategory): macro-average of the
    per-query metrics within each category; unmapped queries roll into
    'uncategorized'."""
    from doc_agent_spark.operators import search

    per_q = spark.createDataFrame(
        [(0, 1.0, 0.5, 1.0), (1, 0.5, 0.25, 0.5),
         (2, 0.0, 0.0, 0.0), (3, 1.0, 1.0, 0.25)],
        "query_id long, recall_at_k double, precision_at_k double, mrr double",
    )
    cats = spark.createDataFrame(
        [(0, "invoices"), (1, "invoices"), (2, "receipts")],
        "query_id long, category string",
    )  # query 3 unmapped
    got = {r["category"]: r for r in
           search.eval_retrieval_by_category(per_q, cats).collect()}
    assert got["invoices"]["recall_at_k"] == 0.75
    assert got["invoices"]["precision_at_k"] == 0.375
    assert got["invoices"]["mrr"] == 0.75
    assert got["invoices"]["n_queries"] == 2
    assert got["receipts"]["recall_at_k"] == 0.0
    assert got["uncategorized"]["mrr"] == 0.25
    assert set(got) == {"invoices", "receipts", "uncategorized"}


def test_bm25_multi_matches_per_query_loop(spark):
    """Batched BM25 (one corpus pass for the whole eval set) must equal
    running bm25_scores per query — including the per-query idf/df being
    the same global statistics, and duplicated query terms not
    double-counting."""
    from doc_agent_spark.operators import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qsets = {0: ["spark", "join"], 1: ["window", "scan", "window"],
             2: ["spark", "vector", "line"]}
    queries = spark.createDataFrame(
        [(qid, terms) for qid, terms in qsets.items()],
        "query_id long, terms array<string>",
    )
    batched = {(r["query_id"], r["id"]): r["score"] for r in
               search.bm25_scores_multi(docs, queries).collect()}
    for qid, terms in qsets.items():
        solo = {r["id"]: r["score"] for r in
                search.bm25_scores(docs, sorted(set(terms))).collect()}
        got = {i: s for (q, i), s in batched.items() if q == qid}
        assert got == solo, qid
