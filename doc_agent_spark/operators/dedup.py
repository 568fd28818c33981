"""Deduplication family for the large-scale training-data pipeline.

All variants are shuffle-conscious:
- exact: one hash-groupBy (partial agg map-side; the md5 key is tiny so the
  shuffle moves ~32 bytes/doc regardless of document size — column pruning
  keeps `text` out of the exchange).
- MinHash + LSH banding: shingle → k minhashes → band buckets → candidate
  pairs via self-join ON (band, signature-slice) — the join key is the band
  hash, so candidate generation never compares all pairs (O(N) shuffle, not
  O(N²) compare).
- SimHash: 16-bit signature from token hashes; near-dups = same signature
  bucket (Hamming-adjacent lookups can OR over bit-flip buckets).
- n-gram Jaccard: exact verification on candidate pairs only.

MinHash hashes each shingle ONCE (md5 prefix as a 60-bit integer) and takes
k affine-permutation minima as relational min-aggregates — deterministic,
engine-portable (DuckDB computes the identical value), no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from ..functions.textfns import lines_of, word_ngrams, words_of


def exact_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_md5, keep_id, dup_count).

    keep_id = min(id) — the canonical survivor; dup_count > 1 rows are the
    duplicate clusters.
    """
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def line_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Cross-document duplicated lines (the C4/CCNet boilerplate signal):
    ``(line_md5, keep_id, dup_count)`` for every normalized line that occurs
    in more than one document; ``dup_count`` is the DOCUMENT frequency
    (per-doc repeats collapse via array_distinct before the explode) and
    ``keep_id`` the smallest containing doc id.

    Scale shape mirrors :func:`exact_dups` one level down: lines are
    md5-hashed in the projection, so the explode+groupBy shuffles ~32-byte
    keys, never line text; partial aggregation absorbs the head of the
    Zipfian line-frequency skew map-side.
    """
    per_doc = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(lines_of(F.col(text_col)))).alias("line"),
    )
    return (
        per_doc.select("id", F.md5("line").alias("line_md5"))
        .groupBy("line_md5")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """The boilerplate line set: ``(line_md5)`` for every normalized line
    whose document frequency is ≥ ``min_docs``. Materialize this ONCE per
    corpus (it's a deterministic corpus statistic — jobs/curate.py persists
    it as a checkpoint artifact) and reuse it across shards/resumes; at web
    scale the ≥k-docs head is small relative to the corpus."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(lines_of(F.col(text_col)))).alias("line"),
        )
        .select("id", F.md5("line").alias("line_md5"))
        .groupBy("line_md5")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .filter(F.col("df_count") >= min_docs)
        .select("line_md5")
    )


def strip_duplicated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    boiler: DataFrame | None = None,
) -> DataFrame:
    """Inter-document boilerplate removal: drop every line whose document
    frequency is ≥ ``min_docs`` and reassemble the survivors in original
    order. Returns ``(id_col, text_clean, n_lines_kept, n_lines_removed)``;
    documents with no lines (or all lines removed) keep an empty
    ``text_clean``.

    Shape: posexplode (id, pos, line), left-anti equi-join on the line md5
    against the ≥min_docs line set (AQE broadcasts it when small — at web
    scale the boilerplate head is exactly the part that stays small relative
    to the corpus), then a window-free reassembly: groupBy id, sort the
    (pos, line) structs in the aggregated array, concat. Line text rides
    exactly two narrow stages (explode and reassembly) and never a wide key.

    Pass ``boiler`` (a ``(line_md5)`` frame from :func:`boilerplate_lines`,
    possibly persisted) to apply a precomputed line set — the two-stage
    shape the resumable curation job uses; by default the set is derived
    from ``df`` itself.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(lines_of(F.col(text_col))).alias("pos", "line"),
    ).withColumn("line_md5", F.md5("line"))
    if boiler is None:
        boiler = boilerplate_lines(df, id_col, text_col, min_docs)
    kept = lines.join(boiler.select("line_md5"), "line_md5", "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.size(lines_of(F.col(text_col))).alias("_n_lines"),
        )
        .join(reassembled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.col("_n_lines") - F.coalesce("n_lines_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )


_MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne prime)


def _check_minhash_params(k: int, bands: int) -> None:
    """bands must evenly tile the k signatures: bands > k makes every
    band's bucket md5('') for EVERY doc (an all-docs candidate clique —
    the O(N²) trap); k % bands != 0 silently drops the trailing
    signatures. Both are caller bugs — fail fast."""
    if bands < 1 or bands > k or k % bands != 0:
        raise ValueError(
            f"bands must satisfy 1 <= bands <= k and k % bands == 0, "
            f"got k={k}, bands={bands}"
        )


def minhash_perm_consts(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_p, b_p) for the k affine permutations — fixed
    constants, no RNG state, identical in the DuckDB oracle."""
    return [(1000003 + 7919 * p, 12345 + 104729 * p) for p in range(k)]


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """``(id, band, bucket)`` MinHash band buckets — the persistable LSH
    index side. Batch pair generation self-joins this table
    (:func:`minhash_lsh_pairs`); the streaming near-dup path
    (streaming/pipeline.py near_dup_stream) joins a live stream against a
    persisted snapshot of it. Signature computation is the relational
    one-hash + k affine permutations scheme described in
    :func:`minhash_lsh_pairs`."""
    _check_minhash_params(k, bands)
    rows = k // bands
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), 3)).alias("s"),
    )
    h = ex.select(
        "id",
        (F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long")
         % F.lit(_MINHASH_PRIME)).alias("h"),
    )
    sig = h.groupBy("id").agg(*[
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MINHASH_PRIME)).alias(f"s{p}")
        for p, (a, b) in enumerate(minhash_perm_consts(k))
    ])
    return sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bd).alias("band"),
                    F.md5(F.concat_ws("|", *[
                        F.col(f"s{bd * rows + r}").cast("string") for r in range(rows)
                    ])).alias("bucket"),
                )
                for bd in range(bands)
            ])
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_band_structs(text: Column, k: int = 8, bands: int = 4) -> Column:
    """Per-ROW band buckets: ``array<struct<band int, bucket string>>``,
    bucket-identical to :func:`minhash_band_table`.

    This is the STATELESS form for Structured Streaming: the relational
    builder needs an explode + groupBy (a pre-join streaming aggregation —
    stateful, watermark-coupled), while this computes the whole signature
    inside one row via interpreted array folds. That is exactly the shape
    the batch path abandoned for throughput (k folds never enter codegen)
    — the right trade here, because a stream pays it once per ARRIVING doc
    instead of per corpus scan, and it keeps the stream side of the
    near-dup join free of shuffle state. Shingle-less docs return an empty
    array (no bands ⇒ no candidates — the same no-constant-signature rule
    as the batch path)."""
    from ..functions.assembly import let_

    _check_minhash_params(k, bands)
    rows = k // bands

    # shingles and the base hash array are let_-bound: the k permutation
    # folds and the size() guard reference them k+1 times, and unbound
    # references would re-shingle + re-md5 the text once per permutation
    def _with_shingles(shingles: Column) -> Column:
        def _with_h(h: Column) -> Column:
            sigs = [
                F.array_min(
                    F.transform(
                        h,
                        lambda x: (F.lit(a) * x + F.lit(b))
                        % F.lit(_MINHASH_PRIME),
                    )
                )
                for a, b in minhash_perm_consts(k)
            ]
            structs = F.array(*[
                F.struct(
                    F.lit(bd).cast("int").alias("band"),
                    F.md5(F.concat_ws("|", *[
                        sigs[bd * rows + r].cast("string") for r in range(rows)
                    ])).alias("bucket"),
                )
                for bd in range(bands)
            ])
            return F.when(F.size(shingles) > 0, structs).otherwise(
                F.array().cast("array<struct<band:int,bucket:string>>")
            )

        return let_(
            F.transform(
                shingles,
                lambda sh: F.conv(F.substring(F.md5(sh), 1, 15), 16, 10)
                .cast("long") % F.lit(_MINHASH_PRIME),
            ),
            _with_h,
        )

    return let_(word_ngrams(text, 3), _with_shingles)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash LSH banding: (id_a, id_b, n_bands).

    k minhashes split into `bands` bands of k/bands rows; docs sharing any
    band bucket become a candidate pair. Self-join is ON the band bucket
    hash (equi-join → shuffle on tiny keys; AQE handles bucket skew).

    Signature computation is fully relational (the round-2/3 lesson applied
    to its own origin): explode shingles, hash each shingle ONCE with a
    codegen'd md5 projection, and take the k permutation minima as k
    conditional ``min`` aggregates in one map-side-partial groupBy — the
    classic one-hash + k affine permutations scheme (Broder's min-wise
    permutations over h_p(x) = (a_p·x + b_p) mod 2³¹−1, public algorithm).
    The previous form ran k interpreted ``transform``/``array_min`` folds
    with k md5 calls per shingle — never entering codegen and re-hashing
    every shingle 8×. The base hash is the first 15 hex chars of md5 read
    as a 60-bit integer (``conv(.., 16, 10)``) so the DuckDB oracle computes
    the identical value via ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``.

    Documents with no shingles emit NO candidates: empty/near-empty text is
    exact-dedup territory, and the old constant-signature fallback made all
    empty documents one mutual candidate clique — O(E²) pairs, a genuine
    quadratic trap at corpus scale.
    """
    banded = minhash_band_table(df, id_col=id_col, text_col=text_col, k=k, bands=bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bucket"], how="inner")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def simhash_bits(text: Column, bits: int = 16) -> Column:
    """``bits``-wide SimHash over word tokens (bits ≤ 32: one md5 hex digit
    per bit position).

    Bit b's vote for a token is the high bit of hex nibble b of md5(token)
    (i.e. hex digit in [89a-f] → +1 else −1); signature bit b is 1 when the
    vote sum is >= 0. md5 hex digests are identical across engines, so the
    DuckDB oracle reproduces this bit-for-bit. Lower bits are width-stable:
    a 32-bit signature's low 16 bits ARE the 16-bit signature.

    Width is the bucket-count dial: exact-signature clustering needs the
    2^bits space to dwarf the corpus (16 bits saturates by ~10^5 docs —
    size up to 32 at corpus scale, where expected random collisions per
    pair drop below 10^-9·N²/2^32).
    """
    if not 1 <= bits <= 32:
        raise ValueError("simhash width must be 1..32 (md5 has 32 hex digits)")
    # ONE md5 per token, ONE pass over the token array. The round-2 shape
    # (one interpreted fold per bit, each re-hashing every token) cost
    # bits × passes × md5 — 22 s at sf0.1; this folds a bits-wide vote
    # counter array in a single aggregate over pre-hashed digests and
    # derives the signature in the aggregate's finish lambda (evaluated
    # once — re-referencing the counters outside the fold would re-run
    # the whole aggregate per reference, higher-order funcs never CSE).
    digests = F.transform(words_of(text), F.md5)

    def merge(acc, d):
        return F.transform(
            acc,
            lambda c, i: c
            + F.when(F.substr(d, i + 1, F.lit(1)).rlike("[89a-f]"), F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    def finish(acc):
        return F.aggregate(
            F.transform(
                acc,
                lambda c, i: F.when(
                    c >= 0, F.pow(F.lit(2.0), i).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    return F.aggregate(digests, F.array_repeat(F.lit(0), bits), merge, finish)


def simhash16(text: Column) -> Column:
    """16-bit SimHash (see :func:`simhash_bits`), kept 32-bit-int typed for
    the existing oracle entries."""
    return simhash_bits(text, 16).cast("int")


def simhash_sigs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(id, sig) — the RELATIONAL SimHash formulation: explode tokens, hash
    each ONCE in a codegen'd projection, then ``bits`` conditional sums in
    one hash aggregate.

    Identical values to :func:`simhash_bits` (same vote formula), but the
    whole pipeline stays inside whole-stage codegen: the column-expression
    form folds interpreted higher-order lambdas per row (measured ~20 s at
    sf0.1), while here the token mass is collapsed by map-side partial
    aggregation — only (id, 16 ints) per id crosses the exchange, the
    100 TB shape. ``explode_outer`` keeps zero-token docs (null digest
    votes 0, so their signature is all-ones like the fold's empty case).
    """
    ex = df.select(
        F.col(id_col).alias("id"), F.explode_outer(words_of(F.col(text_col))).alias("t")
    ).select("id", F.md5("t").alias("d"))
    # hex digit ∈ [89a-f] ⟺ char >= '8' (md5 hex is lowercase [0-9a-f]):
    # a plain string compare, no per-row regex machinery
    aggs = [
        F.sum(
            F.when(F.col("d").isNull(), F.lit(0))
            .when(F.substring("d", b + 1, 1) >= "8", F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    votes = ex.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"_v{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select("id", sig.cast("int").alias("sig"))


def simhash_clusters_from_sigs(s: DataFrame) -> DataFrame:
    """Exact-signature SimHash buckets with >1 member, from a PRECOMPUTED
    (id, sig) frame — the single home of the cluster rule (count + min-id
    keeper + >1 filter), shared by :func:`simhash_clusters` and callers
    that reuse one signature pass for clustering AND near-pair mining."""
    return (
        s.withColumnRenamed("sig", "simhash")
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_clusters(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-signature SimHash buckets with >1 member."""
    return simhash_clusters_from_sigs(simhash_sigs(df, id_col, text_col))


def verify_pairs_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.8,
    checkpoint_pairs: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard on an ALREADY-GENERATED candidate pair set —
    the verify half of the generate-then-verify dedup pattern (pairs from
    MinHash banding / SimHash flips / embedding LSH). Pass
    ``checkpoint_pairs=False`` when the caller already materialized the
    pair list (e.g. via its own eager localCheckpoint) — re-checkpointing
    an already-cut DAG pays a full task-launch round-trip for nothing.

    Because candidates are a vanishing fraction of N², the verify is two
    equi-joins of the pair list against per-doc shingle arrays plus an
    array_intersect per pair — no inverted-index self-join at all.

    Scale shape: docs are LEFT-SEMI pruned to pair PARTICIPANTS before any
    shingling — candidates are a vanishing fraction of the corpus, so at
    100 TB this turns "shingle everything twice" into "shingle only the
    docs some candidate names" (the round-2 version shingled the whole
    corpus and shuffled the full shingle mass into the pair join).
    """
    # the pair list branches three ways (two participant projections + the
    # verify join); without materialization Spark re-runs the candidate
    # GENERATOR's whole DAG per branch (measured 3× the banding cost).
    # Candidates are the small side by construction — checkpoint them.
    pairs = pairs.select("id_a", "id_b")
    if checkpoint_pairs:
        pairs = pairs.localCheckpoint(eager=True)
    participants = (
        pairs.select(F.col("id_a").alias("_vid"))
        .unionByName(pairs.select(F.col("id_b").alias("_vid")))
        .distinct()
    )
    sh = (
        df.join(participants, F.col(id_col) == F.col("_vid"), "left_semi")
        .select(
            F.col(id_col).alias("_vid"), word_ngrams(F.col(text_col), ngram).alias("_sh")
        )
    )
    a = sh.select(F.col("_vid").alias("id_a"), F.col("_sh").alias("sha"))
    b = sh.select(F.col("_vid").alias("id_b"), F.col("_sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    # a candidate pair of shingle-less docs (< ngram tokens each) has a
    # 0/0 union — ANSI Spark would abort the job; NULL jaccard drops the
    # pair at the filter, exactly DuckDB's x/0 → NULL behavior
    denom = (F.size("sha") + F.size("shb") - inter).cast("double")
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.when(
                denom > 0, F.round(inter.cast("double") / denom, 6)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash pairs within Hamming distance 1 — the Hamming-adjacent
    lookup the exact-bucket variant (``simhash_clusters``) can't see.

    Bit-flip bucketing: each doc emits its 16-bit signature plus all 16
    one-bit flips (17 variants); a pair at distance ≤ 1 ALWAYS has one
    side's variant equal to the other side's core signature, so an
    equi-join variants⋈cores finds exactly the distance-≤1 pairs with no
    all-pairs compare — candidate volume is 17N rows into a hash join, the
    100 TB-safe shape (generalizes to distance d via flips of ≤d bits).
    Output: (id_a, id_b, hamming).
    """
    # the signature frame feeds BOTH the variant explosion and the core
    # side of the join — materialize it once (N tiny rows; the cluster
    # analog is persisting the signature table before the bucket join)
    s = simhash_sigs(df, id_col, text_col).localCheckpoint(eager=True)
    return simhash_near_pairs_from_sigs(s)


def simhash_near_pairs_from_sigs(s: DataFrame) -> DataFrame:
    """Hamming-≤1 pairs from a PRECOMPUTED (id, sig) frame — lets callers
    that also need exact-signature clustering share one signature pass."""
    variants = s.select(
        "id",
        "sig",
        F.explode(
            F.array(F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << b)) for b in range(16)])
        ).alias("var"),
    )
    core = s.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        variants.join(core, (F.col("var") == F.col("sig_b")) & (F.col("id") < F.col("id_b")))
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            F.bit_count(F.col("sig").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .distinct()
    )


def simhash_near_sig_adjacency(s: DataFrame, bits: int = 16) -> DataFrame:
    """Hamming-1 adjacency between DISTINCT signature VALUES with group
    multiplicities: (sig_a, sig_b, n_a, n_b, n_pairs).

    The scale-safe formulation of near-pair detection (r5, found by the
    sf1.0 gate): doc-level pair emission is quadratic in collision-group
    size — a 55k-doc corpus collapsed to 4.9k distinct 16-bit sigs with a
    2,068-doc top group, so id-level Hamming-≤1 pairs exceed 10^7 rows and
    grow ~N² with the corpus. Grouping FIRST bounds the output by the
    signature space (≤ 2^bits · bits / 2 rows) regardless of corpus size;
    doc-pair mass is n_a·n_b, membership resolves through the exact-
    signature cluster table (simhash_clusters_from_sigs). The id-level
    function above remains the targeted-lookup tool for post-blocking
    verification on small candidate sets."""
    g = s.groupBy("sig").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(
        F.col("sig").alias("sig_a"), F.col("n").alias("n_a"),
        F.explode(F.array(*[F.lit(1 << b) for b in range(bits)])).alias("m"),
    ).withColumn("sig_b", F.col("sig_a").bitwiseXOR(F.col("m"))).filter(
        F.col("sig_a") < F.col("sig_b")
    )
    b = g.select(F.col("sig").alias("sig_b"), F.col("n").alias("n_b"))
    return a.join(b, "sig_b").select(
        "sig_a", "sig_b", "n_a", "n_b",
        (F.col("n_a") * F.col("n_b")).alias("n_pairs"),
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine).

    Blocking: MULTI-TABLE sign-random-projection LSH (banding). Each of
    ``n_tables`` tables hashes with ``n_planes`` deterministic hyperplanes
    (table t's seed = seed+t); candidate pairs share a bucket in ANY table,
    deduped before exact-cosine verification.

    Scale posture (the round-1 defaults were the demo posture): high
    ``n_planes`` keeps buckets task-sized — candidates ≈ T·N²/2^planes —
    while multiple tables restore recall: a pair with per-plane agreement p
    survives with 1-(1-p^planes)^tables. The bucket self-join shuffles only
    (id, tbl, bucket) — vectors rejoin by id AFTER the distinct candidate
    set, so the wide embedding column never rides the candidate explosion.
    """
    from ..functions.vectors import cosine, lsh_bucket

    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if dim is not None:
        buckets = _banded_buckets_arrow(base, n_planes, n_tables, seed, dim)
    else:
        buckets = base.select(
            "id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("v"), n_planes=n_planes, seed=seed + t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ])
            ).alias("tb"),
        ).select("id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    cand = (
        buckets.alias("a").join(buckets.alias("b"), ["tbl", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    paired = cand.join(va, "id_a").join(vb, "id_b")
    if dim is not None:
        # exact-verify is dense math over the candidate mass — vectorize it.
        # numpy computes the UNROUNDED cosine (1e-16-level rounding drift vs
        # the sequential fold); the decimal-6 round stays a JVM expression
        # (HALF_UP, matching DuckDB) so parity holds everywhere off the
        # measure-zero rounding knife-edge.
        def score(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                A = np.array([np.asarray(v, dtype=np.float64) for v in pdf["va"]])
                B = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
                c = (A * B).sum(axis=1) / (
                    np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
                )
                yield pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"], "c": c})

        id_type = base.schema["id"].dataType.simpleString()
        scored = paired.mapInPandas(score, f"id_a {id_type}, id_b {id_type}, c double")
        scored = scored.select("id_a", "id_b", F.round("c", 6).alias("cosine"))
    else:
        scored = paired.select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
    return scored.filter(F.col("cosine") >= threshold)


def dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over candidate-dup pairs: (id, cluster_id) with
    cluster_id = min id of the component — the canonical-survivor map that
    turns pairwise dedup output into keep/drop decisions.

    Min-label propagation to fixpoint: each round every node takes the min
    label over itself and its neighbors; converges in O(component diameter)
    rounds (dup clusters are near-cliques from LSH banding, so diameter is
    tiny in practice — the loop exits on the first no-change round, checked
    via a count of changed labels). Each round is one equi-join + one
    partial-aggregated groupBy on id — the same shuffle key every round, so
    AQE reuses the partitioning. At extreme scale swap in the
    large-star/small-star variant; the fixpoint-driver shape stays the same.

    Singleton nodes never appear in ``pairs`` and so are absent from the
    output (they are their own cluster by definition).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (a component with diameter > max_iter — e.g. a long
    chain rather than an LSH near-clique): returning the unconverged labels
    would silently split one duplicate cluster into several and corrupt
    downstream keep/drop decisions. Raise max_iter (rounds are cheap: one
    join + one partial-agg groupBy each) or pre-contract chains with the
    large-star/small-star variant.
    """
    # Materialize the edge list ONCE: ``pairs`` is typically the tail of a
    # heavy candidate-generation DAG (shingle → minhash → band → verify),
    # and every fixpoint round references edges from two actions (the
    # neighbor-min join and the changed-count probe) — without the cut the
    # generator pipeline re-executes O(iterations) times.
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    changed = 1
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        # ONE action per round: the changed-label count rides the eager
        # localCheckpoint job as an observed metric (a label changes iff
        # nlabel < label), instead of a second join-and-count probe —
        # halves the fixpoint's job count, and the checkpoint still cuts
        # the growing lineage before the next round
        obs = Observation()
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("nlabel") < F.col("label"), 1).otherwise(0)),
                    F.lit(0),
                ).alias("changed"),
            )
            .select("id", F.least("label", "nlabel").alias("label"))
        ).localCheckpoint(eager=True)
        changed = obs.get["changed"]
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"dup_clusters did not converge within max_iter={max_iter} rounds: "
            "a component's diameter exceeds the round budget, and unconverged "
            "labels would split one duplicate cluster into several. "
            "Increase max_iter."
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


def _canon_edges(df: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u > v), self-loops dropped, deduped."""
    return (
        df.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def dup_clusters_star(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction — the extreme-scale variant of :func:`dup_clusters`.

    Same contract as ``dup_clusters``: (id, cluster_id) with cluster_id =
    min id of the component, every node appearing in ``pairs`` present,
    singletons absent. The difference is the round bound: min-label
    propagation needs O(component diameter) rounds, which is fine for the
    near-clique components LSH banding emits but degenerates on chain-shaped
    components (a path of n dups takes n rounds). Star contraction converges
    in O(log n) rounds regardless of shape (Kiveris et al., "Connected
    Components in MapReduce and Beyond" — public algorithm):

    - large-star: every node u computes m = min(N(u) ∪ {u}) over its full
      neighborhood and re-points each strictly-larger neighbor v > u at m;
    - small-star: on the canonical (u > v) direction, every node u re-points
      its smaller neighbors (and itself) at m = min(N⁻(u) ∪ {u}).

    Both steps are one equi-join + one partial-aggregated groupBy on the
    same key — identical shuffle shape to the min-label rounds, just fewer
    of them. At fixpoint the edge set IS the answer: a star per component
    with every non-min node pointing directly at the component min.

    Raises ``RuntimeError`` if not converged within ``max_iter`` (with the
    O(log n) bound, 50 rounds covers any feasible component).
    """
    obs0 = Observation()
    edges = _canon_edges(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    ).observe(obs0, F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    n_edges = obs0.get["n"]
    converged = False
    for _ in range(max_iter):
        # large-star over the bidirectional adjacency
        bidir = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m_full = bidir.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = _canon_edges(
            bidir.join(m_full, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star on the canonical direction (v < u by construction);
        # the edge count rides the checkpoint job as an observed metric
        # (one action per round instead of checkpoint + count)
        m_small = large.groupBy("u").agg(F.min("v").alias("m"))
        obs = Observation()
        new_edges = _canon_edges(
            large.join(m_small, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m_small.select("u", F.col("m").alias("v")))
        ).observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
        new_n = obs.get["n"]
        # equal counts + empty one-sided difference ⟹ equal sets (both
        # distinct), so one anti-join probe suffices for the fixpoint test
        if n_edges == new_n and (
            new_edges.join(edges, ["u", "v"], "left_anti").limit(1).count() == 0
        ):
            edges = new_edges
            converged = True
            break
        edges, n_edges = new_edges, new_n
    if not converged:
        raise RuntimeError(
            f"dup_clusters_star did not converge within max_iter={max_iter} "
            "rounds — with the O(log n) star-contraction bound this indicates "
            "a bug or an astronomically large component. Increase max_iter."
        )
    # fixpoint edge set is a star per component: u → component min, plus the
    # min itself (present as some star's v) mapping to itself
    non_min = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    mins = (
        edges.select(F.col("v").alias("id")).distinct()
        .join(non_min.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("cluster_id"))
    )
    labeled = non_min.unionByName(mins)
    # parity with dup_clusters on degenerate input: a node appearing ONLY in
    # self-loop pairs has no canonical edge but is still its own cluster
    orphans = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
        .join(labeled.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("cluster_id"))
    )
    return labeled.unionByName(orphans)


def pick_canonical(clusters: DataFrame, scored: DataFrame,
                   id_col: str = "id", score_col: str = "score") -> DataFrame:
    """Quality-aware canonical selection: for each dup cluster, the kept
    representative is the member with the HIGHEST score, ties to the
    smallest id — (cluster_id, canonical_id, canonical_score).

    Real curation pipelines keep the best member of a near-dup group, not
    an arbitrary one (the min-label cluster id is a graph artifact, not an
    editorial choice); typical scores are document length (keep-longest),
    the quality heuristic, or the LM tier. ``scored`` maps ``id_col`` →
    ``score_col`` for every cluster member; membership rows missing a
    score are dropped (inner join) so partial score tables can't silently
    elect an unscored canonical.

    Scale shape: one equi-join (cluster membership is tiny next to the
    corpus — scores can be semi-join-pruned to members first by the
    caller) and one per-cluster top-1 window, which Spark executes as
    WindowGroupLimit — each task forwards at most one candidate row per
    cluster before the exchange."""
    from pyspark.sql.window import Window

    j = clusters.join(
        scored.select(F.col(id_col).alias("id"), F.col(score_col).alias("_score")),
        "id",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("_score"), F.asc("id"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col("id").alias("canonical_id"),
            F.col("_score").alias("canonical_score"),
        )
    )


def _banded_buckets_arrow(base: DataFrame, n_planes: int, n_tables: int,
                          seed: int, dim: int) -> DataFrame:
    """(id, tbl, bucket) for every table, via one Arrow-batched matmul.

    The T·P sign hyperplanes (md5-derived ±1, functions.vectors.plane_signs
    — the SAME formula the expression path and the DuckDB oracle use) fold
    into one (T·P)×D broadcast matrix; per batch the projections are a
    single V@Sᵀ and buckets come from the sign bits. The pure-expression
    formulation was value-identical but interpreted per element
    (higher-order lambdas never enter codegen): measured ~10 s warm at
    sf0.1 for 8×6 planes vs ~1 s here. Sign parity caveat: numpy's pairwise
    summation rounds differently from the sequential fold, so a projection
    within ~1e-12 of zero could flip a bucket bit; real embedding
    projections are nowhere near that knife-edge, and the sf0.01 oracle
    gate cross-checks the full result against DuckDB's fold.
    """
    import numpy as np

    from ..functions.vectors import plane_signs

    S = np.array(
        [plane_signs(seed + t, j, dim) for t in range(n_tables) for j in range(n_planes)],
        dtype=np.float64,
    )  # (T·P)×D
    bc = base.sparkSession.sparkContext.broadcast(S)
    weights = 1 << np.arange(n_planes)

    def gen(batches):
        import numpy as np
        import pandas as pd

        W = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            bits = (V @ W.T >= 0).astype(np.int64).reshape(len(V), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)
            yield pd.DataFrame({
                "id": np.repeat(pdf["id"].to_numpy(), n_tables),
                "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(V)),
                "bucket": buckets.reshape(-1).astype(np.int32),
            })

    # derive the id field's type from the input so non-long id columns work
    # on this vectorized path exactly like on the expression path
    id_type = base.schema["id"].dataType.simpleString()
    return base.mapInPandas(gen, f"id {id_type}, tbl int, bucket int")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs: (id_a, id_b, jaccard).

    Pairs are generated by exploding shingles and equi-joining on the
    shingle (inverted-index join): |A ∩ B| = co-occurring shingle count,
    |A ∪ B| = |A| + |B| - |A ∩ B|. The shingle join shuffles
    (shingle, id) pairs — linear in corpus shingle mass, never O(N²).
    An optional blocking column bounds the join fan-out.

    ``max_shingle_df``: document-frequency cap. A stop-shingle (a 3-gram in
    nearly every document — boilerplate headers, licence lines) makes that
    shingle's join group quadratic: df docs ⇒ df² candidate rows. With the
    cap, shingles with df > cap are dropped and Jaccard is computed over
    the KEPT shingle sets, so every join group is ≤ cap² — candidate count
    is task-bounded regardless of corpus skew. The hot set is small by
    construction (≤ shingle_mass/cap entries), so it folds to a single
    collect_set row that BROADCASTS into an array_except projection — the
    shingle mass is never re-shuffled to apply the cap.
    """
    has_blk = [F.col(block_col).alias("blk")] if block_col else []
    base = df.select(
        F.col(id_col).alias("id"),
        word_ngrams(F.col(text_col), ngram).alias("sh"),
        *has_blk,
    )
    if max_shingle_df is not None:
        # the shingle frame feeds BOTH the hot-set aggregation and the
        # capped projection — materialize it once instead of shingling the
        # corpus twice (the cluster analog: the inverted index is built
        # once and persisted before the df-cap and self-join read it)
        base = base.localCheckpoint(eager=True)
        hot = (
            base.select(F.explode("sh").alias("s"))
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .agg(F.collect_set("s").alias("hot_set"))  # always exactly 1 row
        )
        base = base.crossJoin(F.broadcast(hot)).select(
            "id",
            F.array_except("sh", "hot_set").alias("sh"),
            *(["blk"] if block_col else []),
        )
    base = base.withColumn("n_sh", F.size("sh"))
    ex = base.select(
        "id", "n_sh", *(["blk"] if block_col else []), F.explode("sh").alias("s")
    )
    a, b = ex.alias("a"), ex.alias("b")
    on = [F.col("a.s") == F.col("b.s"), F.col("a.id") < F.col("b.id")]
    if block_col:
        on.append(F.col("a.blk") == F.col("b.blk"))
    inter = (
        a.join(b, on)
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return inter.select(
        "id_a", "id_b",
        F.round(
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def contamination_pairs(
    df: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination, candidate phase: (doc_id, bench_id,
    containment) for every corpus document sharing ≥ ``threshold`` of a
    benchmark document's n-gram shingles (the GPT-3/PaLM-style train↔eval
    overlap check; reference has no analog — this is a training-data
    pipeline op the engine adds as first class).

    Containment is BENCHMARK-side: |doc ∩ bench| / |bench shingles| — "how
    much of the eval example appears in this training doc", which is the
    decontamination direction (a long doc quoting a whole benchmark item
    must score 1.0 even though its own shingle set is huge; symmetric
    Jaccard would dilute exactly the cases that matter).

    Scale shape: benchmark suites are model-sized (10^4-10^6 items) next
    to a 10^12-row corpus, so the exploded bench shingle index is
    BROADCAST — the corpus shingle mass never shuffles to meet it; the
    only exchange is the partial-aggregated (doc, bench) intersection
    count. Corpus docs sharing no bench shingle never leave their scan
    task."""
    dsh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), ngram)).alias("s"),
    )
    bsh = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        word_ngrams(F.col(bench_text_col), ngram).alias("sh"),
    ).select(
        "bench_id", F.size("sh").alias("n_b"), F.explode("sh").alias("s")
    )
    inter = (
        dsh.join(F.broadcast(bsh), "s")
        .groupBy("doc_id", "bench_id", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return inter.select(
        "doc_id", "bench_id",
        F.round(
            F.col("n_inter").cast("double") / F.col("n_b").cast("double"), 6
        ).alias("containment"),
    ).filter(F.col("containment") >= threshold)


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The corpus minus contaminated documents: left-anti join ``df``
    against the distinct doc side of :func:`contamination_pairs`. The
    anti-join key is the (small) contaminated-id set, so at scale this is
    a broadcast anti-join — one pass over the corpus."""
    hits = contamination_pairs(
        df, bench, id_col, text_col, bench_id_col, bench_text_col,
        ngram, threshold,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return df.join(F.broadcast(hits), id_col, "left_anti")


def semdedup_drops(
    emb: DataFrame,
    threshold: float = 0.95,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup: (drop_id, keep_id, cosine).

    Cluster-then-prune (Abbas et al. 2023, "SemDeDup"): assign every
    embedding to its IVF cell (the shared deterministic codebook —
    similarity.ivf_codebook/ivf_assign), then WITHIN each cell drop every
    document whose cosine to some lower-id cell-mate is ≥ ``threshold``;
    keep_id is the smallest such partner, cosine that pair's score. The
    "similar to ANY lower id" rule is the deterministic, relational form
    of keeping one representative per ε-ball.

    Scale shape: clustering bounds the pairwise work to Σ(cell size)² —
    the codebook dial (stride ≈ N/cells) keeps cells task-sized, exactly
    SemDeDup's own k-means trade. Pairwise cosine runs as one numpy matmul
    per cell (applyInPandas cogroup by cell); only pairs above
    ``threshold - 1e-5`` leave the task (slack so the JVM's HALF_UP
    decimal-6 round — DuckDB-parity, np rounds HALF_EVEN — makes the
    authoritative cut), so the shuffle carries near-dup pairs, never the
    (cell size)² pair mass. At 10^12 rows the assignment is the
    index-build pass (table written partitioned BY cell) and the prune is
    embarrassingly parallel per cell."""
    import numpy as np

    from .similarity import ivf_assign, ivf_codebook_safe

    # _safe: string-keyed / sparse-id corpora (the curate path's 'doc-…'
    # ids) would otherwise NULL-filter the strided sample into an empty
    # codebook and crash the Arrow matmul
    _cents, bc, _stride = ivf_codebook_safe(emb, centroid_stride, id_col, vec_col)
    assigned = ivf_assign(emb, bc, id_col, vec_col)
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    nodes = base.join(assigned, "id")
    id_type = base.schema["id"].dataType.simpleString()
    slack = threshold - 1e-5

    def pairwise(pdf):
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "c": []})
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        V = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"].to_numpy()[order]]
        )
        # dot / (|a|·|b|) like the banded verify path — the closest FP
        # shape to the oracle's sequential fold
        nrm = np.maximum(np.linalg.norm(V, axis=1), 1e-300)
        S = (V @ V.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(n, k=1)  # ids sorted ⇒ id_a < id_b
        hit = S[iu, ju] >= slack
        return pd.DataFrame(
            {"id_a": ids[iu[hit]], "id_b": ids[ju[hit]], "c": S[iu, ju][hit]}
        )

    pairs = nodes.groupBy("cell").applyInPandas(
        pairwise, f"id_a {id_type}, id_b {id_type}, c double"
    )
    hits = pairs.select(
        "id_a", "id_b", F.round("c", 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
    # per dropped doc: the smallest qualifying keeper (struct min orders by
    # id_a first), carrying that pair's cosine
    return (
        hits.groupBy(F.col("id_b").alias("drop_id"))
        .agg(F.min(F.struct("id_a", "cosine")).alias("m"))
        .select(
            "drop_id",
            F.col("m.id_a").alias("keep_id"),
            F.col("m.cosine").alias("cosine"),
        )
    )


def _positioned_shingles(df: DataFrame, k: int, id_col: str,
                         text_col: str) -> DataFrame:
    """(id, pos, sh): every k-token window's 0-based start position and
    16-hex-char md5 prefix (8 bytes of entropy — the shuffle key; raw
    shingle text never leaves the projection). Docs with < k tokens emit
    no rows."""
    ws = words_of(F.col(text_col))
    toks = df.select(F.col(id_col).alias("id"), ws.alias("ws"))
    n = F.size("ws")
    sh_structs = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("pos"),
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(F.col("ws"), i + 1, F.lit(k)))),
                    1, 16,
                ).alias("sh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,sh:string>>"))
    return toks.select("id", F.explode(sh_structs).alias("s")).select(
        "id", "s.pos", "s.sh"
    )


def duplicated_shingles(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus-stat half of exact substring dedup: the (sh) set of
    k-token windows occurring >= min_count times corpus-wide (all
    occurrences counted, same-document repeats included). Persistable —
    jobs/curate.py checkpoints it like the boilerplate line set."""
    return (
        _positioned_shingles(df, k, id_col, text_col)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("sh")
    )


def remove_duplicated_spans(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-SPAN removal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): any k-token window whose
    exact text occurs >= min_count times in the corpus (all occurrences
    counted, same-document repeats included) is removed from every document
    that contains it; the reference paper does this with a corpus suffix
    array — here the same semantics come from a shingle-occurrence count,
    which is the Spark-native formulation (one hash aggregate instead of a
    global suffix sort). Composition of :func:`duplicated_shingles` (the
    persistable corpus statistic) and :func:`strip_duplicated_spans` (the
    apply half)."""
    dup_sh = duplicated_shingles(df, k, min_count, id_col, text_col)
    return strip_duplicated_spans(df, dup_sh, k, id_col, text_col)


def strip_duplicated_spans(
    df: DataFrame,
    dup_sh: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a duplicated-shingle set: returns (id, text_clean,
    n_tokens_removed, n_dup_spans) for documents containing at least one
    duplicated span (untouched docs are absent — merge with a left join +
    coalesce). ``dup_sh`` must come from :func:`duplicated_shingles` with
    the SAME k and tokenizer. text_clean = the surviving tokens (repo
    tokenizer: ``words_of``) joined by single spaces — token-level removal,
    mirroring the paper's "drop the repeated substring".

    Scale: the shingle count behind ``dup_sh`` is the one honest
    O(corpus-tokens) shuffle of exact substring dedup (the suffix-array
    build pays the same sort); shingles shuffle as 16-hex-char md5
    prefixes, never text. The hit list per doc is positions-only; span
    merging and token filtering are per-document array expressions — small
    (doc-sized) interpreted folds, no Python, no extra shuffle beyond the
    per-doc position collect."""
    ws = words_of(F.col(text_col))
    toks = df.select(F.col(id_col).alias("id"), ws.alias("ws"))
    shingles = _positioned_shingles(df, k, id_col, text_col)
    poss = (
        shingles.join(dup_sh.select("sh"), "sh", "left_semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("poss"))
    )
    out = toks.join(poss, "id")
    cov = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(F.col("poss"), lambda p: F.sequence(p, p + k - 1))
            )
        )
    )
    out = out.withColumn("cov", cov)
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 1),
            lambda i: F.when(
                ~F.array_contains(F.col("cov"), i), F.element_at(F.col("ws"), i + 1)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    m = F.greatest(F.size("cov") - 1, F.lit(0))
    gaps = F.zip_with(
        F.slice(F.col("cov"), 2, m), F.slice(F.col("cov"), 1, m),
        lambda a, b: a - b,
    )
    return out.select(
        "id",
        F.concat_ws(" ", kept).alias("text_clean"),
        F.size("cov").cast("long").alias("n_tokens_removed"),
        (F.lit(1) + F.size(F.filter(gaps, lambda d: d > 1)))
        .cast("long")
        .alias("n_dup_spans"),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """C4-style corpus-wide exact PARAGRAPH dedup (Raffel et al. 2020 §2.2
    dedup unit, at paragraph/line granularity): every distinct paragraph
    keeps exactly its globally-first occurrence — min (id, pos) over all
    occurrences, same-document repeats included — and every other occurrence
    is dropped; surviving paragraphs reassemble in original order. The
    reference has no corpus-level text operator at all (one document per
    process, extract.ts:11); this is the set-at-a-time formulation.

    Returns (id, text_clean, n_paras, n_paras_removed) for every document
    with >= 1 non-empty paragraph (paragraph = non-empty trimmed line of
    ``text_col``; fully-deduped documents get text_clean = '').

    Scale shape: paragraphs shuffle once as (md5, id, pos) — the text
    rides only to the keeper join, which is by the same hash key (no
    second shuffle of the paragraph mass). Keeper selection is a map-side-
    combinable min(struct(id,pos)) aggregate, NOT a window: corpus-wide
    boilerplate paragraphs ("Page 1 of 1") are exactly the hot keys where
    a per-key sorted window would straggle. Reassembly is one per-doc
    hash aggregate; per-doc array sorting is doc-sized.
    """
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(lines_of(F.col(text_col))).alias("pos", "para"),
    ).withColumn("h", F.md5("para"))
    keeper = paras.groupBy("h").agg(F.min(F.struct("id", "pos")).alias("keep"))
    kept = paras.join(keeper, "h").filter(
        (F.col("id") == F.col("keep.id")) & (F.col("pos") == F.col("keep.pos"))
    )
    agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_paras_kept"),
    )
    totals = paras.groupBy("id").agg(F.count(F.lit(1)).alias("n_paras"))
    return totals.join(agg, "id", "left").select(
        "id",
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_paras",
        (F.col("n_paras") - F.coalesce("n_paras_kept", F.lit(0))).alias(
            "n_paras_removed"
        ),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS algorithm): hash every k-token shingle, slide a window of
    ``w`` consecutive hashes, select each window's MINIMUM (rightmost
    occurrence on ties). Guarantee: any shared passage of >= w+k-1 tokens
    contributes at least one IDENTICAL selected fingerprint to both
    documents — LOCAL, position-robust overlap detection that whole-doc
    hashing (md5/fingerprint arms) and random-sample sketches (MinHash)
    don't give per passage. Density bound: ~2/(w+1) of the shingle count.

    Returns the distinct selected rows (id, h: bigint, pos: int), pos the
    1-based shingle position of the selected hash.

    Scale shape — deliberately RELATIONAL, not per-doc array algebra: the
    first cut built the hash array per doc and sliced it per window with
    higher-order functions; lambda evaluation re-materialized the array
    per window (interpreted, O(shingles x windows) md5 calls — 148 s for
    500 docs). This formulation hashes each shingle ONCE in codegen,
    explodes it into its <= w covering window ids (a window is kept only
    when all w members arrived, so no length column is needed), and takes
    one (id, window) aggregation where partial combine collapses the w-row
    expansion map-side; min(h) + max_by(pos, (-h, pos)) yields the
    rightmost minimum. Only 8-byte hashes and ids shuffle, never text.
    """
    # POSITIONAL shingles — word_ngrams is distinct-set semantics (built
    # for Jaccard) and is wrong here. The words array is materialized as a
    # projection column FIRST so the transform lambda references a bound
    # attribute; an inline expression would re-evaluate the tokenizer per
    # array element (the interpreted-lambda trap that made the first cut
    # of this operator 150x slower).
    staged = df.select(
        F.col(id_col).alias("id"), words_of(F.col(text_col)).alias("ws")
    )
    n_sh = F.greatest(F.size("ws") - k + 1, F.lit(0))
    sh_arr = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(F.col("ws"), i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = staged.select(
        "id", F.posexplode(sh_arr).alias("pos0", "s")
    ).select(
        "id",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long")
            % F.lit(_MINHASH_PRIME)
        ).alias("h"),
    )
    wexp = sh.select(
        "id", "pos", "h",
        F.explode(
            F.sequence(F.greatest(F.col("pos") - w + 1, F.lit(1)), F.col("pos"))
        ).alias("j"),
    )
    sel = (
        wexp.groupBy("id", "j")
        .agg(
            F.count("*").alias("members"),
            F.min("h").alias("h"),
            F.max_by(
                "pos", F.struct((-F.col("h")).alias("nh"), F.col("pos").alias("p"))
            ).alias("pos"),
        )
        .filter(F.col("members") == w)
    )
    return sel.select("id", "h", F.col("pos").cast("int").alias("pos")).distinct()


def winnow_groups(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 4, w: int = 5) -> DataFrame:
    """Documents grouped by shared winnowing fingerprints: for every
    fingerprint VALUE selected by >= 2 distinct documents, (key = the
    60-bit hash as a string, keep_id = lowest sharing doc, dup_count =
    number of sharing docs). Partial-overlap candidate generation: docs
    sharing a >= w+k-1-token passage are guaranteed to co-occur under at
    least one key."""
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    exploded = fps.select("id", "h").distinct()
    return (
        exploded.groupBy("h")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") >= 2)
        .select(F.col("h").cast("string").alias("key"), "keep_id", "dup_count")
    )
