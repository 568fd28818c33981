"""Deterministic BPE tokenizer: count-table training + distributed apply.

The repo's packing/token-count surfaces use the BPE-ish pretoken regex
(`textfns.bpe_ish_tokens`) as their token space; this module adds a REAL
byte-pair-encoding layer on top — learned merges over the pretoken
vocabulary — matching how production pipelines tokenize (GPT-2/HF style:
pretokenize with a regex, then BPE within each pretoken; merges never
cross pretoken boundaries).

Production shape, Spark-first:

- **Training needs no corpus collect and no sample.** Classic BPE trains
  from the (word, count) table alone, and that table is VOCABULARY-sized,
  not corpus-sized: one distributed hash aggregate over the pretokens,
  collect the counts (Zipf: a 100 TB corpus has a few-million-entry
  pretoken vocabulary; cap with ``max_vocab`` top-k for a hard bound),
  then the merge loop runs driver-side over the count dict — exactly what
  single-node HF/SentencePiece training does with a pre-counted corpus.
- **Apply is an Arrow-batched map** (`mapInPandas`) with the merge ranks
  broadcast: a per-batch segmentation cache keyed by pretoken makes the
  Python cost O(distinct pretokens per batch), not O(tokens) — the same
  Zipf skew that keeps the count table small keeps the cache hit rate
  near 1. This is the documented intentional Python stage (like the
  extraction UDF): dense per-string iteration the relational engine
  cannot express.

Determinism: ties in pair frequency break on the lexicographically
smallest pair, so the merge list is a pure function of the count table
(itself a pure function of the corpus — layout/cluster-size independent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from doc_agent_spark.functions.textfns import bpe_ish_tokens


def pretoken_counts(
    docs: DataFrame, text_col: str = "text", max_vocab: int | None = None
) -> DataFrame:
    """(word, c): corpus pretoken frequencies — one hash aggregate. With
    ``max_vocab``, keeps the top-k by (count desc, word asc): a
    deterministic hard bound on the driver-side table
    (TakeOrderedAndProject, never a full sort)."""
    counts = (
        docs.select(F.explode(bpe_ish_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if max_vocab is not None:
        counts = counts.orderBy(F.desc("c"), F.asc("word")).limit(max_vocab)
    return counts


def train_bpe_from_counts(
    counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) table — pure
    Python, deterministic (frequency ties break on the lexicographically
    smallest pair). Returns the ordered merge list; fewer than n_merges
    entries if the table runs out of adjacent pairs."""
    words: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in counts if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + c
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_vocab: int | None = None,
) -> list[tuple[str, str]]:
    """Distributed count + driver-side merge loop (see module docstring).
    The collect is the vocabulary-sized count table, never text."""
    rows = pretoken_counts(docs, text_col, max_vocab).collect()
    return train_bpe_from_counts([(r["word"], r["c"]) for r in rows], n_merges)


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one pretoken: repeatedly merge the lowest-rank
    adjacent pair present (the standard GPT-2 apply loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col: array<string>`` — the BPE token sequence of every
    document (pretoken regex, then learned merges within each pretoken).
    Arrow-batched; the merge ranks ride the closure (broadcast by Spark's
    task serialization — they are tokenizer-sized, not corpus-sized)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    schema = f"{fields}, {out_col} array<string>"
    # pretokens come from the SAME regex as textfns.bpe_ish_tokens (the
    # column expression is the source of truth). re.ASCII is load-bearing:
    # Java's \s is ASCII-only while Python's matches NBSP/U+2028/etc, and
    # a Unicode-space divergence would put train-time counts and
    # apply-time tokens in different token spaces.
    import re

    pretoken_re = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)

    def run(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in pretoken_re.findall(text or ""):
                    seg = cache.get(w)
                    if seg is None:
                        seg = segment_word(w, ranks)
                        cache[w] = seg
                    toks.extend(seg)
                out.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return docs.mapInPandas(run, schema)
