"""Deterministic embedding provider — the no-model stand-in for the
reference's EmbeddingProvider interface (`embed(texts) -> number[][]`,
/root/reference/SEMANTIC-SEARCH-ROADMAP.md:55-63; providers are Ollama/
OpenAI/Gemini — none runs in this data plane, same policy as the
multimodal FakeCodec).

Component i of a text's vector is an md5-derived uniform in [-0.5, 0.5):

    emb[i] = int(md5(text ':' i)[0:8], 16) / 2^32 - 0.5

md5 hex is engine-identical, hex→int is exact, and dividing by 2^32 is
EXACT in float64 — so the vectors are bit-identical between Spark and the
DuckDB oracle (no rounding games needed). A real provider slots in as an
Arrow-batched pandas UDF with the same (id, embedding) output schema; the
Spark plumbing (pure projection, no shuffle, array<double> column) is the
production shape either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Embedding-space identity (SEMANTIC-SEARCH-ROADMAP.md:349 "Embeddings
# versioning - Handle embedding model updates"): every index artifact built
# from these vectors is stamped with this string (jobs/index.py config);
# consumers (jobs/incremental.py) refuse a stamped index whose version
# differs from the running embedder — mixing vectors from two embedding
# spaces silently breaks every cosine. Bump on ANY change to the formula
# below or to a provider's salting scheme.
EMBEDDER_VERSION = "fake-md5-v1"


def fake_embedding(text: Column, dim: int = 16,
                   provider: str = "") -> Column:
    """``provider`` salts the hash (md5(provider '|' text ':' i)) so each
    named provider yields a DIFFERENT deterministic embedding space — the
    `doc eval --compare ollama,openai,gemini` axis. The default ''
    keeps the original formula bit-for-bit (every existing oracle arm
    depends on that)."""
    salted = F.concat(F.lit(provider + "|"), text) if provider else text
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.concat(salted, F.lit(":"), i.cast("string"))), 1, 8),
            16, 10,
        ).cast("long").cast("double") / F.lit(float(2 ** 32)) - 0.5,
    )


def embed(df: DataFrame, id_col: str, text_col: str, dim: int = 16,
          provider: str = "") -> DataFrame:
    """(id, embedding array<double>) — one vector per row, zero shuffle."""
    return df.select(
        F.col(id_col).alias("id"),
        fake_embedding(F.col(text_col), dim, provider).alias("embedding"),
    )


def embedding_sql(text_expr: str, dim: int = 16) -> str:
    """DuckDB mirror of :func:`fake_embedding`."""
    return (
        f"list_transform(range(0, {dim}), i -> "
        f"CAST(('0x' || substr(md5({text_expr} || ':' || CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT)"
        f" / {float(2 ** 32)!r} - 0.5)"
    )
