"""Vector math over ``array<float>`` embedding columns — pure expressions.

Dot products / cosine run in DOUBLE precision over exactly-widened float
inputs so results are bit-comparable with the DuckDB oracle. JVM-side
(`aggregate`/`zip_with`), no UDF, vectorizable by codegen; at 100 TB the
scan prunes to (id, embedding) only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def plane_signs(seed: int, j: int, dim: int) -> list[float]:
    """Hyperplane j's ±1 components, computed driver-side with the SAME
    md5 formula as the expression path (hex digit < '8' → +1)."""
    import hashlib

    return [
        1.0 if hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[0] < "8" else -1.0
        for i in range(dim)
    ]


def lsh_bucket(a: Column, n_planes: int = 8, seed: int = 42,
               dim: int | None = None) -> Column:
    """Sign-random-projection LSH bucket id (deterministic hyperplanes).

    Hyperplane j's component i is ±1 from the first hex digit of
    md5(f'{seed}:{j}:{i}') (digit < '8' → +1) — reproducible across engines
    and cluster sizes, no stored model, and mirrorable in the DuckDB oracle
    (identical md5). Bucket = sum over planes of sign-bit << j. The scale
    path for ANN: group by bucket, search within bucket (candidate set
    ~ N / 2^planes).

    ``dim``: when the embedding dimension is known (it always is in a real
    table), the sign vectors are PRECOMPUTED driver-side and inlined as
    tiny literal arrays — the projection becomes a pure multiply-add fold,
    no per-row/per-element md5. Identical values by construction (same md5
    formula); measured ~5× faster on the multi-table banded dedup. Without
    ``dim`` the md5 runs inside the expression (dimension-agnostic
    fallback).
    """
    bucket = F.lit(0)
    if dim is not None:
        for j in range(n_planes):
            signs = F.array(*[F.lit(s) for s in plane_signs(seed, j, dim)])
            proj = F.aggregate(
                F.zip_with(a, signs, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        return bucket

    def signed_term(j: int):
        prefix = f"{seed}:{j}:"
        return lambda x, i: x.cast("double") * F.when(
            F.substring(F.md5(F.concat(F.lit(prefix), i.cast("string"))), 1, 1).rlike("[0-7]"),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    size = F.size(a)
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(a, F.sequence(F.lit(0), size - 1), signed_term(j)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket
