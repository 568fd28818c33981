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


def lsh_bucket(a: Column, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id (deterministic hyperplanes).

    Hyperplane j's component i is ±1 derived from crc32(f'{seed}:{j}:{i}') —
    reproducible across engines and cluster sizes, no stored model. Bucket =
    sum over planes of sign-bit << j. The scale path for ANN: group by
    bucket, search within bucket (candidate set ~ N / 2^planes).
    """
    bucket = F.lit(0)
    size = F.size(a)
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                a,
                F.sequence(F.lit(0), size - 1),
                lambda x, i, j=j: x.cast("double")
                * F.when(
                    F.crc32(F.concat_ws(":", F.lit(str(seed)), F.lit(str(j)), i.cast("string"))) % 2 == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket
