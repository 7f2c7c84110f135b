"""Skew-handling join: explicit key salting.

AQE's skew-join split (on by default in ``session.build_session``)
handles most hot keys by splitting oversized shuffle partitions. The
explicit salt is for the cases AQE can't fix: a single key so hot
that even one partition of it blows an executor, or a non-shuffle
strategy (e.g. bucketed co-location) that AQE won't repartition.

Pattern: fact rows of a hot key scatter across SALT sub-keys
(deterministically, from a hash over the whole row so identical keys
still spread); the dim side replicates each row SALT times. The join
key becomes (key, salt), so the hot key's rows land on SALT
partitions instead of one. Cost: dim side × SALT — use it on small-
to-medium dims where broadcast is just out of reach, never on a
second fact table (that path is the two-phase aggregate, see
``events_sessionize_twophase``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``fact.fact_key == dim.dim_key`` with SALT-way key
    scattering. Result is row-identical to the plain join (inner /
    left semantics preserved; fully-duplicate fact rows share a salt,
    which is correct, just unspread)."""
    salted_fact = fact.withColumn(
        _SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    salted_dim = dim.withColumn(
        _SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact[_SALT_COL] == salted_dim[_SALT_COL]),
        how,
    )
    return out.drop(_SALT_COL)
