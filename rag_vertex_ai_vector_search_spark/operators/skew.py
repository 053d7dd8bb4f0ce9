"""Skew-salted equi-join: bound the hottest key's partition.

AQE's skew-join split handles most skew (enabled in session.py), but
it only splits oversized SHUFFLE partitions of a sort-merge join after
the fact; it cannot help when a single join key is so hot that one
task still receives the whole key (AQE splits a partition, not a key's
hash bucket on the build side), or when the plan isn't a shuffle join.
The classic fix, from first principles:

- LEFT (big, skewed) side: add ``_salt = pmod(xxhash64(entire row id
  or a deterministic column), factor)`` -- each hot key's rows spread
  over ``factor`` partitions.
- RIGHT (smaller) side: replicate every row ``factor`` times with
  ``explode(sequence(0, factor-1))`` as its salt.
- Join on (key, _salt): every left row meets exactly ONE copy of each
  matching right row, so the result multiset is provably identical to
  the unsalted join; the hot key's work is now ``factor``-way
  parallel.

Cost model: the right side shuffles ``factor``x its size -- use for a
moderate right side with a catastrophic left hot key (the "all events
from one user", "null foreign key" shape). For a tiny right side just
broadcast; for mild skew let AQE handle it. Deterministic salting
(hash of a left column, not rand()) keeps the operator replayable and
streaming-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    factor: int = 8,
    how: str = "inner",
    salt_src: str | None = None,
) -> DataFrame:
    """Equi-join with the left side's keys salted ``factor`` ways.

    ``salt_src`` names a left column to derive the deterministic salt
    from (default: all join keys + a monotonic partition-local id is
    avoided -- we hash the full set of left columns NOT in the key so
    identical rows stay identical; falls back to ``rand``-free uniform
    spread via xxhash64 of all columns). Supports inner and left joins
    (right/outer would need null-extension per salt copy -- use the
    plain join there).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    keys = [on] if isinstance(on, str) else list(on)
    if salt_src is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(factor))
    else:
        non_key = [c for c in left.columns if c not in keys] or keys
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(factor))
    lhs = left.withColumn("_salt", salt.cast("int"))
    rhs = right.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.lit(factor - 1)).cast("array<int>")
        ).alias("_salt"),
    )
    return lhs.join(rhs, [*keys, "_salt"], how).drop("_salt")
