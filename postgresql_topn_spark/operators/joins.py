"""Skew-hardened join helpers.

AQE's skew-join handles most hot-key joins automatically (splitting
oversized partitions at runtime), but two cases still want the
explicit salting recipe: (a) a SINGLE key so hot that even a split
partition's build side overflows, and (b) engines/paths where AQE
cannot rewrite (streaming joins, some DSv2 scans). `salted_join` is
that recipe as an operator: the skewed side gets a uniform salt, the
other side is replicated once per salt, and the join key becomes
(key, salt) — the hot key's rows spread over `n_salts` tasks instead
of one straggler.

Cost model (why this is opt-in, not default): the non-skewed side is
multiplied by n_salts on the wire, so use it when
|other| * n_salts << |skewed partition of the hot key|. Result-set
equality with the plain join is pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 0,
) -> DataFrame:
    """Equi-join `skewed` with `other` on column `on`, spreading each
    join key over `n_salts` sub-keys. The salt is `rand(seed)`-derived:
    exact-duplicate hot-key rows still spread uniformly (a row-hash
    salt would send identical rows — the common post-projection log
    shape — to one salt and silently no-op the mitigation). rand is
    per-partition-seeded, so task retries recompute identical salts
    within a job; the JOIN RESULT is salt-independent anyway (every
    salt joins the same replicated other-side row), only the spread
    varies. Supported `how`: inner / left — shapes where the skewed
    side drives the result."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    s = skewed.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = s.join(o, [on, "__salt"], how)
    return out.drop("__salt")
