"""Skew mitigation (SURVEY §4 scale notes).

First line of defense is AQE's skew-join splitting (enabled in
session.py) — it handles skewed *shuffle partitions* transparently.
``salted_join`` is the manual fallback for the case AQE can't fix: a
join key whose single value exceeds what one task can hold (the
classic hot-key fact⋈dim join when the dim side is too big to
broadcast). The fact side scatters each hot key across ``n_salts``
sub-keys; the dim side replicates ``n_salts``× — join cost goes from
one task owning the whole hot key to ``n_salts`` tasks sharing it, at
the price of replicating the (smaller) right side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join resilient to hot keys on ``left``.

    ``left`` rows get a deterministic salt in [0, n_salts) derived from
    ``salt_source`` (default: hash of the whole row's key columns plus a
    spray over xxhash64 of all columns — pass an explicit unique column
    for full determinism); ``right`` is exploded ``n_salts``× so every
    (key, salt) pair finds its match. Semantics identical to
    ``left.join(right, on, how)`` for inner/left joins.
    """
    spray = (
        salt_source
        if salt_source is not None
        else F.xxhash64(*[F.col(c) for c in left.columns])
    )
    l_salted = left.withColumn(_SALT, F.pmod(spray, F.lit(n_salts)).cast("int"))
    r_salted = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, [*on, _SALT], how).drop(_SALT)
