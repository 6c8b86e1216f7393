"""Seeded, weighted, deterministic sampling (F15 analog).

The reference seeds all its sampling from explicit RNG state
(crates/core/src/sampling.rs; the fixed-seed generator discipline in
benchsuite).  At table scale the equivalent contract is HASH-based Poisson
sampling: each row's inclusion is a pure function of (key, seed, weight) —
no RNG state, no ordering dependence, stable under retries, partitioning,
and re-runs, and trivially distributed (a map-side filter, zero shuffle).

Inclusion rule, exact in both engines:

    u   = first 15 hex digits of md5(key || ':' || seed)  (60-bit int)
    keep iff  u mod 1_000_000  <  floor(least(1, fraction * weight) * 1e6)

``weighted_sample_oracle_predicate`` emits the identical DuckDB predicate,
so sampled sets match the SQL oracle row-for-row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _u_col(key, seed: int):
    """60-bit uniform hash of (key, seed) — identical to the SQL oracle."""
    h = F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def seeded_weighted_sample(
    df: DataFrame,
    weight_col: str,
    fraction: float,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Keep each row with probability min(1, fraction * weight) —
    deterministically, as a pure map-side filter."""
    p = F.least(
        F.lit(1.0), F.lit(float(fraction)) * F.col(weight_col).cast("double")
    )
    thresh = F.floor(p * _BUCKETS).cast("long")
    u = _u_col(F.col(key_col), seed)
    return df.where((u % _BUCKETS) < thresh)


def weighted_sample_oracle_predicate(
    weight_col: str, fraction: float, key_col: str, seed: int = 42
) -> str:
    """DuckDB WHERE-clause replicating ``seeded_weighted_sample``."""
    return (
        f"(CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':{seed}'),"
        f" 1, 15) AS BIGINT) % {_BUCKETS}) < "
        f"CAST(floor(least(1.0, {float(fraction)!r} * "
        f"CAST({weight_col} AS DOUBLE)) * {_BUCKETS}) AS BIGINT)"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep each row of stratum s with
    probability fractions[s] (default_fraction for unlisted strata), as a
    pure map-side filter — the stored-data half of EDBT'19 'Stratified
    Random Sampling over Streaming and Stored Data', with the RNG replaced
    by the same hash discipline as ``seeded_weighted_sample`` so the
    sampled set is retry/partitioning-stable and SQL-replicable.

    The classic use at 100 TB: rebalancing a curated corpus (e.g. cap the
    dominant language at 10%, keep 100% of a rare one) without a shuffle —
    per-stratum counts need no pre-pass because inclusion is per-row."""
    frac = F.lit(float(default_fraction))
    for s, f_ in fractions.items():
        frac = F.when(F.col(strata_col) == s, F.lit(float(f_))).otherwise(frac)
    thresh = F.floor(
        F.least(F.lit(1.0), frac) * _BUCKETS
    ).cast("long")
    u = _u_col(F.col(key_col), seed)
    return df.where((u % _BUCKETS) < thresh)


def stratified_sample_oracle_predicate(
    strata_col: str, fractions: dict, key_col: str, seed: int = 42,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE-clause replicating ``stratified_sample``."""
    cases = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {float(f_)!r}"
        for s, f_ in fractions.items()
    )
    frac = f"(CASE {cases} ELSE {float(default_fraction)!r} END)"
    return (
        f"(CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':{seed}'),"
        f" 1, 15) AS BIGINT) % {_BUCKETS}) < "
        f"CAST(floor(least(1.0, {frac}) * {_BUCKETS}) AS BIGINT)"
    )
