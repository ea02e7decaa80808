"""Mergeable cardinality sketches: HyperLogLog as a first-class COLUMN
shape (Flajolet et al. 2007, public algorithm — the same family behind
Spark's approx_count_distinct, rebuilt here from relational primitives so
the sketch itself is an inspectable, mergeable, ORACLE-CHECKABLE table).

Why not just approx_count_distinct: its HLL++ registers live inside an
opaque JVM aggregation buffer — you cannot store them, merge yesterday's
sketch with today's, or reproduce the estimate in another engine. Here a
sketch IS a (group..., bucket, register) DataFrame:

* build     — ``hll_registers``: one map-side-combined groupBy; the hash
              is the portable 60-bit md5 prefix, so DuckDB/Python rebuild
              bit-identical registers,
* merge     — ``hll_merge``: max(register) per bucket — associative and
              idempotent, so sketches union across days/sources/partitions
              with plain groupBy (the property test pins merge-of-parts ==
              sketch-of-whole EXACTLY),
* estimate  — ``hll_estimate``: the published bias-corrected harmonic mean
              with the small-range linear-counting branch.

Cross-engine determinism (the reason for the scaled-integer trick): the
harmonic sum Σ 2^-register is order-sensitive in floating point (exponent
span > 52 bits), so engines summing in different orders drift ulps apart.
Registers are therefore summed as EXACT BIGINTs scaled by 2^(rmax):
term = 1 << (rmax - register); the single float division at the end is
IEEE-deterministic. Σ terms <= m * 2^rmax < 2^63 for p <= 9 with the
60-bit hash (rmax = 61 - p); larger p still fits because registers >= 1.

100-TB shape: the build is ONE shuffle of (group, bucket) keys with
map-side combine — at most m rows per group survive regardless of input
rows; estimates aggregate m-bounded frames. No driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import seeded_hash

HASH_BITS = 60  # md5-prefix hash width (functions/hashing.py)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _bitlen(w: Column, maxbits: int) -> Column:
    """Position of the highest set bit (bitlen(0) = 0) as a flat when-chain
    of INTEGER comparisons — no float log2, whose 52-bit mantissa goes
    off-by-one near powers of two and breaks engine parity."""
    c = F.when(w >= (1 << (maxbits - 1)), maxbits)
    for k in range(maxbits - 1, 0, -1):
        c = c.when(w >= (1 << (k - 1)), k)
    return c.otherwise(F.lit(0))


def hll_bucket_rho(
    key: Column, p: int, seed: str = "hll"
) -> tuple[Column, Column]:
    """The per-row sketch projection (bucket, rho) as JVM columns — shared
    by the batch build and the streaming cardinality stage (which maxes
    them into keyed register state; hashing stays JVM-side either way)."""
    m = 1 << p
    h = seeded_hash(key.cast("string"), f"{seed}:")
    bucket = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftright(h, p)  # integer, exact — never h/m float division
    rho = (F.lit(HASH_BITS - p) - _bitlen(w, HASH_BITS - p) + 1).cast("int")
    return bucket, rho


def py_hll_estimate(registers, p: int) -> float:
    """Pure-Python replay of ``hll_estimate``'s arithmetic over a DENSE
    register sequence (length 2^p, zeros = empty buckets) — the same
    scaled-integer sum and single float division, so a streaming state
    holding registers emits the IDENTICAL estimate the batch operator
    would. Used by the streaming cardinality stage and the tests."""
    import math

    m = 1 << p
    rmax = HASH_BITS - p + 1
    num = _alpha(m) * m * m * float(1 << rmax)
    total = sum(1 << (rmax - int(r)) for r in registers)
    v = sum(1 for r in registers if int(r) == 0)
    e = num / total
    if e <= 2.5 * m and v > 0:
        return round(m * math.log(m / v), 4)
    return round(e, 4)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    seed: str = "hll",
) -> DataFrame:
    """Build the sketch: (group..., bucket, register), one row per
    NON-EMPTY bucket (empty buckets are implicit register 0 — the estimate
    step reconstructs them from m - count). bucket = low p hash bits,
    register = 1 + leading-zero count of the remaining HASH_BITS - p bits
    (rho in the published algorithm), maxed per bucket."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_registers: p={p} outside [4, 16]")
    groups = list(group_cols or [])
    bucket, rho = hll_bucket_rho(F.col(key_col), p, seed)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*groups, bucket.alias("bucket"), rho.alias("register"))
        .groupBy(*groups, "bucket")
        .agg(F.max("register").alias("register"))
    )


def hll_merge(
    registers: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union sketches: max register per (new grouping, bucket). With
    ``group_cols=[]`` this collapses everything into one corpus-wide
    sketch. Exact property (pinned by test): merging per-part sketches
    equals the sketch built over the whole — max is associative."""
    groups = list(group_cols or [])
    return registers.groupBy(*groups, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 12,
    est_col: str = "hll_est",
) -> DataFrame:
    """Estimate per group from a register table: bias-corrected harmonic
    mean, switching to linear counting (m * ln(m / empty_buckets)) in the
    published small range E <= 2.5m. The harmonic denominator is summed as
    exact scaled BIGINTs (see module doc) so the value is identical in any
    engine; the result is rounded to 4 decimals."""
    groups = list(group_cols or [])
    m = 1 << p
    rmax = HASH_BITS - p + 1
    # alpha * m^2 * 2^rmax as ONE python double literal shared with the
    # DuckDB mirror — both engines then perform the same single division
    num = _alpha(m) * m * m * float(1 << rmax)
    # SQL expr: the Python shiftleft() wrapper only takes a literal int
    # for numBits; the SQL function accepts any integer expression
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - register)")
    agg = registers.groupBy(*groups).agg(
        F.sum(scaled).alias("_s"),
        F.count("*").alias("_nb"),
    )
    v = F.lit(m) - F.col("_nb")  # empty buckets
    # coalesce: a GLOBAL agg over an empty register table yields one row
    # with _s NULL / _nb 0 — all-empty registers must estimate 0.0
    # (linear counting with v=m gives m*ln(1)), not NULL
    total = F.coalesce(F.col("_s"), F.lit(0)) + v.cast("long") * F.lit(
        1 << rmax
    ).cast("long")
    e = F.lit(num) / total.cast("double")
    est = F.when(
        (e <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e)
    return agg.select(*groups, F.round(est, 4).alias(est_col))


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    seed: str = "hll",
    est_col: str = "hll_est",
) -> DataFrame:
    """Build + estimate in one call: approximate count-distinct of
    ``key_col`` per group, reproducible in any engine."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, p=p, seed=seed),
        group_cols,
        p=p,
        est_col=est_col,
    )
