"""Count-min sketch as a relational composition — a mergeable frequency
sketch with NO custom aggregation code.

The sketch is a d×w integer matrix: token t increments cell
(s, h_s(t) mod w) for each of d hash rows. Expressed relationally the
matrix is just `groupBy(seed, bucket).count()` over the token stream
exploded ×d — and Spark's map-side partial aggregation IS the sketch
merge: every task builds its local d×w matrix and the shuffle adds
them cell-wise. At 100 TB the shuffle moves only tasks × d×w cells,
never the token stream.

Estimates are `min` over the d cells a key hashes to — the classic CMS
guarantee (never under-estimates; over-estimates bounded by collisions).

Determinism: h_s(t) = first 8 hex chars of md5(seed || ':' || token) —
reproducible in any engine with md5, so the whole sketch (and every
estimate) is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.dedup import shingle_hash


def cms_bucket(token: Column, seed: Column, width: int) -> Column:
    """Row-s bucket: md5(seed || ':' || token) folded to [0, width)."""
    return shingle_hash(
        F.concat(seed.cast("string"), F.lit(":"), token)
    ) % width


def _probe(df: DataFrame, depth: int, width: int) -> DataFrame:
    """Attach (seed, bucket) rows — one per hash row — to each token."""
    return df.select(
        "token",
        F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed"),
    ).select(
        "token", "seed", cms_bucket(F.col("token"), F.col("seed"), width).alias("bucket")
    )


def cms_cells(tokens: DataFrame, depth: int = 3, width: int = 64) -> DataFrame:
    """Token stream (column `token`, with multiplicity) → sketch cells
    (seed, bucket, c). One shuffle of ≤ depth×width rows per task."""
    return _probe(tokens, depth, width).groupBy("seed", "bucket").agg(
        F.count("*").alias("c")
    )


def cms_estimates(
    tokens: DataFrame, keys: DataFrame, depth: int = 3, width: int = 64
) -> DataFrame:
    """Estimated frequency for every row of `keys` (column `token`):
    min over the d cells. The cell table (≤ d×w rows) broadcasts."""
    cells = cms_cells(tokens, depth, width)
    joined = (
        _probe(keys, depth, width)
        .join(F.broadcast(cells), ["seed", "bucket"], "left")
        .select("token", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    return joined.groupBy("token").agg(F.min("c").alias("est"))


# ----------------------------------------------------------------- HLL
def hll_registers(
    keys: DataFrame, m: int = 64, key_col: str = "key"
) -> DataFrame:
    """HyperLogLog registers as a relational aggregate: hash each key to
    (bucket, rho) where rho = 1 + leading zeros of the remaining hash
    bits, and keep max(rho) per bucket — groupBy/max IS the register
    merge, so the sketch shuffles ≤ m rows per task at any scale.

    Hash = first 8 md5 hex chars (32 bits): bucket = h mod m, the
    remaining w = h div m (26 value bits for m=64), rho via exact
    integer comparisons — every engine reproduces the registers
    bit-for-bit."""
    h = shingle_hash(F.col(key_col).cast("string"))
    w_bits = 32 - (m.bit_length() - 1)  # value bits left after bucketing
    w = F.floor(h / m).cast("long")
    # rho = (w_bits - bit_length(w)) + 1, via comparison chain (exact)
    rho = F.lit(w_bits + 1)  # w == 0 → all zeros → max rho
    for b in range(1, w_bits + 1):
        # bit_length(w) == b  ⇔  2^(b-1) <= w < 2^b
        rho = F.when(
            (F.lit(2 ** (b - 1)) <= w) & (w < F.lit(2**b)),
            F.lit(w_bits - b + 1),
        ).otherwise(rho)
    probe = keys.select((h % m).alias("bucket"), rho.alias("rho"))
    return probe.groupBy("bucket").agg(F.max("rho").alias("r"))


def hll_estimate(registers: DataFrame, m: int = 64) -> DataFrame:
    """Raw HLL estimate alpha_m * m^2 / sum(2^-r) over all m buckets
    (absent buckets contribute 2^0 = 1). All summands are dyadic
    rationals within a 53-bit mantissa span, so the double sum is EXACT
    and order-independent — the estimate is engine-reproducible despite
    being floating-point."""
    alpha = 0.709  # the standard constant for m = 64
    present = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
        F.count("*").alias("nb"),
    )
    return present.select(
        (
            F.lit(alpha * m * m)
            / (F.col("s") + (F.lit(m) - F.col("nb")) * F.lit(1.0))
        ).alias("estimate"),
        F.col("nb").alias("buckets_used"),
    )


# --------------------------------------------------------------- Bloom
def bloom_bits(keys: DataFrame, depth: int = 3, width: int = 1024) -> DataFrame:
    """Bloom filter as a relation: the set of set bits (seed, bucket).
    distinct() is the bit-OR merge; ≤ depth×width rows total."""
    return _probe(keys, depth, width).select("seed", "bucket").distinct()


# ----------------------------------------------------------- KMV/Theta
TWO52 = 1 << 52  # KMV hash space: 13 md5 hex chars = 52 bits


def kmv_hash52(col: Column) -> Column:
    """52-bit key hash (13 md5 hex chars) — wide enough that ties are
    negligible, narrow enough that every value and every c*2^52 product
    stays exactly representable in a float64 mantissa, so estimates are
    bit-identical across engines."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )


def kmv_sketch(keys: DataFrame, k: int, key_col: str = "key") -> DataFrame:
    """K-minimum-values sketch: the k smallest distinct key hashes.

    Scale shape: dense_rank inside each partition first (keeps every row
    of the k smallest distinct hashes per partition without a full
    distinct shuffle), THEN distinct over ≤ k x partitions rows, then
    the global k-min window over that metadata-scale remainder. The full
    key stream is never globally shuffled.
    """
    from pyspark.sql import Window

    raw = keys.select(kmv_hash52(F.col(key_col)).alias("h"))
    pw = Window.partitionBy("pid").orderBy("h")
    local = (
        raw.withColumn("pid", F.spark_partition_id())
        .withColumn("dr", F.dense_rank().over(pw))
        .where(F.col("dr") <= k)
        .select("h")
        .distinct()
    )
    gw = Window.orderBy("h")
    return (
        local.withColumn("rn", F.row_number().over(gw))
        .where(F.col("rn") <= k)
        .select("h")
    )


def kmv_theta(sketch: DataFrame, k: int) -> DataFrame:
    """One-row (theta) frame: the sketch's inclusion bound as an integer
    hash value — 2^52 when the sketch is exact (fewer than k hashes
    survive, i.e. it holds the whole set), else the k-th smallest hash."""
    return sketch.agg(F.count("*").alias("n"), F.max("h").alias("hk")).select(
        F.when(F.col("n") < k, F.lit(TWO52)).otherwise(F.col("hk")).alias("theta")
    )


def kmv_estimate(sketch: DataFrame, theta: DataFrame) -> DataFrame:
    """Distinct-count estimate ROUND(c * 2^52 / theta) where c counts
    sketch hashes strictly below theta. Collapses to the exact count
    when theta = 2^52 (c * 2^52 / 2^52 = c, exact float64 arithmetic),
    and to the classic (k-1)/theta KMV estimator otherwise."""
    c = (
        sketch.crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("c"))
    )
    return c.crossJoin(F.broadcast(theta)).select(
        F.round((F.col("c") * F.lit(TWO52)) / F.col("theta")).cast("long").alias(
            "est"
        )
    )


def kmv_set_estimates(
    ska: DataFrame, skb: DataFrame, k: int
) -> DataFrame:
    """Distinct-count estimates for A, B, A∪B and A∩B from two KMV
    sketches — the theta-sketch set algebra, fully relational.

    Every frame here is ≤ k rows (the sketches) or 1 row (the thetas):
    after the two data-scale sketch builds, set algebra over ANY number
    of 100 TB sets is metadata-scale broadcast joins.
    """
    from pyspark.sql import Window

    ta = kmv_theta(ska, k)
    tb = kmv_theta(skb, k)

    # Union: k smallest of the merged sketches, bounded by every theta.
    merged = ska.union(skb).distinct()
    gw = Window.orderBy("h")
    mk = (
        merged.withColumn("rn", F.row_number().over(gw))
        .where(F.col("rn") <= k)
        .select("h")
    )
    tm = kmv_theta(mk, k)
    tu = (
        ta.crossJoin(tb.withColumnRenamed("theta", "tb"))
        .crossJoin(tm.withColumnRenamed("theta", "tm"))
        .select(F.least("theta", "tb", "tm").alias("theta"))
    )

    # Intersection: hashes present in both sketches, below both thetas.
    ti = (
        ta.crossJoin(tb.withColumnRenamed("theta", "tb"))
        .select(F.least("theta", "tb").alias("theta"))
    )
    both = ska.join(skb, "h")

    def tagged(sk: DataFrame, theta: DataFrame, name: str) -> DataFrame:
        return kmv_estimate(sk, theta).select(
            F.lit(name).alias("set_op"), "est"
        )

    return (
        tagged(ska, ta, "a")
        .union(tagged(skb, tb, "b"))
        .union(tagged(mk, tu, "union"))
        .union(tagged(both, ti, "intersect"))
    )


def bloom_probe(
    candidates: DataFrame, bits: DataFrame, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Membership test: a candidate is 'maybe present' iff ALL depth bits
    are set (count of matched bits == depth). No false negatives."""
    probes = _probe(candidates, depth, width)
    hits = (
        probes.join(F.broadcast(bits), ["seed", "bucket"], "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("bits_set"))
    )
    return candidates.join(hits, "token", "left").select(
        "token",
        (F.coalesce(F.col("bits_set"), F.lit(0)) == depth).alias("maybe_present"),
    )


def bloom_semi_join(
    big: DataFrame,
    small_keys: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 4096,
) -> DataFrame:
    """Bloom-prefiltered semi-join — the runtime-filter pushdown shape:
    rows of ``big`` whose ``key_col`` is in ``small_keys`` (column
    ``key``), computed as

    1. build the small side's Bloom bit set (≤ depth×width bits) and
       collect it driver-side, PACKED into width/64-long words per hash
       row — bounded metadata, like a broadcast var;
    2. prefilter ``big`` with a zero-shuffle, whole-stage-codegen
       row-local probe: all depth bits set ⇔ maybe-member (no false
       negatives by construction, so no true match is lost);
    3. exact broadcast semi-join on the survivors only.

    At 100 TB the win is step 2: the fact table's non-matching rows die
    in the scan stage and never reach the join exchange — Spark's own
    InjectRuntimeFilter does this transparently for some joins; this is
    the explicit, composable form. Result is EXACTLY the semi-join
    (step 3 removes false positives), so the oracle is plain SQL."""
    bits = bloom_bits(
        small_keys.select(F.col("key").cast("string").alias("token")),
        depth,
        width,
    )
    # 32-bit words: values stay < 2^32, so the bit test below is exact
    # double arithmetic (floor(word / 2^k) % 2) with no sign handling —
    # Spark's shiftright() only takes a literal shift count.
    words = width // 32
    packed = [[0] * words for _ in range(depth)]
    for row in bits.collect():  # ≤ depth×width rows: bounded metadata
        packed[row["seed"]][row["bucket"] // 32] |= 1 << (row["bucket"] % 32)
    pows = F.lit([1 << k for k in range(32)]).cast("array<bigint>")

    key_s = F.col(key_col).cast("string")
    cond = None
    for seed in range(depth):
        bucket = shingle_hash(
            F.concat(F.lit(str(seed)), F.lit(":"), key_s)
        ) % width
        word = F.element_at(
            F.lit(packed[seed]).cast("array<bigint>"),
            F.floor(bucket / 32).cast("int") + 1,
        )
        divisor = F.element_at(pows, (bucket % 32).cast("int") + 1)
        test = (F.floor(word / divisor) % 2) == 1
        cond = test if cond is None else (cond & test)
    prefiltered = big.where(cond)
    return prefiltered.join(
        F.broadcast(small_keys.select(F.col("key").alias(key_col)).distinct()),
        key_col,
        "left_semi",
    )


def hll_registers_by(
    keys: DataFrame,
    group_col: str | list[str],
    m: int = 64,
    key_col: str = "key",
) -> DataFrame:
    """Per-group HLL registers: the scale replacement for GROUP BY +
    COUNT(DISTINCT) — each task emits ≤ m rows PER GROUP after map-side
    combine regardless of key cardinality, and groupBy(group, bucket)
    max(rho) IS the register merge. Same exact integer rho as the
    global sketch. ``group_col`` may be a compound key (list); coarser
    rollups come from re-maxing the registers on a key prefix (see
    events_dau_stickiness_hll: weekly registers from daily ones)."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    h = shingle_hash(F.col(key_col).cast("string"))
    w_bits = 32 - (m.bit_length() - 1)
    w = F.floor(h / m).cast("long")
    rho = F.lit(w_bits + 1)
    for b in range(1, w_bits + 1):
        rho = F.when(
            (F.lit(2 ** (b - 1)) <= w) & (w < F.lit(2**b)),
            F.lit(w_bits - b + 1),
        ).otherwise(rho)
    probe = keys.select(
        *groups, (h % m).alias("bucket"), rho.alias("rho")
    )
    return probe.groupBy(*groups, "bucket").agg(F.max("rho").alias("r"))


def hll_estimate_by(
    registers: DataFrame, group_col: str | list[str], m: int = 64
) -> DataFrame:
    """Per-group raw HLL estimate; the dyadic-rational sum stays exact
    and order-independent per group (see hll_estimate)."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    alpha = 0.709
    per = registers.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
        F.count("*").alias("nb"),
    )
    return per.select(
        *groups,
        (
            F.lit(alpha * m * m)
            / (F.col("s") + (F.lit(m) - F.col("nb")) * F.lit(1.0))
        ).alias("estimate"),
        F.col("nb").alias("buckets_used"),
    )


def hll_alpha(m: int) -> float:
    """Bias-correction constant alpha_m (Flajolet et al. 2007, Fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_lc_table(m: int) -> list[float]:
    """Linear-counting estimates m * ln(m / V) for V = 1..m-1 empty
    buckets, precomputed driver-side. The table exists because JVM
    Math.log differs from libm ln by 1 ulp on some of these inputs
    (measured: m=256, V=177), while CPython's math.log and DuckDB's ln
    are both libm-backed and bit-agree on all of them — baking the
    doubles in as literals keeps the small-range branch bit-reproducible
    cross-engine (a pytest pins the table against DuckDB's ln)."""
    return [m * math.log(m / v) for v in range(1, m)]


def hll_estimate_full_by(
    registers: DataFrame, group_col: str | list[str], m: int = 64
) -> DataFrame:
    """Per-group HLL with the standard small-range correction: raw
    estimate alpha_m * m^2 / sum(2^-r); when raw <= 2.5m and some
    buckets are empty, switch to linear counting m*ln(m/V) via the
    literal table. The raw estimate and the branch predicate are exact
    dyadic arithmetic (see hll_estimate), so both engines take the same
    branch and produce identical doubles end-to-end."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    per = registers.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
        F.count("*").alias("nb"),
    )
    raw = F.lit(hll_alpha(m) * m * m) / (
        F.col("s") + (F.lit(m) - F.col("nb")) * F.lit(1.0)
    )
    lc = F.element_at(
        F.array(*[F.lit(x) for x in hll_lc_table(m)]),
        (F.lit(m) - F.col("nb")).cast("int"),
    )
    est = F.when((F.col("nb") < m) & (raw <= F.lit(2.5 * m)), lc).otherwise(raw)
    return per.select(
        *groups, est.alias("estimate"), F.col("nb").alias("buckets_used")
    )


# ------------------------------------------------------------ moments sketch
# A mergeable quantile-estimation sketch in the shape of Gan et al.,
# "Moment-Based Quantile Sketches for Efficient High Cardinality
# Aggregation Queries" (VLDB 2018): per group keep only
# {count, min, max, sum(v), sum(v^2)} over an integer-quantized value.
# Merging two sketches is element-wise add/min/max — exactly what
# Spark's map-side partial aggregation already does for these
# aggregates, so at 100 TB the shuffle carries one tiny row per
# (task, group), never the values. Quantiles are then estimated from
# the moments driver-free, inside the same plan.
#
# Exactness contract: the value is quantized to integer units (cents by
# default) and the power sums accumulate in DECIMAL(38,0), so the sketch
# itself is EXACT integer arithmetic — order- and partitioning-
# independent, hence bit-identical across engines (DuckDB accumulates
# the same integers in HUGEINT). Only the final estimate step casts the
# (identical) integers to double with an identical formula, so even the
# derived doubles match bit-for-bit.


def moments_partials(
    df: DataFrame,
    value: Column,
    group_cols: list[str],
    scale: int = 100,
) -> DataFrame:
    """One mergeable moments-sketch row per group: (n, vmin, vmax, s1, s2).

    ``value`` is quantized to integer units via floor(v*scale + 0.5) —
    the same half-up rule the integer-cents TPC-H rewrites use — and the
    power sums are exact decimals. Calling this on any partition of the
    data and then :func:`moments_merge`-ing the partials is identical to
    calling it once on the union (the mergeability property the test
    suite asserts)."""
    v = F.floor(value * scale + F.lit(0.5)).cast("long")
    v_dec = v.cast("decimal(19,0)")
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v_dec).cast("decimal(38,0)").alias("s1"),
        F.sum((v_dec * v_dec).cast("decimal(38,0)")).cast("decimal(38,0)").alias("s2"),
    )


def moments_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge moments-sketch partial rows that share a group: counts and
    power sums add, min/max fold. Pure re-aggregation — usable as a
    streaming `outputMode(update)` agg or to fan partial sketches in
    from per-shard/ per-day runs."""
    return partials.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("s1").cast("decimal(38,0)").alias("s1"),
        F.sum("s2").cast("decimal(38,0)").alias("s2"),
    )


#: z-scores for the normal-approximation quantile estimates, written as
#: exact double literals so both engines multiply by the same bits.
_Z_SCORES = {"p50": 0.0, "p90": 1.2815515655446004, "p99": 2.3263478740408408}


def moments_estimates(sketch: DataFrame, scale: int = 100) -> DataFrame:
    """Quantile estimates from a moments sketch (normal approximation:
    mean + z*sigma, clamped to the exact [min, max] the sketch kept).
    All doubles derive from exact integers with one fixed formula, so
    the estimates are engine-portable bit-for-bit."""
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    lo = F.col("vmin").cast("double")
    hi = F.col("vmax").cast("double")
    unit = F.lit(float(scale))
    cols = [
        F.col("n"),
        (lo / unit).alias("min_value"),
        (hi / unit).alias("max_value"),
        (mean / unit).alias("mean_value"),
        (std / unit).alias("std_value"),
    ]
    for name, z in _Z_SCORES.items():
        est = F.least(F.greatest(mean + F.lit(z) * std, lo), hi)
        cols.append((est / unit).alias(f"est_{name}"))
    keep = [c for c in sketch.columns if c not in ("n", "vmin", "vmax", "s1", "s2")]
    return sketch.select(*keep, *cols)
