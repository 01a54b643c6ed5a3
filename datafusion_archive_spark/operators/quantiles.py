"""Exact distributed quantiles by histogram pruning.

Spark's exact ``percentile`` aggregate funnels EVERY value of the
group into one task's in-memory buffer for the final merge — a global
median over millions of rows serializes the whole column through one
executor (measured 9.4 s for 2.9M doubles at sf0.01, vs 0.8 s to
produce them). The classic scale-out alternative computes the exact
k-th order statistic with a driver-guided bucket search:

1. one aggregate pass builds a B-bucket histogram of the remaining
   range (map-side combined; B counts to the driver),
2. the driver locates the bucket containing rank k and recurses into
   it (the bucket-membership FILTER reuses the same floor expression
   as the histogram, so float boundary semantics can't drift),
3. once the remaining set is small, a TakeOrdered(limit k) + MAX
   finishes exactly — only a scalar ever reaches the driver.

Each round shrinks the candidate set by ~B×, so 2 rounds cover 10^7
rows and 3 cover 10^10; every pass is an ordinary distributed
aggregate over the (cached) input. Exactness: bucket counts are
integers, rank bookkeeping is integer, and the final step is an exact
sort — the result is the same double ``percentile`` would return
(interpolated median = mean of the two middle order statistics).

The reference has no quantile surface at all (ROADMAP.md stops at
min/max/sum); this is scale infrastructure for the statistics family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: buckets per refinement round — 4096 counts is a trivial driver
#: payload and shrinks 2.9M rows to ~700 in one round
_BUCKETS = 4096
#: below this many remaining rows, finish with TakeOrdered + MAX
_TAIL = 65536
#: hard cap on refinement rounds (4096^4 ≈ 2.8e14 rows); beyond it
#: the value range has stopped shrinking (mass concentrated on one
#: float value) and the tail path is forced
_MAX_ROUNDS = 4


def _bucket_expr(x, lo, width):
    """Bucket index of value column ``x`` on the [lo, lo+B·width)
    grid, clamped to [0, B-1]. The clamp happens in DOUBLE space
    BEFORE the floor/int cast: (x - lo) can overflow to ±inf for
    huge-magnitude doubles, and floor(inf) saturates to Long.MaxValue
    whose int cast throws CAST_OVERFLOW (found by the round-7
    hypothesis differential at ±1e308). lo/width may be literals or
    columns; every caller must reuse the SAME expression for the
    histogram and the membership filter so float boundary semantics
    cannot drift."""
    ratio = (x - lo) / width
    clamped = F.greatest(
        F.lit(0.0), F.least(F.lit(float(_BUCKETS - 1)), ratio)
    )
    return F.floor(clamped).cast("int")


def exact_order_statistics(
    df: DataFrame, col: str, k1: int, k2: int
) -> tuple[float, float]:
    """The (k1-th, k2-th) smallest values (1-based, k1 <= k2 with a
    small gap — e.g. the two middle ranks of a median) in ONE bucket
    search: each round keeps the bucket span covering [k1, k2] (at
    most adjacent buckets for a gap of 1), so both order statistics
    cost the same passes as one.

    Driver-side bucket search (see module docstring); the input is
    scanned once per round, so cache ``df`` when it is cheap to hold.
    NULLs are ignored, matching SQL ``percentile`` semantics.
    """
    if k1 > k2:
        raise ValueError(f"k1 {k1} > k2 {k2}")
    # NaN handling (ADVICE r6): NaN poisons the bucket search (hi and
    # width become NaN, floor(NaN) nulls out and every NaN lands in
    # bucket 0 — the OPPOSITE end from where Spark's ordering puts
    # them). Spark sorts NaN greater than any double, so split them
    # out up front: ranks past the non-NaN count are NaN by
    # definition; the search itself runs NaN-free.
    vals = df.select(F.col(col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    head = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.isnan("_x").cast("long")).alias("n_nan"),
    ).first()
    n_total, n_nan = head.n, head.n_nan or 0
    if n_total == 0 or not 1 <= k1 <= k2 <= n_total:
        raise ValueError(f"ranks ({k1}, {k2}) out of range for {n_total} rows")
    n_fin = n_total - n_nan
    if k1 > n_fin:
        return float("nan"), float("nan")
    nan_hi = k2 > n_fin  # upper rank falls in the NaN tail
    if nan_hi:
        k2 = n_fin
    remaining = vals.filter(~F.isnan("_x")) if n_nan else vals
    for _ in range(_MAX_ROUNDS):
        stats = remaining.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_x").alias("lo"),
            F.max("_x").alias("hi"),
        ).first()
        n, lo, hi = stats.n, stats.lo, stats.hi
        if n == 0 or not 1 <= k1 <= k2 <= n:
            raise ValueError(f"ranks ({k1}, {k2}) out of range for {n} rows")
        if n <= _TAIL or lo == hi:
            break
        width = (hi - lo) / _BUCKETS
        if not math.isfinite(width):
            # hi-lo overflowed double range; halve each side first
            width = hi / _BUCKETS - lo / _BUCKETS
        if width == 0.0 or not math.isfinite(width):
            # subnormal-sized range (or still non-finite): bucketing
            # can't subdivide further — finish exactly on what's left
            break
        bucket = _bucket_expr(F.col("_x"), F.lit(lo), F.lit(width))
        hist = dict(
            remaining.groupBy(bucket.alias("_b"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        )
        cum, b_lo, b_hi, below = 0, None, None, 0
        for b in range(_BUCKETS):
            c = hist.get(b, 0)
            if b_lo is None and cum + c >= k1:
                b_lo, below = b, cum
            if cum + c >= k2:
                b_hi = b
                break
            cum += c
        # reuse the EXACT bucket expression for membership so the
        # filter and the histogram agree bit-for-bit
        remaining = remaining.filter(bucket.between(b_lo, b_hi))
        k1 -= below
        k2 -= below
    # exact finish on the (small) remaining set: k-th smallest =
    # max of the k smallest; TakeOrderedAndProject keeps it
    # distributed and only scalars reach the driver
    head = remaining.orderBy("_x").limit(k2)
    if k1 == k2:
        v = head.agg(F.max("_x").alias("v")).first().v
        return (v, float("nan")) if nan_hi else (v, v)
    row = (
        head.orderBy(F.desc("_x"))
        .limit(k2 - k1 + 1)
        .agg(F.max("_x").alias("v2"), F.min("_x").alias("v1"))
        .first()
    )
    return row.v1, float("nan") if nan_hi else row.v2


def lit_cutpoints(vals: list):
    """Inline a cutpoint list (an :func:`exact_quantiles_cont` result)
    as an ``F.array`` of DOUBLE literals, null-safely. On an empty
    input the search returns ``[None, ...]`` — exactly what the old
    one-pass ``percentile`` plans produced as null cutpoints — but
    ``F.lit(float(None))`` raises at plan-build time (ADVICE r7 #4).
    A null literal restores the old behavior: every ``x > null``
    comparison yields null, so the bucketing fold's ``when()`` adds
    nothing and the caller's result keeps its empty/null shape."""
    return F.array(
        *[
            F.lit(None).cast("double") if v is None else F.lit(float(v))
            for v in vals
        ]
    )


def _check_probs(probs: list[float]) -> None:
    """Mirror the percentile aggregate's contract: percentages must
    be in [0, 1] (Spark raises VALUE_OUT_OF_RANGE there; a silent
    clamp here would diverge from the aggregate the callers treat
    this as bit-equal to)."""
    bad = [q for q in probs if not 0.0 <= q <= 1.0]
    if bad:
        raise ValueError(f"percentages must be between 0 and 1: {bad}")


def exact_kth_smallest(df: DataFrame, col: str, k: int) -> float:
    """The k-th smallest value (1-based) of a numeric column, exact."""
    return exact_order_statistics(df, col, k, k)[0]


def exact_median(df: DataFrame, col: str) -> float:
    """Interpolated exact median (== SQL ``percentile(col, 0.5)``)
    via :func:`_interp`, NOT ``(v1+v2)/2`` — the naive mean overflows
    to inf when both middle ranks are ~1e308 while Percentile's
    0.5·v1 + 0.5·v2 stays finite, and the equal-key shortcut avoids
    the subnormal underflow."""
    n = df.filter(F.col(col).isNotNull()).count()
    if n == 0:
        return None
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    v1, v2 = exact_order_statistics(df, col, k1, k2)
    return _interp(v1, v2, k1, k2, 0.5)


def exact_quantiles_cont(
    df: DataFrame, col: str, probs: list[float]
) -> list[float]:
    """Exact interpolated quantiles (== SQL ``percentile(col,
    array(...))`` / DuckDB ``quantile_cont``) for MANY probabilities in
    one histogram pass.

    Decile cutpoints need ranks spread across the whole distribution,
    so the single-span search of :func:`exact_order_statistics` does
    not apply; instead one histogram locates every needed rank's
    bucket, ONE filter keeps the union of those buckets, and a
    row_number window PARTITIONED BY BUCKET (each bucket holds ~n/B
    rows, independent of how many quantiles are asked) selects all
    order statistics in a single distributed pass. Only the <=2·|probs|
    selected values reach the driver; interpolation uses Spark's
    ``lower·(1-d) + higher·d`` formula so results are bit-identical
    to the ``percentile`` aggregate. A bucket that is
    still huge (pathological value concentration) falls back to the
    recursive single-rank search just for its ranks.
    """
    from pyspark.sql import Window

    _check_probs(probs)
    vals = df.select(F.col(col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    # NaN-aware stats (ADVICE r6): Spark orders NaN greater than any
    # double, so NaNs own the TOP ranks; lo/hi for the bucket grid
    # come from the finite values only (min/max over a NaN-bearing
    # column return NaN and would poison the bucket width).
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.isnan("_x").cast("long")).alias("n_nan"),
        F.min(F.when(~F.isnan("_x"), F.col("_x"))).alias("lo"),
        F.max(F.when(~F.isnan("_x"), F.col("_x"))).alias("hi"),
    ).first()
    n, n_nan, lo, hi = stats.n, stats.n_nan or 0, stats.lo, stats.hi
    if n == 0:
        return [None] * len(probs)
    n_fin = n - n_nan
    # interpolation positions (0-based, Spark Percentile semantics)
    needed: dict[int, float] = {}  # 1-based rank -> value (filled below)
    plan = []
    for q in probs:
        pos = (n - 1) * q
        lo_r, hi_r = int(pos) + 1, min(int(pos) + 2, n)
        if pos == int(pos):
            hi_r = lo_r
        plan.append((lo_r, hi_r, pos - int(pos)))
        needed[lo_r] = None
        needed[hi_r] = None
    # ranks in the NaN tail resolve to NaN without touching the data
    for r in needed:
        if r > n_fin:
            needed[r] = float("nan")
    fin_ranks = sorted(r for r in needed if r <= n_fin)
    fin = vals.filter(~F.isnan("_x")) if n_nan else vals
    width = (hi - lo) / _BUCKETS if n_fin > 1 and lo != hi else 0.0
    if not math.isfinite(width):
        width = hi / _BUCKETS - lo / _BUCKETS
    if not fin_ranks:
        pass
    elif n_fin == 1 or lo == hi:
        for r in fin_ranks:
            needed[r] = lo
    elif width == 0.0 or not math.isfinite(width):
        # subnormal-sized range: the grid can't subdivide — resolve
        # each needed rank by the (tail-capable) single-rank search
        for r in fin_ranks:
            needed[r] = exact_kth_smallest(fin, "_x", r)
    else:
        bucket = _bucket_expr(F.col("_x"), F.lit(lo), F.lit(width))
        hist = dict(
            fin.groupBy(bucket.alias("_b"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        )
        # map each needed global rank to (bucket, local rank); the
        # linear scan over B buckets is trivial driver work
        by_bucket: dict[int, dict[int, int]] = {}
        for r in fin_ranks:
            cm = 0
            for b in range(_BUCKETS):
                c = hist.get(b, 0)
                if cm + c >= r:
                    by_bucket.setdefault(b, {})[r - cm] = r
                    break
                cm += c
        big = {b for b in by_bucket if hist.get(b, 0) > 4 * _TAIL}
        small = [b for b in by_bucket if b not in big]
        if small:
            sel = fin.select("_x", bucket.alias("_b")).filter(
                F.col("_b").isin(small)
            )
            w = Window.partitionBy("_b").orderBy("_x")
            picked = sel.select(
                "_x", "_b", F.row_number().over(w).alias("_rn")
            ).filter(
                F.concat_ws(":", "_b", "_rn").isin(
                    [f"{b}:{lr}" for b in small for lr in by_bucket[b]]
                )
            ).collect()
            for row in picked:
                needed[by_bucket[row._b][row._rn]] = row._x
        for b in big:
            sub = fin.filter(bucket == b)
            for lr, r in by_bucket[b].items():
                needed[r] = exact_kth_smallest(sub, "_x", lr)
    out = []
    for lo_r, hi_r, frac in plan:
        out.append(_interp(needed[lo_r], needed[hi_r], lo_r, hi_r, frac))
    return out


def _interp(v_lo: float, v_hi: float, lo_r: int, hi_r: int, frac: float):
    """Spark Percentile's exact interpolation semantics: equal ranks
    or EQUAL KEYS return the lower value directly (Percentile
    short-circuits ``higherKey == lowerKey`` — numeric interpolation
    there is not a no-op: 0.5·5e-324 underflows to 0 under
    round-half-even, found by the round-7 fuzz); otherwise
    lower·(1-d) + higher·d, which is NOT floating-point-equivalent to
    lower+(higher-lower)·d (1-ulp differences). Bit-parity with the
    aggregate is the contract."""
    if lo_r == hi_r or v_lo == v_hi:
        return v_lo
    return v_lo * (1.0 - frac) + v_hi * frac


#: histogram rows reaching the driver are bounded by groups × occupied
#: buckets; the guard keeps the worst case (every bucket occupied in
#: every group) to ~1M counted rows
_MAX_GROUPS = 256


def _check_grouped_key_dtype(df: DataFrame, key: str) -> None:
    """The grouped searches match selected rows back to their group
    via a concat_ws string triple, which requires the key's Spark
    string form to equal Python ``str(value)``. That holds for string
    and integral keys only — a boolean ("true" vs "True"), float
    ("1.0" formatting), or date key silently matches nothing and
    later dies inside _interp with an opaque None-arithmetic error
    (ADVICE r7 #5). Fail fast with the escape hatch named."""
    dtype = dict(df.dtypes).get(key)
    ok = dtype in ("string", "tinyint", "smallint", "int", "bigint")
    if not ok:
        raise ValueError(
            f"grouped quantile search: key column {key!r} has dtype "
            f"{dtype}; only string/integral keys keep the Spark "
            "string form equal to str(value) (the selection-filter "
            "contract). Cast the key to string first, or fall back "
            "to groupBy().agg(percentile(...)) for bounded groups."
        )


def _check_weighted_key_dtype(df: DataFrame, key: str) -> None:
    """The WEIGHTED grouped search matches groups by VALUE, not by
    string form: selected keys round-trip driver-side through
    ``collect() → createDataFrame()`` / literal filters and rejoin via
    ``eqNullSafe``. That round-trip is lossless for every atomic type
    (string, integrals, float/double — a collected float widens to a
    Python double and narrows back exactly — boolean, date,
    timestamp, decimal), so this guard is deliberately wider than
    :func:`_check_grouped_key_dtype`'s string-form contract, which
    does not apply here (ADVICE r8 #3). It rejects only non-atomic
    keys (array/map/struct/binary), whose literal filters are not
    value-faithful. Float NaN keys are rejected separately after the
    stats pass: Spark groups NaNs together, but driver-side dict
    lookups across two collects see two different NaN objects and
    silently miss."""
    dtype = dict(df.dtypes).get(key)
    ok = dtype in (
        "string", "tinyint", "smallint", "int", "bigint",
        "float", "double", "boolean", "date",
    ) or (dtype or "").startswith(("decimal", "timestamp"))
    if not ok:
        raise ValueError(
            f"weighted grouped quantile search: key column {key!r} "
            f"has dtype {dtype}; only atomic keys survive the "
            "driver-side collect/createDataFrame round-trip that the "
            "eqNullSafe group matching relies on. Cast the key to an "
            "atomic type first."
        )


def exact_grouped_quantiles(
    df: DataFrame,
    key: str,
    col: str,
    probs: list[float],
    max_groups: int = _MAX_GROUPS,
) -> dict:
    """Exact interpolated quantiles PER GROUP — ``{key_value:
    [q_1, …]}`` equal to ``groupBy(key).agg(percentile(col,
    array(probs)))`` bit-for-bit — without per-group value buffers.

    Spark's grouped ``percentile`` buffers EVERY value of a group in
    the one reducer task that finalizes it: for low-cardinality keys
    over fact-scale data (event types, months) that is hundreds of GB
    in one task's memory. This runs the same histogram-pruning idea
    as :func:`exact_quantiles_cont` for all groups AT ONCE:

    1. one grouped aggregate collects per-group (n, n_nan, lo, hi) —
       |groups| rows to the driver;
    2. one pass histograms every group simultaneously (per-group
       lo/width broadcast-joined onto the scan, counts grouped by
       (key, bucket));
    3. one selection pass picks all needed order statistics across
       all groups with a row_number window PARTITIONED BY (key,
       bucket) — each partition holds ~n_g/B rows;
    4. the driver interpolates. Only |groups|·(≤2·|probs|) scalars
       plus the bucket counts ever leave the executors.

    NaNs follow Spark ordering (greatest, so they own the top ranks);
    pathological groups (zero-width range, >4·_TAIL-row buckets) fall
    back to the single-group search on that group's slice; a NULL key
    is a group like any other (null-safe join + sentinel in the
    selection filter), mirroring grouped ``percentile``. The key
    column must be an atomic type whose Spark string form equals
    ``str(value)`` (string/integer keys — the selection filter matches
    on a concatenated string triple).
    """
    from pyspark.sql import Window

    _check_probs(probs)
    _check_grouped_key_dtype(df, key)
    vals = df.select(
        F.col(key).alias("_k"), F.col(col).cast("double").alias("_x")
    ).filter(F.col("_x").isNotNull())
    # the max_groups guard caps what the DRIVER collects, so it must
    # fire before materialization: limit(max_groups+1) on the grouped
    # stats means an accidental high-cardinality key (a user-id
    # column) ships at most max_groups+1 rows, not every group
    # (ADVICE r7 #2).
    stats = vals.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.isnan("_x").cast("long")).alias("n_nan"),
        F.min(F.when(~F.isnan("_x"), F.col("_x"))).alias("lo"),
        F.max(F.when(~F.isnan("_x"), F.col("_x"))).alias("hi"),
    ).limit(max_groups + 1).collect()
    if len(stats) > max_groups:
        raise ValueError(
            f"exact_grouped_quantiles: group count exceeds max_groups"
            f"={max_groups}; raise the cap (driver holds groups x "
            "occupied-bucket counts) or use the sketch path"
        )
    needed: dict = {}  # key -> {global rank: value or None}
    plans: dict = {}  # key -> [(lo_r, hi_r, frac)]
    grids: dict = {}  # key -> (lo, width) for groups needing a histogram
    zero_width: set = set()
    any_nan = False
    for row in stats:
        n, n_nan, lo, hi = row.n, row.n_nan or 0, row.lo, row.hi
        any_nan = any_nan or n_nan > 0
        n_fin = n - n_nan
        plan, need = [], {}
        for q in probs:
            pos = (n - 1) * q
            lo_r, hi_r = int(pos) + 1, min(int(pos) + 2, n)
            if pos == int(pos):
                hi_r = lo_r
            plan.append((lo_r, hi_r, pos - int(pos)))
            need[lo_r] = need[hi_r] = None
        for r in need:
            if r > n_fin:
                need[r] = float("nan")
        fin_ranks = [r for r in need if r <= n_fin]
        if fin_ranks:
            if n_fin == 1 or lo == hi:
                for r in fin_ranks:
                    need[r] = lo
            else:
                width = (hi - lo) / _BUCKETS
                if not math.isfinite(width):
                    width = hi / _BUCKETS - lo / _BUCKETS
                if width == 0.0 or not math.isfinite(width):
                    zero_width.add(row._k)
                else:
                    grids[row._k] = (float(lo), float(width))
        plans[row._k] = plan
        needed[row._k] = need
    fin = vals.filter(~F.isnan("_x")) if any_nan else vals

    def _key_eq(k):
        # a NULL group (which grouped percentile reports like any
        # other) never matches ``== k``; null-safe it explicitly
        return F.col("_k").isNull() if k is None else F.col("_k") == k

    # string form of a key for the selection-filter triples; NULL
    # keys get a sentinel that concat_ws is forced to render (plain
    # concat_ws SKIPS null columns, which would collapse the triple)
    _NULL_TAG = "\x00null"

    def _key_str(k):
        return _NULL_TAG if k is None else str(k)

    _k_str = F.coalesce(F.col("_k").cast("string"), F.lit(_NULL_TAG))
    for k in zero_width:
        # subnormal-sized range: resolve this group's ranks by the
        # (tail-capable) single-rank search on its slice
        sub = fin.filter(_key_eq(k))
        for r in [r for r, v in needed[k].items() if v is None]:
            needed[k][r] = exact_kth_smallest(sub, "_x", r)
    if grids:
        spark = df.sparkSession
        meta = F.broadcast(
            spark.createDataFrame(
                [(k, lo, w) for k, (lo, w) in grids.items()],
                schema=vals.select("_k").schema.add("_lo", "double").add(
                    "_w", "double"
                ),
            ).withColumnRenamed("_k", "_mk")
        )
        joined = fin.join(
            meta, F.col("_k").eqNullSafe(F.col("_mk"))
        ).drop("_mk")
        bucket = _bucket_expr(F.col("_x"), F.col("_lo"), F.col("_w"))
        hist: dict = {}
        for row in (
            joined.groupBy("_k", bucket.alias("_b"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        ):
            hist.setdefault(row._k, {})[row._b] = row._c
        # map each group's needed ranks to (bucket, local rank)
        by_bucket: dict = {}  # key -> bucket -> {local rank: global rank}
        big: set = set()  # (key, bucket) pairs too big for the window
        for k, (lo, w) in grids.items():
            h = hist.get(k, {})
            for r in sorted(
                r for r, v in needed[k].items() if v is None
            ):
                cm = 0
                for b in range(_BUCKETS):
                    c = h.get(b, 0)
                    if cm + c >= r:
                        by_bucket.setdefault(k, {}).setdefault(b, {})[
                            r - cm
                        ] = r
                        if c > 4 * _TAIL:
                            big.add((k, b))
                        break
                    cm += c
        small = [
            f"{_key_str(k)}:{b}"
            for k, bs in by_bucket.items()
            for b in bs
            if (k, b) not in big
        ]
        if small:
            sel = joined.select(
                "_k", "_x", bucket.alias("_b")
            ).filter(F.concat_ws(":", _k_str, "_b").isin(small))
            w_sel = Window.partitionBy("_k", "_b").orderBy("_x")
            wanted = [
                f"{_key_str(k)}:{b}:{lr}"
                for k, bs in by_bucket.items()
                for b, lrs in bs.items()
                if (k, b) not in big
                for lr in lrs
            ]
            picked = (
                sel.withColumn("_rn", F.row_number().over(w_sel))
                .filter(
                    F.concat_ws(":", _k_str, "_b", "_rn").isin(wanted)
                )
                .collect()
            )
            for row in picked:
                needed[row._k][by_bucket[row._k][row._b][row._rn]] = row._x
        for k, b in big:
            lo, w = grids[k]
            sub_bucket = _bucket_expr(F.col("_x"), F.lit(lo), F.lit(w))
            sub = fin.filter(_key_eq(k)).filter(sub_bucket == b)
            for lr, r in by_bucket[k][b].items():
                needed[k][r] = exact_kth_smallest(sub, "_x", lr)
    out = {}
    for k, plan in plans.items():
        out[k] = [
            _interp(needed[k][lo_r], needed[k][hi_r], lo_r, hi_r, frac)
            for lo_r, hi_r, frac in plan
        ]
    return out


# ---------------------------------------------------------------------------
# Weighted lower quantiles (VERDICT r7 #3)
# ---------------------------------------------------------------------------


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _weighted_tail_min(fin: DataFrame, target: int):
    """Smallest ``_v`` whose within-set cumulative weight reaches
    ``target``, for a set already pruned small enough to window: one
    per-value collapse, one unpartitioned cumulative window over the
    <= |distinct values| collapsed rows, one scalar to the driver."""
    from pyspark.sql import Window

    by_v = fin.groupBy("_v").agg(F.sum("_w").alias("_sw"))
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        by_v.withColumn("_cum", F.sum("_sw").over(w))
        .filter(F.col("_cum") >= F.lit(int(target)))
        .agg(F.min("_v").alias("v"))
        .first()
        .v
    )


def _weighted_search_single(fin: DataFrame, target: int):
    """Recursive weighted-rank bucket search on one (already
    group-sliced) value set: each round histograms the remaining
    range by SUM OF WEIGHTS, keeps the bucket where the cumulative
    weight crosses ``target``, and subtracts the weight below it —
    the weighted twin of :func:`exact_order_statistics`'s loop."""
    remaining, target = fin, int(target)
    for _ in range(_MAX_ROUNDS):
        stats = remaining.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
        ).first()
        if stats.n == 0:
            raise ValueError("weighted search: empty candidate set")
        if stats.n <= _TAIL or stats.lo == stats.hi:
            break
        lo, hi = stats.lo, stats.hi
        width = (hi - lo) / _BUCKETS
        if not math.isfinite(width):
            width = hi / _BUCKETS - lo / _BUCKETS
        if width == 0.0 or not math.isfinite(width):
            break
        bucket = _bucket_expr(F.col("_v"), F.lit(lo), F.lit(width))
        hist = dict(
            remaining.groupBy(bucket.alias("_b"))
            .agg(F.sum("_w").alias("_sw"))
            .collect()
        )
        cum = 0
        for b in range(_BUCKETS):
            c = int(hist.get(b, 0) or 0)
            if cum + c >= target:
                remaining = remaining.filter(bucket == b)
                target -= cum
                break
            cum += c
    return _weighted_tail_min(remaining, target)


def weighted_lower_quantiles_grouped(
    df: DataFrame,
    key: str,
    col: str,
    wt,
    targets: list[tuple[int, int]],
    max_groups: int = _MAX_GROUPS,
) -> dict:
    """Exact grouped WEIGHTED lower quantiles without the per-group
    cumulative sweep over the full value dictionary.

    For each group k and target (num, den), returns the smallest
    value v such that ``W_k(v) * den >= total_k * num`` where
    ``W_k(v)`` is the total weight of the group's rows with value
    <= v — i.e. the ``min(CASE WHEN cum*den >= total*num ...)`` of
    the SQL cumulative-window formulation, bit-for-bit (weights stay
    integers end-to-end; thresholds are exact ceil-divisions in
    Python bigint space). Output: ``{key_value: ([v_t1, ...],
    total_weight)}``.

    Why not the window sweep: partitioned by a low-cardinality key,
    the cumulative window sorts each group's whole value DICTIONARY
    in one task — and the dictionary grows linearly with scale
    (VERDICT r7 "What's wrong" #2). Here the heavy passes are all
    ordinary distributed aggregates, the weighted twin of
    :func:`exact_grouped_quantiles`:

    1. one grouped aggregate → per-group (total, lo, hi) — at most
       ``max_groups + 1`` rows reach the driver (limit-guarded);
    2. one pass histograms every group at once by SUM OF WEIGHTS
       (per-group grid broadcast onto the scan);
    3. the driver walks each group's 4096 bucket weights to locate,
       per target, the crossing bucket and its residual threshold;
    4. one selection pass collapses the needed buckets per value and
       takes, per (group, bucket, residual), the min value whose
       in-bucket cumulative weight reaches the residual — windowed by
       (group, bucket), each holding ~1/4096 of the dictionary. A
       pathologically heavy bucket (> 4*_TAIL rows) recurses via
       :func:`_weighted_search_single` on its slice.

    Contracts: weights must be non-negative integers (zero-weight
    rows can never cross a threshold and are dropped; a group with NO
    positive weight is omitted from the result; a negative weight
    makes cumulative weight non-monotone and raises); values must be
    NaN-free (weighted rank has no Spark aggregate to pin NaN
    semantics against — callers filter or fail); the key column
    follows :func:`_check_weighted_key_dtype` (any atomic type — this
    path matches groups by value via eqNullSafe, not by string form).
    """
    from pyspark.sql import Window

    for num, den in targets:
        if den <= 0 or num < 0:
            raise ValueError(f"bad target fraction {num}/{den}")
    _check_weighted_key_dtype(df, key)
    raw = df.select(
        F.col(key).alias("_k"),
        F.col(col).cast("double").alias("_v"),
        F.col(wt).cast("long").alias("_w") if isinstance(wt, str) else
        wt.cast("long").alias("_w"),
    ).filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
    # the stats pass runs BEFORE the positive-weight filter so a
    # negative weight (which makes cumulative weight non-monotone —
    # "min value crossing the threshold" is ill-defined) is detected,
    # not silently dropped; zero-weight rows can never cross a
    # threshold, so dropping them from the search passes is lossless.
    stats = (
        raw.groupBy("_k")
        .agg(
            F.sum(F.when(F.col("_w") > 0, F.col("_w"))).alias("total"),
            F.min("_w").alias("min_w"),
            F.sum(F.isnan("_v").cast("long")).alias("n_nan"),
            F.min(F.when(F.col("_w") > 0, F.col("_v"))).alias("lo"),
            F.max(F.when(F.col("_w") > 0, F.col("_v"))).alias("hi"),
        )
        .limit(max_groups + 1)
        .collect()
    )
    if len(stats) > max_groups:
        raise ValueError(
            f"weighted_lower_quantiles_grouped: over {max_groups} "
            "groups; raise max_groups or use the sketch path"
        )
    if any(row.min_w is not None and row.min_w < 0 for row in stats):
        raise ValueError(
            "weighted_lower_quantiles_grouped: negative weights make "
            "cumulative weight non-monotone — fix the weight column"
        )
    if dict(df.dtypes).get(key) in ("float", "double") and any(
        row._k is not None and math.isnan(row._k) for row in stats
    ):
        raise ValueError(
            "weighted_lower_quantiles_grouped: NaN group key — Spark "
            "groups NaNs together but driver-side matching cannot "
            "(NaN != NaN across collects); filter or coalesce it"
        )
    if any((row.n_nan or 0) > 0 for row in stats):
        raise ValueError(
            "weighted_lower_quantiles_grouped: NaN values present — "
            "filter them (weighted rank has no NaN ordering contract)"
        )
    stats = [row for row in stats if row.total is not None]
    vals = raw.filter(F.col("_w") > 0)
    # per-(group, target) integer thresholds; trivially-solved groups
    # (single distinct value) resolve without touching the data again
    thresholds: dict = {}  # key -> [exact int threshold per target]
    out: dict = {}  # key -> ([values...], total)
    grids: dict = {}  # key -> (lo, width)
    for row in stats:
        total = int(row.total)
        thr = [_ceil_div(total * num, den) for num, den in targets]
        thresholds[row._k] = thr
        out[row._k] = [None] * len(targets)
        if row.lo == row.hi:
            out[row._k] = ([row.lo] * len(targets), total)
            continue
        width = (row.hi - row.lo) / _BUCKETS
        if not math.isfinite(width):
            width = row.hi / _BUCKETS - row.lo / _BUCKETS
        if width == 0.0 or not math.isfinite(width):
            # subnormal range: per-target recursive search on the slice
            sub = vals.filter(
                F.col("_k").isNull() if row._k is None
                else F.col("_k") == row._k
            )
            out[row._k] = (
                [_weighted_search_single(sub, t) for t in thr], total
            )
            continue
        out[row._k] = (out[row._k], total)
        grids[row._k] = (float(row.lo), float(width))
    if not grids:
        return out
    spark = df.sparkSession
    meta = F.broadcast(
        spark.createDataFrame(
            [(k, lo, w) for k, (lo, w) in grids.items()],
            schema=vals.select("_k").schema.add("_lo", "double").add(
                "_w2", "double"
            ),
        ).withColumnRenamed("_k", "_mk")
    )
    joined = vals.join(meta, F.col("_k").eqNullSafe(F.col("_mk"))).drop(
        "_mk"
    )
    bucket = _bucket_expr(F.col("_v"), F.col("_lo"), F.col("_w2"))
    hist: dict = {}  # key -> {bucket: (sum_wt, n_rows)}
    for row in (
        joined.groupBy("_k", bucket.alias("_b"))
        .agg(F.sum("_w").alias("_sw"), F.count(F.lit(1)).alias("_c"))
        .collect()
    ):
        hist.setdefault(row._k, {})[row._b] = (int(row._sw), int(row._c))
    # locate, per (group, target), the crossing bucket + residual
    needs: list = []  # (key, bucket, residual_threshold, tag)
    big: list = []  # (key, bucket, residual, tag) for heavy buckets
    for k, thr in thresholds.items():
        if k not in grids:
            continue
        h = hist.get(k, {})
        for ti, t in enumerate(thr):
            cum = 0
            for b in range(_BUCKETS):
                sw, c = h.get(b, (0, 0))
                if cum + sw >= t:
                    tag = f"{len(needs) + len(big)}"
                    row = (k, b, t - cum, tag)
                    (big if c > 4 * _TAIL else needs).append(row + (ti,))
                    break
                cum += sw
    if needs:
        need_df = F.broadcast(
            spark.createDataFrame(
                [(k, b, r, tag) for k, b, r, tag, _ in needs],
                schema=vals.select("_k").schema.add("_nb", "integer").add(
                    "_nr", "long"
                ).add("_tag", "string"),
            ).withColumnRenamed("_k", "_nk")
        )
        by_v = (
            joined.select("_k", "_v", "_w", bucket.alias("_b"))
            .join(
                need_df,
                F.col("_k").eqNullSafe(F.col("_nk"))
                & (F.col("_b") == F.col("_nb")),
            )
            .groupBy("_k", "_b", "_nr", "_tag", "_v")
            .agg(F.sum("_w").alias("_sw"))
        )
        w_cum = Window.partitionBy("_k", "_b", "_tag").orderBy(
            "_v"
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        picked = (
            by_v.withColumn("_cum", F.sum("_sw").over(w_cum))
            .filter(F.col("_cum") >= F.col("_nr"))
            .groupBy("_tag")
            .agg(F.min("_v").alias("_pick"))
            .collect()
        )
        by_tag = {row._tag: row._pick for row in picked}
        for k, b, r, tag, ti in needs:
            out[k][0][ti] = by_tag[tag]
    for k, b, r, tag, ti in big:
        lo, w = grids[k]
        sub_bucket = _bucket_expr(F.col("_v"), F.lit(lo), F.lit(w))
        sub = vals.filter(
            F.col("_k").isNull() if k is None else F.col("_k") == k
        ).filter(sub_bucket == b)
        out[k][0][ti] = _weighted_search_single(sub, r)
    return out
