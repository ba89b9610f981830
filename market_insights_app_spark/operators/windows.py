"""Window-function family — SURVEY.md §2.5 (W1-W14).

The reference implements all of these as O(n·w) JavaScript array loops
over a collected series (static/main.js:217-383, 559-565, 990-1000).
Here each is a single-pass Spark window computation, partitioned by the
series key so state never exceeds one key's rows per task; at 100 TB
the partition column IS the scale story — no window here is global
except where the reference's semantics are global (equity curve over
one account's trades).

Window-over-window compositions (W3 over W2, W6 over W1, W8 over W5)
are staged via chained select/withColumn — nesting two window
aggregates in one projection is invalid (§7.4.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def series_window(key_cols: list[str], ts_col: str, id_col: str | None = None) -> WindowSpec:
    """Canonical ordered per-key window; id tiebreaker keeps every
    downstream frame deterministic under equal timestamps (§7.4.1)."""
    order = [F.col(ts_col).asc()]
    if id_col:
        order.append(F.col(id_col).asc())
    return Window.partitionBy(*key_cols).orderBy(*order)


def trailing(w: WindowSpec, n: int) -> WindowSpec:
    """Trailing-n-rows frame: rowsBetween(-(n-1), 0)."""
    return w.rowsBetween(-(n - 1), Window.currentRow)


def running(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


# --- W1: SMA(n) with warm-up nulls (main.js:217-227) -----------------------
def sma(value: Column | str, w: WindowSpec, n: int) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    avg = F.avg(v).over(trailing(w, n))
    warm = F.row_number().over(w) >= n
    return F.when(warm, avg)


# --- W2: rolling sample stddev (main.js:232) -------------------------------
def rolling_stddev(value: Column | str, w: WindowSpec, n: int) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    sd = F.stddev_samp(v).over(trailing(w, n))
    warm = F.row_number().over(w) >= n
    return F.when(warm, sd)


# --- W3: rolling min (composes over W2's output via staged select) ---------
def rolling_min(value: Column | str, w: WindowSpec, n: int) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    return F.min(v).over(trailing(w, n))


def rolling_max(value: Column | str, w: WindowSpec, n: int) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    return F.max(v).over(trailing(w, n))


# --- W4: highest/lowest + arg-extreme over trailing frame ------------------
def arg_extreme(
    value: Column | str, arg: Column | str, w: WindowSpec, n: int, highest: bool = True
) -> Column:
    """Value of ``arg`` at the max (or min) of ``value`` within the
    trailing-n frame — max_by/min_by as window functions."""
    v = F.col(value) if isinstance(value, str) else value
    a = F.col(arg) if isinstance(arg, str) else arg
    fn = F.max_by if highest else F.min_by
    return fn(a, v).over(trailing(w, n))


# --- W5: local extrema via lag/lead (main.js:322-335) ----------------------
def local_extrema_flags(df: DataFrame, value: str, w: WindowSpec) -> DataFrame:
    """Adds is_local_high / is_local_low: px[i] >= both neighbors (high),
    <= both neighbors (low); series endpoints are never extrema
    (reference loops i in 1..n-2)."""
    v = F.col(value)
    prev, nxt = F.lag(v, 1).over(w), F.lead(v, 1).over(w)
    return df.withColumn(
        "is_local_high", (v >= prev) & (v >= nxt)
    ).withColumn("is_local_low", (v <= prev) & (v <= nxt))


# --- W6/W7: MA slope + trend classification (main.js:242-245) --------------
def slope(col: Column | str, w: WindowSpec, k: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c - F.lag(c, k).over(w)


def trend_label(short_slope: Column, long_slope: Column) -> Column:
    return (
        F.when((short_slope > 0) & (long_slope > 0), F.lit("bullish"))
        .when((short_slope < 0) & (long_slope < 0), F.lit("bearish"))
        .otherwise(F.lit("neutral"))
    )


# --- W9: premium/discount vs window mid (main.js:343-346) ------------------
def premium_discount(value: Column, hi: Column, lo: Column) -> Column:
    return F.when(value >= (hi + lo) / 2, F.lit("premium")).otherwise(F.lit("discount"))


# --- W11: cumulative sum / equity curve (main.js:990-1000) -----------------
def cumulative(value: Column | str, w: WindowSpec) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    return F.sum(v).over(running(w))


# --- W12: lag-1 delta (main.js:559-565) ------------------------------------
def lag_delta(value: Column | str, w: WindowSpec, k: int = 1) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    return v - F.lag(v, k).over(w)


# --- W13: latest-per-key ranking dedup (db.py:391-396) ---------------------
def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """Newest row per key: row_number over (key, ts DESC, id DESC) == 1.
    THE canonical ranking window — J1's left side, D5's latest-wins
    read. One shuffle on the key; at scale prefer pre-bucketing the
    table by the same key to eliminate it."""
    order = [F.col(ts_col).desc()]
    if id_col:
        order.append(F.col(id_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- W14: min-max normalization (web/components/Sparkline.tsx:6-10) --------
def minmax_normalize(value: Column | str, w: WindowSpec, eps: float = 1e-9) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lo, hi = F.min(v).over(frame), F.max(v).over(frame)
    return (v - lo) / F.greatest(hi - lo, F.lit(eps))


# --- hypertable-style continuous rollup -----------------------------------


def hourly_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Materializable hourly pre-aggregate (TimescaleDB-style
    continuous-aggregate shape): per (hour, keys) count / sum / min /
    max. Mergeable partials only, so coarser windows re-aggregate from
    this table without touching raw events."""
    keys = key_cols or []
    return (
        df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def rollup_range_agg(
    rollup: DataFrame,
    start,
    end,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Answer a [start, end) range aggregation FROM the rollup — scans
    hours, not events. Exact for hour-aligned ranges (the mergeable-
    partials contract); the caller owns edge-hour handling for
    unaligned ranges (union the raw-event edges, standard continuous-
    aggregate practice)."""
    keys = key_cols or []
    scoped = rollup.filter(
        (F.col("bucket") >= F.lit(start)) & (F.col("bucket") < F.lit(end))
    )
    return scoped.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").cast("double").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


# --- RSI (Cutler's simple-average form) ------------------------------------
def rsi(value: Column | str, w: WindowSpec, n: int = 14) -> Column:
    """Relative Strength Index over the trailing ``n`` deltas —
    Cutler's simple-average variant (window-expressible; Wilder's
    smoothed form is recursive and lives with the stateful streaming
    EMA). RSI = 100·G/(G+L) where G/L are trailing sums of gains and
    losses; gains/losses accumulate in DECIMAL so both engines sum
    exactly, the final ratio is one double expression. Null during
    warm-up (first n deltas) and on flat windows (G+L = 0)."""
    v = (F.col(value) if isinstance(value, str) else value).cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    delta = v - F.lag(v, 1).over(w)
    gain = F.when(delta > 0, delta).otherwise(zero)
    loss = F.when(delta < 0, -delta).otherwise(zero)
    g = F.sum(gain).over(trailing(w, n)).cast("double")
    l = F.sum(loss).over(trailing(w, n)).cast("double")
    warm = F.row_number().over(w) >= n + 1
    return F.when(warm & ((g + l) > 0), (F.lit(100.0) * g) / (g + l))


# --- Bollinger bands -------------------------------------------------------
def bollinger(
    value: Column | str, w: WindowSpec, n: int = 20, k: float = 2.0
) -> tuple[Column, Column, Column]:
    """(upper, lower, %B) bands: SMA(n) ± k·stddev_samp(n); %B is the
    position of the price inside the band. Mid goes through the exact
    DECIMAL sum; the stddev terms carry float noise so callers round
    them (4 dp, same policy as rolling_stddev)."""
    v = F.col(value) if isinstance(value, str) else value
    mid = (
        F.sum(v.cast("decimal(18,2)")).over(trailing(w, n)).cast("double") / n
    )
    sd = F.stddev_samp(v).over(trailing(w, n))
    warm = F.row_number().over(w) >= n
    upper = F.when(warm, mid + k * sd)
    lower = F.when(warm, mid - k * sd)
    pctb = F.when(warm & (sd > 0), (v - (mid - k * sd)) / ((2 * k) * sd))
    return upper, lower, pctb


# --- EWMA / MACD (bounded-horizon, engine-exact) ---------------------------
def ewma_weights(span: int, horizon: int | None = None) -> list[float]:
    """Truncated exponential weights w_k = (1-α)^k, α = 2/(span+1) —
    the pandas ``ewm(span=..., adjust=True)`` convention cut at
    ``horizon`` terms. Computed ONCE driver-side and embedded as
    literal doubles in BOTH engines' plans, so the window math is pure
    IEEE multiply/add on identical constants — bit-reproducible across
    Spark and any oracle engine, no libm ``pow`` divergence."""
    h = horizon or span
    decay = 1.0 - 2.0 / (span + 1.0)
    w, out = 1.0, []
    for _ in range(h):
        out.append(w)
        w *= decay
    return out


def ewma(value: Column | str, w: WindowSpec, span: int) -> Column:
    """Exponentially-weighted moving average over the trailing ``span``
    rows: Σ w_k·x_{t-k} / Σ w_k with truncated adjust=True weights.

    Window-expressible (no recursion): the trailing values are staged
    through a bounded ``collect_list`` (≤ span elements, rows-frame
    order is the window order) and folded against the literal weight
    array — O(span) per row, shuffle-free beyond the window's own
    partitioning. The infinite-memory recursive EMA lives with the
    stateful streaming operators (streaming/ingest.py); this is the
    batch/backfill form.

    NULL contract: ``collect_list`` silently DROPS null elements, which
    would misalign the weight/denominator indexing against an oracle
    whose ``list()`` keeps them — so nulls are zero-filled here (a null
    tick contributes nothing to the numerator but still occupies its
    weight slot).  An oracle twin must spell the same choice:
    ``list(coalesce(value, 0.0) ...)``.  Testdata has no null values;
    this pins the semantics rather than inheriting collect_list's."""
    v = F.col(value) if isinstance(value, str) else value
    v = F.coalesce(v.cast("double"), F.lit(0.0))
    wts = ewma_weights(span)
    lits = F.array(*[F.lit(x) for x in wts])
    # denominators for partial (warm-up) windows: den[m] = Σ_{k<m} w_k,
    # same fold-left order as the oracle twin
    dens, acc = [], 0.0
    for x in wts:
        acc += x
        dens.append(acc)
    den_lits = F.array(*[F.lit(x) for x in dens])
    arr = F.collect_list(v).over(trailing(w, span))
    rev = F.reverse(arr)
    m = F.size(rev)
    num = F.aggregate(
        F.zip_with(rev, F.slice(lits, 1, m), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc_, x: acc_ + x,
    )
    return num / F.element_at(den_lits, m)


def ewma_pair(
    value: Column | str, w: WindowSpec, fast: int = 12, slow: int = 26
) -> tuple[Column, Column]:
    """Both MACD EWMAs off ONE trailing ``slow``-row collect_list
    (r13): the fast lane's reversed window array is exactly the first
    ``fast`` elements of the slow lane's (a trailing window of a
    prefix is a prefix of the trailing window), so computing both
    spans from one window function halves the Window operator's frame
    processors and per-row array builds vs two separate :func:`ewma`
    calls.  Element order, weight slices, fold order and the partial-
    window denominators are identical to :func:`ewma`, so both columns
    are bit-identical to it (pinned in tests/test_domain_operators)."""
    v = F.col(value) if isinstance(value, str) else value
    v = F.coalesce(v.cast("double"), F.lit(0.0))
    arr = F.collect_list(v).over(trailing(w, slow))
    rev = F.reverse(arr)
    m = F.size(rev)

    def fold(span: int) -> Column:
        wts = ewma_weights(span)
        lits = F.array(*[F.lit(x) for x in wts])
        dens, acc = [], 0.0
        for x in wts:
            acc += x
            dens.append(acc)
        den_lits = F.array(*[F.lit(x) for x in dens])
        mm = F.least(m, F.lit(span))
        num = F.aggregate(
            F.zip_with(
                F.slice(rev, 1, mm), F.slice(lits, 1, mm), lambda a, b: a * b
            ),
            F.lit(0.0),
            lambda acc_, x: acc_ + x,
        )
        return num / F.element_at(den_lits, mm)

    return fold(fast), fold(slow)


def macd(value: Column | str, w: WindowSpec, fast: int = 12, slow: int = 26) -> Column:
    """MACD line = EWMA(fast) − EWMA(slow) (bounded-horizon form)."""
    return ewma(value, w, fast) - ewma(value, w, slow)


def transition_matrix(
    df: DataFrame,
    key_cols: list[str],
    state_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for every (prev_state, next_state) pair of CONSECUTIVE
    events within a key (ordered by the (ts, id) total order), the
    transition count and the row-conditional probability
    P(next | prev) = n / Σ_next n.

    The probability is one double division of two exact longs —
    bit-identical cross-engine.  Scale shape: one shuffle for the
    per-key lag window; the pair aggregate reduces to |states|² tiny
    rows, and the per-prev normalization runs as a window over that
    tiny table (states are low-cardinality by construction — event
    types, page ids, order states)."""
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = df.select(
        F.lag(F.col(state_col), 1).over(w).alias("prev_state"),
        F.col(state_col).alias("next_state"),
    ).filter(F.col("prev_state").isNotNull())
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "next_state",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp).cast("double")).alias(
            "p"
        ),
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detector per key: each tick is
    scored against the mean/sample-stddev of the PREVIOUS ``n`` ticks
    (current row excluded — the monitored point must not contaminate
    its own baseline), and rows with |z| > ``threshold`` are flagged.
    Warm-up rows (< n priors) and zero-variance baselines yield NULL z
    and never flag.

    One shuffle: a single (key, ts, id)-sorted window pass computes
    both trailing moments; the z and the flag are scan-stage
    expressions over them (same shape as W2 rolling_stddev)."""
    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols])
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-n, -1)
    )
    ord_w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    warm = F.row_number().over(ord_w) > n
    # flag on the ROUNDED z so the threshold comparison is
    # engine-portable (a raw-double compare at the boundary could flip
    # on a libm ulp — the embedding_neardup contract)
    z = F.round(F.when(warm & (sd > 0.0), (v - mean) / sd), 6)
    return df.select(
        *key_cols,
        ts_col,
        id_col,
        F.col(value_col),
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )
