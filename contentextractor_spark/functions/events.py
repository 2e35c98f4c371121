"""Event-stream analytics (batch form of the streaming ops).

The reference has no cross-document aggregation at all (SURVEY.md §2.7);
these are the standard time-window / ranking-window / sessionization
operators a corpus-ingest pipeline needs for its event telemetry, each
expressible in ANSI SQL so the driver's DuckDB oracle value-checks them.
The streaming twins (watermarked windows, applyInPandasWithState) live in
streaming/stream.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _value_cents(col):
    """Event values are money-like (2dp); sum them in integer cents so the
    total is exact and association-order-free — a double sum near a 4dp
    rounding boundary can flip between engines (partial aggregation order
    differs), flaking a value-hash gate.  Same pattern as relational._cents."""
    return F.round(col * 100).cast("long")


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows: count + value sum per (hour, event_type)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_value_cents(F.col("value"))).alias("sum_value_c"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds `gap_minutes`.  Pure window functions —
    interval arithmetic on naive timestamps is timezone-free, so the
    identical logic runs in any engine."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = events.withColumn("prev_ts", F.lag("ts").over(w))
    flagged = lagged.withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | F.expr(f"ts - prev_ts > INTERVAL '{gap_minutes}' MINUTE"),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessioned.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("int").alias("session_idx"),
            "n_events",
            "session_start",
            "session_end",
        )
    )


def type_totals_salted(events: DataFrame, n_salts: int = 16) -> DataFrame:
    """Two-phase (salted) aggregation over a LOW-cardinality skewed key:
    with ~5 event types, a naive groupBy("event_type") reduces 10^12 rows
    onto 5 reducer tasks.  Phase 1 groups by (event_type, salt) — n_salts×
    the parallelism with map-side combine; phase 2 merges the tiny partials.
    Result is exactly the plain groupBy (oracle-checked) — the salt is pure
    execution strategy.

    (Extraction handles the same problem for skewed HOSTS by hashing the
    full url; this is the aggregation-side twin.)"""
    salt = F.pmod(F.xxhash64("event_id"), F.lit(n_salts))
    partial = (
        events.groupBy("event_type", salt.alias("salt"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_value_cents(F.col("value"))).alias("v"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("n").alias("n_events"), F.sum("v").alias("sum_value_c")
    )


def asof_latest(events: DataFrame, ref_type: str = "view") -> DataFrame:
    """AS-OF join (an operator Spark lacks natively): for every event, the
    most recent event of `ref_type` by the same user at-or-before its ts.

    Implemented as ONE partition-sort window (carry-forward of the last
    reference row) rather than a range join: a single shuffle on user_id,
    no join, no per-probe scan — the classic scale-safe as-of plan.  At
    equal timestamps the reference row sorts first, matching SQL
    ``ASOF JOIN ... ON probe.ts >= ref.ts`` semantics (a reference event is
    its own match).  DuckDB's native ASOF LEFT JOIN is the oracle.

    Tie invariant (ADVICE r2, corrected r3 after a review found the two
    sides disagreed for a tied ref matching itself): EVERY event at a tied
    (user_id, ts) — including the smaller tied ref — matches the ref with
    max(event_id) at that ts.  Implemented as separate MARKER rows (one
    per ref event) unioned with the probe rows: at equal ts all markers
    sort before all probes and among themselves by event_id asc, so the
    carry-forward's "last seen" is exactly max(event_id) — no dedup
    aggregation needed, still ONE shuffle and zero joins (plan-audited).
    The oracle makes the identical choice (refs pre-deduped to
    max(event_id) per (user_id, ts) before its ASOF join);
    `test_asof_tie_determinism` pins the behavior."""
    # Null-safety contract (r3 review): the oracle's ASOF JOIN predicate
    # (e.user_id = r.user_id AND e.ts >= r.ts) can never match a ref with
    # NULL user_id or NULL ts, so such refs must not produce markers —
    # Spark's partitionBy would otherwise group NULL users together and a
    # NULL-ts marker would sort first and leak into every probe.  Probe
    # rows stay row-preserving regardless (they just get NULL asof cols,
    # exactly what the LEFT ASOF join emits).
    is_ref = (
        (F.col("event_type") == ref_type)
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    # ONE scan: each event row explodes into its probe struct plus, for ref
    # events, a marker struct (a unioned second projection would scan the
    # source twice — r3 review).  The explicit is_marker flag — not a null
    # event_id sentinel — keeps genuine null-event_id input rows in the
    # output (row-preserving contract).
    probe = F.struct(
        F.lit(False).alias("is_marker"),
        F.col("event_id").alias("out_id"),
        F.col("event_id").alias("sort_id"),
        F.lit(None).cast("long").alias("ref_id"),
        F.lit(None).cast("timestamp").alias("ref_ts"),
    )
    marker = F.struct(
        F.lit(True).alias("is_marker"),
        F.lit(None).cast("long").alias("out_id"),
        F.col("event_id").alias("sort_id"),
        F.col("event_id").alias("ref_id"),
        F.col("ts").alias("ref_ts"),
    )
    tagged = events.select(
        "user_id",
        "ts",
        F.explode(
            F.when(is_ref, F.array(probe, marker)).otherwise(F.array(probe))
        ).alias("r"),
    ).select("user_id", "ts", "r.*")
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            F.when(F.col("is_marker"), 0).otherwise(1),
            F.col("sort_id"),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE atomic carry: last(struct) over marker rows only.  Two
    # independent last(col, ignorenulls) calls desync on a marker whose
    # ref_id is NULL — id skipped, ts taken — pairing an id and ts that
    # belong to different events (r3 review).  The struct is NULL exactly
    # on probe rows (skipped) and carried whole on markers, NULL fields
    # included.
    ref = F.last(
        F.when(F.col("is_marker"), F.struct("ref_id", "ref_ts")),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.select(
            "is_marker",
            F.col("out_id").alias("event_id"),
            ref["ref_id"].alias("asof_event_id"),
            ref["ref_ts"].alias("asof_ts"),
        )
        .filter(~F.col("is_marker"))
        .drop("is_marker")
    )


def funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered multi-step funnel: how many users perform step[0], then
    step[1] STRICTLY AFTER their first step[0], then step[2] strictly
    after that, … — the classic conversion query (signup → view →
    purchase) over the events table.

    Semantics: per user, t_1 = min ts of step 1; t_{i+1} = min ts of a
    step-(i+1) event with ts > t_i.  Strict `>` so a step can never
    satisfy two stages with one event at one instant; timestamps compare
    as exact microsecond integers in both engines (no float drift).
    Returns one row per step: (step_idx, step, users reached).

    Scale: stage i is a pushed-down event_type filter (partition-prunable
    on a type-partitioned event log) + a user_id equi-join against the
    previous stage's per-user min — map-side-combinable groupBys, no
    window over the full stream, no driver collect.  The per-step count
    rows each re-evaluate their prefix chain (≤ len(steps) extra filtered
    scans — bounded and tiny next to a sessionize window; localCheckpoint
    would pin the plan builder, which composed callers must not pay)."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    counts = []
    cur = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col("event_type") == step).select(
            "user_id", "ts"
        )
        if cur is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(
                    cur.select("user_id", F.col("t").alias("prev_t")),
                    "user_id",
                )
                .filter(F.col("ts") > F.col("prev_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                "users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def top_users_by_value(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by total event value (deterministic tiebreak on user_id).

    Top-k plan (VERDICT r2 #1): orderBy().limit(k) → TakeOrderedAndProject,
    the distributed per-partition top-k — the old global un-partitioned
    Window.orderBy sorted EVERY user's aggregate on one task.  The rank
    window now covers only the k surviving rows (plan-audited)."""
    totals = events.groupBy("user_id").agg(
        F.sum(_value_cents(F.col("value"))).alias("total_value_c"),
        F.count(F.lit(1)).alias("n_events"),
    )
    order = [F.col("total_value_c").desc(), F.col("user_id").asc()]
    topk = totals.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def retention_cohorts(events: DataFrame, anchor: str = "2024-01-01") -> DataFrame:
    """Cohort retention triangle: (cohort_day, day_offset, users) where
    cohort_day = a user's first active day (integer days since `anchor`)
    and `users` counts the cohort's members active again day_offset days
    later — the classic product-analytics retention matrix, here the
    crawl/labeling-team activity view over the events stream.

    Cross-engine exactness: day indexing is pure DATE arithmetic
    (Spark datediff(to_date(ts), anchor) == DuckDB
    datediff('day', anchor, CAST(ts AS DATE)) — integer, no epoch
    floats, no TZ ambiguity beyond the session-pinned UTC); all
    aggregates are counts.

    Scale: one distinct over (user_id, day) — map-side combinable and
    the row bound is users x days, not events; the cohort table is a
    second groupBy on the SAME user_id key (one exchange reused); the
    join back is keyed on user_id (high-cardinality, uniform).  No
    window over the corpus, no driver collect."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast("long")
    user_days = events.select(
        "user_id", day.alias("day")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        user_days.join(cohorts, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


def hourly_anomalies(events: DataFrame, z: int = 3) -> DataFrame:
    """Hours whose event count deviates from the type's own mean by more
    than `z` sigma — the ops-monitoring outlier sweep (traffic spikes,
    collector outages) run per event_type over the tumbling-hour counts.

    All-integer z-test via cross-multiplication (no sqrt, no floats —
    the pagerank exactness convention):
        (n·c − S)² > z² · (n·ΣC² − S²)
    where n = observed hours for the type, c = this hour's count, S/ΣC²
    the type's count sum / sum of squares.  Equivalent to
    (c − mean)² > z²·var with population variance, but every term stays
    in LongType.  side = sign(n·c − S): +1 spike, −1 trough.  Stats are
    over OBSERVED hours only — silent hours contribute no rows (flag
    collector gaps with a calendar spine upstream if zeros must count).

    Overflow bound: n·ΣC² < 2^63 requires hours·Σc² below ~9.2e18 — at
    1e6 events/hour over a year that is ~1e16, three orders inside; for
    counts beyond ~1e8/hour aggregate per-minute and rescale first
    (raises loudly under ANSI, never wraps).

    Scale: one map-side-combinable groupBy(type, hour), one tiny
    groupBy(type) (cardinality = type count) broadcast back — no window,
    no second pass over raw events."""
    if z < 1:
        raise ValueError("z must be >= 1")
    c = events.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    s = c.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events"))
        .cast("long")
        .alias("_s2"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    j = c.join(F.broadcast(s), "event_type")
    dev = F.col("n_hours") * F.col("n_events") - F.col("_s")
    var_n2 = (
        F.col("n_hours") * F.col("_s2") - F.col("_s") * F.col("_s")
    )
    return (
        j.filter(dev * dev > F.lit(int(z) * int(z)) * var_n2)
        .select(
            "event_type",
            "hour",
            "n_events",
            "n_hours",
            F.signum(dev).cast("long").alias("side"),
        )
    )


def session_paths(
    events: DataFrame, gap_minutes: int = 30, k: int = 3
) -> DataFrame:
    """Top session openings: the first `k` event types of every
    gap-based session, rendered as a '>'-joined path string, counted
    across sessions — the journey-mining rollup (which entry sequences
    dominate) that complements markov_transitions (pairwise, orderless
    beyond adjacency) and funnel (fixed steps chosen up front).

    Determinism: the per-user total order is (ts, event_id) — the
    sessionize convention with the tie rule made explicit; slot values
    come from fixed-slot conditional aggregates (max over CASE rn = i —
    at most one row matches, so the aggregate cannot tie), never an
    order-sensitive string_agg.  concat_ws skips NULL slots in BOTH
    engines, which is exactly the short-session semantics ('a>b' for a
    2-event session at k = 3) — the one place the null-skipping trap
    (the r5 s4 digest lesson) is the wanted behavior, noted here so it
    isn't "fixed".

    Scale: one window pass on the sessionize shuffle key, one
    map-side-combinable groupBy((user, session)) bounded by k matched
    slots, one tiny path-count aggregate."""
    if k < 1:
        raise ValueError("session_paths: k must be >= 1")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = events.withColumn("prev_ts", F.lag("ts").over(w))
    flagged = lagged.withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | F.expr(f"ts - prev_ts > INTERVAL '{gap_minutes}' MINUTE"),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    )
    slots = (
        sessioned.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .groupBy("user_id", "session_idx")
        .agg(
            *[
                F.max(
                    F.when(F.col("rn") == i, F.col("event_type"))
                ).alias(f"t{i}")
                for i in range(1, k + 1)
            ]
        )
    )
    path = F.concat_ws(">", *[F.col(f"t{i}") for i in range(1, k + 1)])
    return slots.select(path.alias("path")).groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


def interarrival_histogram(events: DataFrame) -> DataFrame:
    """Log2-bucketed inter-arrival histogram per event_type: gap =
    microsecond difference between consecutive events of the type in
    (ts, event_id) total order; bucket = bit length of the gap (the
    HLL rho binary-length trick — length(conv(gap, 10, 2)) in Spark ≡
    length(format('{:b}', gap)) in DuckDB; gap 0 → '0' → bucket 1).
    The burstiness/cadence card: collector outages show as mass in
    high buckets, duplicate floods as mass in bucket 1.

    Exactness: epoch microseconds are exact integers in both engines
    (unix_micros ≡ epoch_us — and differences are timezone-free); bit
    length is string length of the binary rendering, the r4 HLL
    convention.  The parquet ts column is TIMESTAMP_NTZ, which
    unix_micros rejects — it is cast to TIMESTAMP first, which
    interprets the naive value in the session timezone: pin it UTC
    (the _events convention) or the absolute epochs shift; the GAPS
    this op aggregates are shift-invariant either way.

    Scale: one window pass partitioned by event_type (low-cardinality
    — for a type-skewed 10^12-row log, sub-partition by (type, day)
    and discard the per-partition first row; the hourly rollup path) +
    one tiny map-side-combinable groupBy."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    g = events.select(
        "event_type", gap.alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy(
        "event_type",
        F.length(F.conv(F.col("gap_us"), 10, 2)).cast("long").alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))


def interval_count_join(
    events: DataFrame,
    anchor_mod: int = 50,
    window_s: int = 5400,
    chunk_s: int = 3600,
) -> DataFrame:
    """Point-in-interval join at scale (the relational operator Spark
    lacks natively without a BroadcastNestedLoopJoin): every %anchor_mod
    event opens a [ts, ts+window_s) observation window for its user;
    count the user's events and distinct event types inside each window
    — the "what happened in the 90 minutes after X" question behind
    incident triage, ad-exposure attribution, and recrawl-impact audits.

    The non-equi range predicate is turned into an EQUI-join by
    chunking time: each interval explodes to the ⌈window/chunk⌉+1 epoch
    chunks it overlaps (a bounded 2-3× fanout), each point maps to its
    single chunk, and the join key is (user_id, chunk) — a plain
    shuffled hash join Catalyst can plan, with the exact range filter
    applied after.  A point's chunk intersects an interval's chunk list
    at most once, so no post-join distinct is needed.

    Exactness: epoch MICROSECONDS on both sides (unix_micros after the
    NTZ→timestamp cast under the UTC-pinned session, DuckDB epoch_us);
    start inclusive, end exclusive; the anchor event itself always
    matches (its own ts = start), so every anchor emits a row.

    Scale: shuffle on (user_id, chunk) — same key-skew story as
    sessionize; fanout is the constant chunk count, never the interval
    length in rows; no broadcast needed on either side (both scale with
    the log), no BNLJ in the plan (plan-audited)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = events.select(
        "event_id", "user_id", "event_type", us.alias("us")
    )
    chunk_us = int(chunk_s) * 1_000_000
    window_us = int(window_s) * 1_000_000
    anchors = ev.filter(F.pmod("event_id", F.lit(anchor_mod)) == 0).select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("us").alias("start_us"),
    )
    a_chunks = anchors.select(
        "anchor_id",
        "user_id",
        "start_us",
        F.explode(
            F.expr(
                f"sequence(start_us div {chunk_us}, "
                f"(start_us + {window_us} - 1) div {chunk_us})"
            )
        ).alias("chunk"),
    )
    points = ev.select(
        "user_id",
        "event_type",
        "us",
        F.expr(f"us div {chunk_s * 1_000_000}").alias("chunk"),
    )
    joined = a_chunks.join(points, ["user_id", "chunk"]).filter(
        (F.col("us") >= F.col("start_us"))
        & (F.col("us") < F.col("start_us") + window_us)
    )
    return joined.groupBy("anchor_id", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, n_pairs, n_from, prob_milli) where
    prob_milli = n_pairs * 1000 div n_from — the user-journey summary
    (which event follows which) that complements funnel (fixed ordered
    steps) and attribution (conversion-anchored).  Consecutive pairs
    only, within a user's (ts, event_id)-ordered stream (the
    recrawl_priority tie convention: the tie-heavy synthetic streams
    need the event_id tiebreak or engines pair different neighbors);
    each user's last event emits no pair.

    Exactness: counts and one non-negative integer division — Spark
    div ≡ DuckDB // throughout.

    Scale: ONE window pass partitioned by user_id (lag of a single
    string column; same shuffle key and skew story as sessionize),
    then a groupBy whose cardinality is |types|² — map-side combine
    collapses the stream before the tiny exchange.  n_from is a window
    sum over the |types|²-row matrix itself, not a second pass over
    the events."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    wfrom = Window.partitionBy("from_type")
    return (
        pairs.withColumn("n_from", F.sum("n_pairs").over(wfrom))
        .withColumn(
            "prob_milli", F.expr("(n_pairs * 1000) div n_from")
        )
    )


def attribution(events: DataFrame, convert_type: str = "purchase") -> DataFrame:
    """First-touch / last-touch conversion attribution: for every user
    whose stream contains a `convert_type` event, find the events
    STRICTLY before their first conversion (in (ts, event_id) order — the
    recrawl_priority tie convention) and credit the conversion to the
    first and last of them.  Output is the attribution matrix
    (first_type, last_type) with converting-user counts and first-
    conversion value in integer cents — the telemetry rollup an ingest
    team reads to see which entry path precedes sign-value events.

    Users whose first event IS the conversion (no prior touches) are
    excluded — there is nothing to attribute (documented, oracle
    matches).  Determinism: rn (row_number over the per-user total
    order) is unique, so min_by/max_by on it cannot tie.

    Scale: one window pass partitioned by user_id (the sessionize
    shuffle key — billions of small per-user partitions, no skew beyond
    per-user event counts), one map-side-combinable groupBy(user), one
    tiny matrix aggregate (cardinality = |types|^2).  No self-join of
    the event stream."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    is_conv = F.when(F.col("event_type") == convert_type, 1).otherwise(0)
    rows = events.select(
        "user_id", "event_type", "value", "ts", "event_id"
    ).select(
        "user_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.sum(is_conv).over(cum).alias("cum_conv"),
    )
    pre = (
        rows.filter(F.col("cum_conv") == 0)
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", "rn").alias("first_type"),
            F.max_by("event_type", "rn").alias("last_type"),
        )
    )
    conv = rows.filter(
        (F.col("event_type") == convert_type) & (F.col("cum_conv") == 1)
    ).select("user_id", _value_cents(F.col("value")).alias("vc"))
    return (
        conv.join(pre, "user_id")
        .groupBy("first_type", "last_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("vc").cast("long").alias("sum_value_c"),
        )
    )


def _tercile_cuts(metrics: DataFrame, col: str) -> DataFrame:
    """One-row (t1, t2) nearest-rank tercile cuts of `col` — the ccnet
    histogram mechanics made global: cumulative window over DISTINCT
    metric values (cardinality bounded by the metric's quantization —
    days / event counts / cents, never the user count times anything),
    so the single-partition window sorts the histogram, not the corpus.
    t1 at ceil(n/3), t2 at ceil(2n/3), identical index arithmetic to
    ccnet_buckets."""
    hist = metrics.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.col(col).alias("v"),
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt")
        .over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    return cum.agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 2) div 3"), F.col("v"))
        ).alias("t1"),
        F.min(
            F.when(F.col("cum") >= F.expr("(2 * n + 2) div 3"), F.col("v"))
        ).alias("t2"),
    )


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM coding (Hughes 1994, the classic CRM segmentation): per user
    recency_days (days between the user's last event and the corpus's
    last day), freq (event count), money_cents (exact integer-cent
    value total), each tercile-coded 1..3 — 3 is best, so recency
    scores INVERT (small gap = recent = 3) — plus the packed rfm code
    r*100 + f*10 + m.  Output: (user_id, recency_days, freq,
    money_cents, r_score, f_score, m_score, rfm).

    Exactness: all-integer (dates subtract to int days, cents sum
    order-free); the cuts are ccnet's nearest-rank order statistics,
    so boundary users land deterministically on both engines.

    Scale: one groupBy(user_id) + one global-max anchor riding a
    one-row broadcast; the three cut pairs are one-row broadcasts from
    distinct-value histograms (window over the histogram, never a
    corpus sort).  money is scored on raw cents here — if cent
    cardinality ever approaches user cardinality, quantize to dollars
    BEFORE the histogram (div 100 is safe on the non-negative totals;
    Spark div truncates vs DuckDB floor on negatives)."""
    day = F.to_date("ts")
    per = events.groupBy("user_id").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(_value_cents(F.col("value"))).alias("money_cents"),
    )
    anchor = events.agg(F.max(day).alias("anchor_day"))
    met = per.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("anchor_day", "last_day").cast("long").alias(
            "recency_days"
        ),
        "freq",
        "money_cents",
    )
    rcut = _tercile_cuts(met, "recency_days").select(
        F.col("t1").alias("rt1"), F.col("t2").alias("rt2")
    )
    fcut = _tercile_cuts(met, "freq").select(
        F.col("t1").alias("ft1"), F.col("t2").alias("ft2")
    )
    mcut = _tercile_cuts(met, "money_cents").select(
        F.col("t1").alias("mt1"), F.col("t2").alias("mt2")
    )
    r_score = (
        F.when(F.col("recency_days") <= F.col("rt1"), F.lit(3))
        .when(F.col("recency_days") <= F.col("rt2"), F.lit(2))
        .otherwise(F.lit(1))
    )
    f_score = (
        F.when(F.col("freq") <= F.col("ft1"), F.lit(1))
        .when(F.col("freq") <= F.col("ft2"), F.lit(2))
        .otherwise(F.lit(3))
    )
    m_score = (
        F.when(F.col("money_cents") <= F.col("mt1"), F.lit(1))
        .when(F.col("money_cents") <= F.col("mt2"), F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        met.crossJoin(F.broadcast(rcut))
        .crossJoin(F.broadcast(fcut))
        .crossJoin(F.broadcast(mcut))
        .select(
            "user_id",
            "recency_days",
            "freq",
            "money_cents",
            r_score.alias("r_score"),
            f_score.alias("f_score"),
            m_score.alias("m_score"),
            (r_score * 100 + f_score * 10 + m_score).alias("rfm"),
        )
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    anchor: str = "2024-01-01",
) -> DataFrame:
    """Per-day active users with a trailing `window_days` rollup: for
    each OBSERVED activity day, (dau, wau = distinct users active in
    the trailing window ending that day, stickiness_milli = dau*1000
    div wau) — the DAU/WAU engagement card over the events stream.

    Spark-first: the (user, day) distinct is the only event-sized
    pass; the trailing window is an EXPLODE of the window_days offsets
    over that deduped table (fanout = users x days x window, never
    events x window), re-deduped per (user, target day), then counted.
    No range self-join, no per-day window over the corpus.

    Cross-engine exactness: day indexing is integer DATE arithmetic
    from `anchor` (the retention_cohorts convention, session TZ pinned
    UTC); all aggregates are counts; stickiness is integer div of
    non-negatives (Spark div == DuckDB //).

    Scale: both groupBys are map-side combinable on (user, day) /
    day keys; fanout is bounded by window_days (a constant).  Gap
    days with zero activity emit no row (dau = 0 rows would report a
    trailing window for a day the stream never saw — a reporting
    choice, documented)."""
    if not 1 <= window_days <= 60:
        raise ValueError("rolling_active_users: window_days in [1, 60]")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast("long")
    user_days = events.select("user_id", day.alias("day")).distinct()
    dau = user_days.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    off = F.explode(
        F.array([F.lit(i).cast("long") for i in range(window_days)])
    )
    contrib = (
        user_days.select("user_id", "day", off.alias("off"))
        .select("user_id", (F.col("day") + F.col("off")).alias("tday"))
        .distinct()
    )
    wau = contrib.groupBy("tday").agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    return (
        dau.join(wau, dau.day == wau.tday)
        .select(
            "day",
            "dau",
            "wau",
            F.expr("dau * 1000 div wau").alias("stickiness_milli"),
        )
    )


def cusum_anomaly(
    events: DataFrame, anchor: str = "2024-01-01", h_means: int = 2
) -> DataFrame:
    """Per-type CUSUM changepoint card over daily event counts — the
    sustained-drift detector that hourly_anomalies' pointwise z-test
    cannot be (a 20% lift spread over a week never trips a z=2 gate on
    any single hour, but its CUSUM climbs every day).

    The textbook recursion S_t = max(0, S_{t-1} + (x_t − k)) is not
    window-expressible, but its closed form IS: S_t = P_t − min_{j≤t}
    P_j with P the prefix sum of (x − k).  With drift k = the per-type
    mean, everything scales by n_days to stay integer: P'_t = Σ
    (n_days·x_j − total) = n_days·P_t, so S'_t = P'_t − running_min(P'_t)
    = n_days·S_t, and the flag S_t > h·mean becomes S'_t > h·total
    exactly.  cusum_milli = S'_t·1000 div total reports S_t in
    milli-mean-days.

    Day axis: observed (event_type, day) buckets ordered by day index
    (datediff from the anchor — the retention convention); an absent
    day contributes no row and no decay, documented, matching the
    oracle.  Scale: one map-side-combinable daily count, two window
    functions over the per-type day series (partition-scoped sort),
    no joins.  Output: (event_type, day, cnt, cusum_milli, flagged)."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast(
        "long"
    )
    daily = events.select(day.alias("day"), "event_type").groupBy(
        "event_type", "day"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wtype = Window.partitionBy("event_type")
    word = wtype.orderBy("day")
    enriched = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(wtype).alias("total"),
        F.count(F.lit(1)).over(wtype).alias("n_days"),
    )
    p = F.sum(
        F.col("n_days") * F.col("cnt") - F.col("total")
    ).over(word.rowsBetween(Window.unboundedPreceding, 0))
    stepped = enriched.withColumn("p", p).withColumn(
        "s",
        F.col("p")
        - F.min("p").over(word.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return stepped.select(
        "event_type",
        "day",
        "cnt",
        F.expr("s * 1000 div total").alias("cusum_milli"),
        (F.col("s") > F.lit(h_means) * F.col("total"))
        .cast("int")
        .alias("flagged"),
    )


def weekday_profile(
    events: DataFrame, anchor: str = "2024-01-01"
) -> DataFrame:
    """Per-type day-of-week seasonality card with a chi-square
    goodness-of-fit test against uniformity — "does this event type
    actually have a weekly rhythm, or is the Monday bump noise?".

    Weekday is pmod(day-index, 7) with day-index = datediff from the
    Monday anchor — NEVER an engine dayofweek() (Spark counts from
    Sunday=1, DuckDB from Sunday=0; the integer arithmetic is shared
    verbatim instead).  All-integer chi²: with E = total/7,
    Σ(O−E)²/E = Σ(7·O_i − total)² / (7·total) over ALL SEVEN cells —
    absent weekdays contribute (7·0 − total)² = total² each, added as
    (7 − n_dows)·total².  chi2_micro orders the division last and
    REFUSES (raise_error) when total > 5e6 (the numerator is bounded
    by 343·total², so that keeps ·10⁶ in LongType); beyond that,
    shard and merge the per-cell numerators.

    Scale: one (type, dow) count, one per-type aggregate.  Output:
    (event_type, total_events, n_dows, chi2_micro)."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast(
        "long"
    )
    dows = events.select(
        "event_type", F.pmod(day, F.lit(7)).alias("dow")
    ).groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("cnt"))
    wtype = Window.partitionBy("event_type")
    per = dows.withColumn("total", F.sum("cnt").over(wtype))
    dev = F.col("cnt") * F.lit(7) - F.col("total")
    agg = per.groupBy("event_type").agg(
        F.max("total").alias("total_events"),
        F.count(F.lit(1)).alias("n_dows"),
        F.sum(dev * dev).alias("_obs_num"),
    )
    num = F.col("_obs_num") + (F.lit(7) - F.col("n_dows")) * F.col(
        "total_events"
    ) * F.col("total_events")
    guarded = F.when(
        F.col("total_events") <= F.lit(5_000_000), num * F.lit(1_000_000)
    ).otherwise(
        F.raise_error(
            F.lit("weekday_profile: total > 5e6 — shard cell numerators")
        ).cast("long")
    )
    return agg.select(
        "event_type",
        "total_events",
        "n_dows",
        guarded.alias("_n6"),
    ).select(
        "event_type",
        "total_events",
        "n_dows",
        F.expr("_n6 div (7 * total_events)").alias("chi2_micro"),
    )


def dispersion_report(
    events: DataFrame, anchor: str = "2024-01-01"
) -> DataFrame:
    """Per-type daily-count dispersion card: Fano factor (variance/mean
    — the Poisson-ness test: ≈1000 milli for a memoryless stream,
    higher = bursty, lower = regular) and lag-1 autocorrelation of the
    observed-day series (the "does yesterday predict today?"
    complement; cusum_anomaly flags WHERE drift happens, this says
    whether the series is drift-prone at all).

    All-integer: with n days, S = Σx, Q = Σx², and scaled deviations
    dev = n·x − S (so Σdev = 0 exactly),
      fano_milli = (n·Q − S²)·1000 div (S·(n−1))   [n·Q ≥ S², so ≥ 0]
      acf1_milli = sign(num)·(|num|·1000 div den), num = Σ dev_t·dev_{t−1},
                   den = Σ dev²
    — the sign is peeled off BEFORE the division (the zipf_fit
    convention: Spark div truncates toward zero, DuckDB // floors, and
    they agree only on non-negative operands).  Degenerate guards:
    single-day series report fano 0; constant series (den = 0) report
    acf1 0.

    Scale: one map-side-combinable daily count, one per-type window
    pass (lag over the observed-day order — absent days are absent,
    the cusum convention), one final aggregate.  Output: (event_type,
    n_days, total_events, mean_milli, fano_milli, acf1_milli)."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast(
        "long"
    )
    daily = events.select(day.alias("day"), "event_type").groupBy(
        "event_type", "day"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wtype = Window.partitionBy("event_type")
    word = wtype.orderBy("day")
    dev = F.col("n") * F.col("cnt") - F.col("s")
    per = (
        daily.select(
            "event_type",
            "day",
            "cnt",
            F.sum("cnt").over(wtype).alias("s"),
            F.count(F.lit(1)).over(wtype).alias("n"),
        )
        .withColumn("dev", dev)
        .withColumn("lagdev", F.lag("dev").over(word))
    )
    agg = per.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.max("s").alias("total_events"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("q"),
        F.coalesce(
            F.sum(F.col("dev") * F.col("lagdev")), F.lit(0)
        ).alias("num"),
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
    )
    return agg.select(
        "event_type",
        "n_days",
        "total_events",
        F.expr("total_events * 1000 div n_days").alias("mean_milli"),
        F.expr(
            "CASE WHEN n_days > 1 THEN (n_days * q - total_events"
            " * total_events) * 1000 div (total_events * (n_days - 1))"
            " ELSE 0L END"
        ).alias("fano_milli"),
        F.expr(
            "CASE WHEN den = 0 THEN 0L"
            " WHEN num >= 0 THEN (num * 1000) div den"
            " ELSE -((-num * 1000) div den) END"
        ).alias("acf1_milli"),
    )


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's reference
# distribution as integer micro-prob LITERALS shared verbatim with the
# oracle (the _POISSON1_CDF_U32 convention: one libm evaluation here,
# never one per engine).
_BENFORD_P_MICRO = tuple(
    int(math.floor(math.log10(1.0 + 1.0 / d) * 1_000_000))
    for d in range(1, 10)
)


def benford_values(events: DataFrame) -> DataFrame:
    """Per-type Benford first-digit test over event values — the
    classic books-cooked / synthetic-data QA card: natural multi-scale
    amounts follow P(d) = log10(1+1/d); flat or operator-generated
    values don't, and the chi² against the Benford reference says
    which stream this is.

    First digit is taken from the INTEGER cents string (substring of a
    long's decimal rendering — exact on both engines; never floats or
    logs on the value itself).  chi² uses the bm25_batch recipe: per
    (type, digit) cell the IDENTICAL float tree
    floor(dev²/E · 1000) with E = total·p_micro/1e6, summed as
    integers; all nine cells participate (a 9-row broadcast digit
    dimension grid-joins observed counts, absent digits count 0).
    Types with no positive-cents values are dropped (E would be 0/0).

    Scale: one (type, digit) count, a 9-row broadcast grid, one
    per-type window total, one final aggregate.  Output: (event_type,
    n_values, chi2_milli)."""
    cents = _value_cents(F.col("value"))
    digits = (
        events.select("event_type", cents.alias("cents"))
        .filter(F.col("cents") >= 1)
        .select(
            "event_type",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
        )
    )
    obs = digits.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).alias("o_raw")
    )
    ddim = F.broadcast(
        events.sparkSession.createDataFrame(
            [(d + 1, p) for d, p in enumerate(_BENFORD_P_MICRO)],
            "digit long, p_micro long",
        )
    )
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(ddim)
        .join(obs, ["event_type", "digit"], "left")
        .withColumn("o", F.coalesce(F.col("o_raw"), F.lit(0)))
    )
    t = F.sum("o").over(Window.partitionBy("event_type"))
    # decimal literals parse as DECIMAL on both engines (the documented
    # DuckDB trap — Spark too): every float constant is CAST(int AS
    # DOUBLE) so the tree stays pure-DOUBLE and engine-identical
    term = (
        "CAST(floor((CAST(o AS DOUBLE) - CAST(t AS DOUBLE)"
        " * CAST(p_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " * (CAST(o AS DOUBLE) - CAST(t AS DOUBLE)"
        " * CAST(p_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " / (CAST(t AS DOUBLE) * CAST(p_micro AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE))"
        " * CAST(1000 AS DOUBLE)) AS BIGINT)"
    )
    return (
        grid.withColumn("t", t)
        .filter(F.col("t") >= 1)
        .withColumn("term_milli", F.expr(term))
        .groupBy("event_type")
        .agg(
            F.max("t").alias("n_values"),
            F.sum("term_milli").alias("chi2_milli"),
        )
    )


def ab_null_check(
    events: DataFrame,
    convert_type: str = "purchase",
    salt: str = "ab",
    within_days: int | None = None,
    anchor: str = "2024-01-01",
) -> DataFrame:
    """A/A experiment harness: hash users into two arms with the salted
    md5 assignment an experimentation system would use, then run the
    standard two-proportion z-test on conversion.  Because BOTH arms
    get the same product, z² should be small — a large value means the
    assignment hash is correlated with behavior (broken bucketing, the
    classic silent A/B-infrastructure bug).  This is the calibration
    row for experiment plumbing, the weighted_sample_eval of the
    events side.

    Arm = u32(md5(salt:user_id)) mod 2 — deterministic, salt-keyed
    (re-salting draws an independent assignment).  The z² float tree
    is IDENTICAL on both engines and floored to milli (the bm25_batch
    recipe; single-row, so there's no aggregation-order concern —
    the floor is pure cross-engine hygiene), with every constant
    CAST(int AS DOUBLE).  Degenerate splits (an empty arm, zero or
    total conversion) report z2_milli 0 rather than dividing by zero.

    within_days bounds conversion to the first N days after the
    anchor (the retention convention) — on a long-enough stream EVERY
    user eventually converts and the unbounded test is vacuous (conv
    == n trips the degenerate guard; measured at the fixture SFs).

    Scale: one per-user aggregate (map-side combinable) + one global
    single-row aggregate.  Output: ONE row (n_a, n_b, conv_a, conv_b,
    z2_milli)."""
    is_conv = F.col("event_type") == convert_type
    if within_days is not None:
        day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor)))
        is_conv = is_conv & (day < within_days)
    users = events.groupBy("user_id").agg(
        F.max(is_conv.cast("long")).alias("conv")
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    agg = users.select(arm.alias("arm"), "conv").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("conv") == 1), 1)
            .otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("conv") == 1), 1)
            .otherwise(0)
        ).alias("conv_b"),
    )
    z2 = (
        "CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0"
        " OR conv_a + conv_b = n_a + n_b THEN 0"
        " ELSE CAST(floor("
        "(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " * (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / ((CAST(conv_a + conv_b AS DOUBLE)"
        " / CAST(n_a + n_b AS DOUBLE))"
        " * (CAST(1 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE)"
        " / CAST(n_a + n_b AS DOUBLE))"
        " * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE)))"
        " * CAST(1000 AS DOUBLE)) AS BIGINT) END"
    )
    return agg.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.expr(z2).alias("z2_milli"),
    )


def forecast_baselines(
    events: DataFrame, anchor: str = "2024-01-01"
) -> DataFrame:
    """Per-type forecast-baseline scorecard over daily counts: WAPE of
    the persistence forecast (predict today = yesterday) vs the
    seasonal-naive forecast (today = same weekday last week).  The
    "do we even have weekly structure worth modeling?" card — if
    lag-7 beats lag-1, weekday_profile's rhythm is real signal; any
    actual forecasting model must beat BOTH baselines to earn its
    keep (the standard M-competition sanity floor).

    Calendar-correct: each baseline is an equi-join on day−1 / day−7
    (NOT a lag over observed rows — a gap day must break the pair,
    not silently shift it).  All-integer: WAPE = Σ|actual−forecast|
    ·1000 div Σactual over the scored days (abs of an integer diff is
    engine-identical; no floats anywhere).

    Scale: one daily count + two self-equi-joins of the per-type day
    series (tiny relative to the event stream), one final aggregate.
    Output: (event_type, n_lag1, wape1_milli, n_lag7, wape7_milli)."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast(
        "long"
    )
    daily = events.select(day.alias("day"), "event_type").groupBy(
        "event_type", "day"
    ).agg(F.count(F.lit(1)).alias("cnt"))

    def scored(lag, tag):
        b = daily.select(
            "event_type",
            (F.col("day") + lag).alias("day"),
            F.col("cnt").alias("fc"),
        )
        j = daily.join(b, ["event_type", "day"])
        return j.groupBy("event_type").agg(
            F.count(F.lit(1)).alias(f"n_lag{tag}"),
            F.sum(F.abs(F.col("cnt") - F.col("fc"))).alias(f"_ae{tag}"),
            F.sum("cnt").alias(f"_act{tag}"),
        )
    s1, s7 = scored(1, 1), scored(7, 7)
    types = daily.select("event_type").distinct()
    return (
        types.join(s1, "event_type", "left")
        .join(s7, "event_type", "left")
        .select(
            "event_type",
            F.coalesce(F.col("n_lag1"), F.lit(0)).alias("n_lag1"),
            F.expr(
                "CASE WHEN _act1 > 0 THEN _ae1 * 1000 div _act1"
                " ELSE 0L END"
            ).alias("wape1_milli"),
            F.coalesce(F.col("n_lag7"), F.lit(0)).alias("n_lag7"),
            F.expr(
                "CASE WHEN _act7 > 0 THEN _ae7 * 1000 div _act7"
                " ELSE 0L END"
            ).alias("wape7_milli"),
        )
    )


def markov_eval(events: DataFrame) -> DataFrame:
    """Predictability scorecard for the SHIPPED markov_transitions
    model (the lsh_eval rule): per from_type, the argmax next-event
    prediction (most-frequent to_type, min-name tiebreak) and its
    in-sample hit rate — 'if we always guessed the modal next event,
    how often would we be right'.  Needs NO second pass over events:
    the matrix already holds n_pairs (hits of the modal guess) and
    n_from (transitions), so the eval is a |types|-row window over the
    matrix itself.

    hit_milli = n_pairs * 1000 div n_from — integer; the row_number
    tiebreak (n_pairs DESC, to_type ASC) is string-deterministic in
    both engines."""
    m = markov_transitions(events)
    w = Window.partitionBy("from_type").orderBy(
        F.col("n_pairs").desc(), "to_type"
    )
    return (
        m.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "from_type",
            F.col("to_type").alias("predicted"),
            F.col("n_from").alias("n_transitions"),
            F.col("n_pairs").alias("n_hits"),
            F.expr("(n_pairs * 1000) div n_from").alias("hit_milli"),
        )
    )


def markov_entropy_rate(events: DataFrame) -> DataFrame:
    """Per-state branching entropy of the SHIPPED markov_transitions
    matrix: H(from) = -sum_to p ln p over the observed next-event
    distribution — the uncertainty companion to markov_eval's modal
    hit rate (hit rate says how often the best guess wins; entropy
    says how hard the guessing problem is, in nats).

    Cross-engine exactness (the lang_source_mi recipe): each cell
    contributes floor((n_pairs / n_from) * ln(n_from / n_pairs) *
    10^6) with the ratio formed from INTEGERS inside one identical
    float tree, floored to micro-nats BEFORE the sum — order-free.
    A deterministic state (one branch) scores exactly 0.

    Scale: a |types|^2-row projection + |types|-row aggregate over
    the already-aggregated matrix — no second events pass (the
    markov_eval rule)."""
    m = markov_transitions(events)
    term = (
        "CAST(floor((CAST(n_pairs AS DOUBLE) / CAST(n_from AS DOUBLE))"
        " * ln(CAST(n_from AS DOUBLE) / CAST(n_pairs AS DOUBLE))"
        " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
    )
    return (
        m.select(
            "from_type",
            "n_from",
            F.expr(term).alias("t"),
        )
        .groupBy("from_type")
        .agg(
            F.max("n_from").alias("n_transitions"),
            F.count(F.lit(1)).alias("n_branches"),
            F.sum("t").alias("h_micro"),
        )
    )


def moments_sketch(events: DataFrame, max_units: int = 2000) -> DataFrame:
    """Mergeable moments sketch per event type: raw power sums S0..S4
    over whole currency units (the summary underlying Gan et al.'s
    moments sketch, VLDB 2018, kept at the power-sum layer where merge
    is plain addition).  Power sums are THE canonical mergeable
    aggregate — two shards' rows merge by summing column-wise, so the
    identical row shape serves map-side combine, cross-shard reduce,
    and a streaming accumulator; mean/variance come back as integer
    ratios: mean_milli = S1*1000 div S0, var_milli =
    (S0*S2 - S1^2) div greatest(S0*S0 div 1000, 1) (the divisor is
    pre-divided by 1000 because S0*S2*1000 can overflow BIGINT at
    sf>=1; truncation direction matches across engines on
    non-negative operands — the r4 div rule).

    Bounds, enforced per row (the packed-key rule: raise, never a
    docstring promise): v_units in [0, max_units]; at the default
    2000, v^4 <= 1.6e13 so S4 stays inside BIGINT up to ~5.7e5
    rows/group — for bigger groups raise the unit size or pre-shard
    the sketch (Spark 4 ANSI mode makes a silent wrap impossible:
    an overflowing sum throws)."""
    v = F.expr("CAST(round(value * 100) AS BIGINT) div 100")
    g = F.when(
        (v < 0) | (v > F.lit(max_units)),
        F.raise_error(
            F.lit(
                "moments_sketch: v_units outside [0, max_units] — raise "
                "the unit size or filter before sketching"
            )
        ).cast("long"),
    ).otherwise(v)
    u = events.select("event_type", g.alias("v"))
    s = u.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).alias("s3"),
        F.sum(
            F.col("v") * F.col("v") * F.col("v") * F.col("v")
        ).alias("s4"),
    )
    return s.select(
        "event_type",
        "s0",
        "s1",
        "s2",
        "s3",
        "s4",
        F.expr("s1 * 1000 div s0").alias("mean_milli"),
        F.expr(
            "(s0 * s2 - s1 * s1) div greatest(s0 * s0 div 1000, 1)"
        ).alias("var_milli"),
    )


def item_similarity(events: DataFrame) -> DataFrame:
    """Item-item cosine similarity over user co-occurrence sets — the
    memory-based collaborative-filtering primitive (Sarwar et al., WWW
    2001): sim(a,b) = |U_a ∩ U_b| / sqrt(|U_a| |U_b|) where U_t is the
    set of users who produced item t (event_type here; swap the column
    for product ids and nothing else changes).

    Exactness: cos_milli = inter * 10^6 div isqrt(n_a * n_b * 10^6) —
    the _isqrt family (float sqrt + two integer corrections, exact
    below 2^52), so NO transcendental and no float sum anywhere.  The
    radicand gets a per-row raise guard at 2^52 (the temperature_mix
    convention); beyond that, downsample users per item first.

    Scale: the distinct (user, item) projection is one map-side
    combinable aggregate; the pair stage is a self-join on user_id
    with per-user fanout k^2 bounded by the per-user distinct-item
    count (here <= |event types|; for open item vocabularies cap
    items per user first — the frequent_pairs rule).  Item sizes ride
    back as two broadcast joins."""
    from .analysis import _isqrt

    ut = events.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(
        F.col("event_type").alias("item_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("item_b"), F.col("n").alias("n_b")
    )
    j = (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
    )
    p = F.col("n_a") * F.col("n_b") * F.lit(1_000_000)
    guarded = F.when(
        p >= F.lit(1 << 52),
        F.raise_error(
            F.lit(
                "item_similarity: isqrt radicand >= 2^52 — downsample "
                "users per item before pairing"
            )
        ).cast("long"),
    ).otherwise(p)
    return j.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "inter",
        F.expr("inter * 1000000").cast("long").alias("_num"),
        _isqrt(guarded).alias("_den"),
    ).select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "inter",
        F.expr("_num div _den").alias("cos_milli"),
    )


def _daily_type_counts(events: DataFrame, anchor: str) -> DataFrame:
    """(event_type, day, cnt): observed daily counts per type on the
    datediff-from-anchor day axis (the cusum/retention convention) —
    shared head of mann_kendall_trend and theil_sen_slope."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast(
        "long"
    )
    return events.select("event_type", day.alias("day")).groupBy(
        "event_type", "day"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def mann_kendall_trend(
    events: DataFrame, anchor: str = "2024-01-01", max_days: int = 1000
) -> DataFrame:
    """Per-type Mann-Kendall monotonic-trend test over daily event
    counts — the nonparametric "is volume drifting?" verdict that
    pairs with cusum_anomaly (CUSUM localizes a level SHIFT;
    Mann-Kendall scores a sustained monotone TREND without assuming
    any distribution).

    ALL-integer, no transcendental anywhere: S = sum over day-ordered
    pairs of sign(cnt_j - cnt_i); the tie-corrected variance is
    var = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18, and the 95%
    normal-approximation verdict with continuity correction
    |z| = (|S|-1)/sqrt(var) > 1.96 cross-multiplies to
    625 * 18 * (|S|-1)^2 > 2401 * var_num  (z = 49/25, the ks/ab
    recipe) — no sqrt, no division at all.  S = 0 never rejects;
    var_num = 0 (all days tied) yields a NULL verdict.

    Scale: the day series per type is ~365 rows/year — the pairwise
    self-join is bounded by max_days^2 PER TYPE (raise-guarded), on
    an equi-join key (event_type) so Spark hash-joins then filters;
    the corpus-size events table is touched once by the daily count."""
    daily = _daily_type_counts(events, anchor)
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    guard = F.when(
        F.col("n_days") > F.lit(max_days),
        F.raise_error(
            F.lit("mann_kendall_trend: exact bound exceeded, subsample")
        ).cast("long"),
    ).otherwise(F.lit(0))
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("cnt").alias("ca")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("cnt").alias("cb")
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            ).cast("long").alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.expr("t * (t - 1) * (2 * t + 5)")
            ).cast("long").alias("tie_sum")
        )
    )
    j = (
        nn.join(s, "event_type", "left")
        .join(ties, "event_type")
        .select(
            "event_type",
            (F.col("n_days") + guard).alias("n_days"),
            F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
            (
                F.expr("n_days * (n_days - 1) * (2 * n_days + 5)")
                - F.col("tie_sum")
            ).alias("var_num"),
        )
    )
    return j.select(
        "event_type",
        "n_days",
        "s_stat",
        "var_num",
        F.when(F.col("var_num") <= 0, F.lit(None).cast("int"))
        .otherwise(
            (
                (F.abs(F.col("s_stat")) > 0)
                & (
                    F.lit(11250)
                    * (F.abs(F.col("s_stat")) - 1)
                    * (F.abs(F.col("s_stat")) - 1)
                    > F.lit(2401) * F.col("var_num")
                )
            ).cast("int")
        )
        .alias("reject_95"),
    )


def theil_sen_slope(
    events: DataFrame, anchor: str = "2024-01-01", max_days: int = 1000
) -> DataFrame:
    """Per-type Theil-Sen trend slope over daily event counts — the
    robust companion to mann_kendall_trend: MK says WHETHER volume
    trends; Theil-Sen says HOW FAST (median of all pairwise slopes,
    immune to the single holiday spike that wrecks an OLS slope).

    Convention (exact cross-engine): each pair's slope quantizes to
    slope_milli = sign-peeled (1000 * dcnt) div dday FIRST (truncating
    integer division — the zipf_fit sign rule), and the reported
    statistic is the med2 of those integers (sum of the two middle
    order statistics, the mad_outliers doubling — slope =
    slope_med2_milli / 2000 events/day).  Median-of-floored differs
    from floored-median by < 1 milli; it is THE documented convention,
    chosen because it keeps every stage integer.

    Types observed on a single day have no pairs and emit NO row
    (documented).  Scale: same bounded pairwise self-join as MK
    (max_days raise guard rides on it); the median runs on a per-type
    slope-value HISTOGRAM (groupBy + cumulative window over histogram
    rows — the spearman rule, never a corpus sort)."""
    daily = _daily_type_counts(events, anchor)
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    guard = F.when(
        F.col("n_days") > F.lit(max_days),
        F.raise_error(
            F.lit("theil_sen_slope: exact bound exceeded, subsample")
        ).cast("long"),
    ).otherwise(F.lit(0))
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("cnt").alias("ca")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("cnt").alias("cb")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            (F.col("cb") - F.col("ca")).alias("dc"),
            (F.col("db") - F.col("da")).alias("dd"),
        )
        .select(
            "event_type",
            F.when(
                F.col("dc") < 0, -F.expr("(1000 * (-dc)) div dd")
            )
            .otherwise(F.expr("(1000 * dc) div dd"))
            .alias("slope"),
        )
    )
    h = pairs.groupBy("event_type", "slope").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("slope").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = h.select(
        "event_type", "slope", F.sum("c").over(w).alias("cum")
    )
    np_ = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    med = (
        cum.join(F.broadcast(np_), "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n_pairs + 1) div 2"),
                        F.col("slope"),
                    )
                )
                + F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n_pairs + 2) div 2"),
                        F.col("slope"),
                    )
                )
            ).alias("slope_med2_milli"),
            F.first("n_pairs").alias("n_pairs"),
        )
    )
    return (
        med.join(nn, "event_type")
        .select(
            "event_type",
            (F.col("n_days") + guard).alias("n_days"),
            "n_pairs",
            "slope_med2_milli",
        )
    )


def cdc_apply(
    changes: DataFrame,
    key_col: str = "key",
    op_col: str = "op",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "id",
    ts_bound: int = 2**42,
) -> DataFrame:
    """MERGE INTO / CDC-apply compaction: collapse a keyed change
    stream of upserts ('U') and deletes ('D') to the final table
    state — the lakehouse merge primitive (Iceberg/Delta MERGE, Hudi
    upsert) every incremental-ingest pipeline ends in.  Per key the
    LATEST record by (ts, id) wins; a key whose latest record is a
    delete is ABSENT from the output (that is the semantics — the
    per-key change/delete counts ride on the surviving rows, and a
    caller auditing deletions diffs key counts against the input).

    Determinism: the change stream is tie-heavy on ts (the
    recrawl_priority lesson), so the total order packs ts*2^20 + id
    (ids unique, so the pack is unique per key and max() IS the
    argmax — the latest_snapshot family); out-of-bounds or null
    ts/id rows raise PER ROW at the packing projection rather than
    silently vanishing from the argmax (max ignores nulls).  The
    guard must be per-row, not an aggregate-side flag: AQE's
    empty-relation propagation can prune the whole join — including
    an aggregate-side raise_error — when the filtered join-back side
    turns out empty at runtime (measured: an all-invalid input
    returned [] instead of raising under the flag form).

    Scale: ONE map-side-combinable groupBy computes the per-key
    winner pack + change counts, then ONE equi-join back on
    (key, pack) retrieves the winning row's op/value — the join is
    keyed on both sides by the same key column, so AQE co-partitions
    it; no window over the change stream, no sort.  Unknown op codes
    raise at the projection (a malformed CDC feed must not be
    silently compacted)."""
    ts = F.col(ts_col).cast("long")
    idc = F.col(id_col).cast("long")
    op = F.col(op_col)
    packed = F.when(
        (ts >= 0)
        & (ts < F.lit(ts_bound))
        & (idc >= 0)
        & (idc < F.lit(2**20)),
        ts * F.lit(2**20) + idc,
    ).otherwise(
        F.raise_error(
            F.lit(
                "cdc_apply: ts/id null or outside packing bounds "
                f"(0<=ts<{ts_bound}, 0<=id<2^20) — re-pack with a "
                "wider shift"
            )
        ).cast("long")
    )
    opv = F.when(op.isin("U", "D"), op).otherwise(
        F.raise_error(F.lit("cdc_apply: unknown op code")).cast("string")
    )
    pk = changes.select(
        F.col(key_col).alias("key"),
        packed.alias("__p"),
        opv.alias("__op"),
        F.col(value_col).alias("__v"),
    )
    checked = pk.groupBy("key").agg(
        F.max("__p").alias("__pmax"),
        F.count(F.lit(1)).alias("n_changes"),
        F.sum((F.col("__op") == "D").cast("long")).alias("n_deletes"),
    )
    winner = checked.join(
        pk.select("key", "__p", "__op", "__v"),
        (checked["key"] == pk["key"]) & (checked["__pmax"] == pk["__p"]),
    ).select(
        checked["key"],
        "n_changes",
        "n_deletes",
        "__op",
        "__v",
        "__pmax",
    )
    return winner.filter(F.col("__op") == "U").select(
        "key",
        F.col("__v").alias(value_col),
        F.shiftright("__pmax", 20).alias("last_ts"),
        (F.col("__pmax") % F.lit(2**20)).alias("last_id"),
        "n_changes",
        "n_deletes",
    )


def kaplan_meier(
    events: DataFrame,
    anchor: str = "2024-01-01",
    censor_days: int = 7,
) -> DataFrame:
    """(t_days, n_risk, n_events, n_censored, log_surv_micro):
    Kaplan-Meier survival curve over user LIFETIMES — lifetime =
    last-activity day − first-activity day; a user whose last activity
    falls in the final `censor_days` days of the observed stream is
    RIGHT-CENSORED (they may still be alive — treating them as churned
    biases survival down, the classic mistake this estimator fixes).
    One row per observed lifetime t: n_risk = users with lifetime ≥ t,
    n_events = churn events (uncensored lifetimes == t), n_censored =
    censored lifetimes == t, and the curve as cumulative LOG-survival
    in integer micro-nats: sum over u ≤ t of floor(ln((n_u−d_u)/n_u)
    * 1e6).  Log-space keeps it cross-engine exact-by-convention (the
    unigram_surprisal micro-nat family: per-step ln of an integer
    ratio quantized BEFORE the sum, integer sums order-free; the 1-ulp
    near-floor-boundary caveat documented there applies per step).
    Rows at or after a step where everyone at risk churns (d == n,
    S = 0, log = −inf) carry NULL log_surv_micro via a cumulative
    zero flag — never a sentinel number.

    Scale: ONE map-side-combinable groupBy to (user, first, last),
    a one-row broadcast crossJoin for the global max day (no
    collect), ONE groupBy to the lifetime grid; the suffix/prefix
    windows run over the GRID (≤ corpus-span days, constant-bounded),
    never over events — the markov_eval free-window pattern."""
    if not 1 <= censor_days <= 365:
        raise ValueError("kaplan_meier: censor_days in [1, 365]")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast("long")
    per_user = events.select("user_id", day.alias("day")).groupBy(
        "user_id"
    ).agg(F.min("day").alias("first"), F.max("day").alias("last"))
    gmax = per_user.agg(F.max("last").alias("__gmax"))
    lives = per_user.crossJoin(F.broadcast(gmax)).select(
        (F.col("last") - F.col("first")).alias("t_days"),
        (F.col("last") >= F.col("__gmax") - F.lit(censor_days - 1))
        .cast("long")
        .alias("is_cens"),
    )
    grid = lives.groupBy("t_days").agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum(F.lit(1) - F.col("is_cens")).cast("long").alias("n_events"),
        F.sum("is_cens").cast("long").alias("n_censored"),
    )
    w_desc = (
        Window.orderBy(F.col("t_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = grid.select(
        "t_days",
        "n_events",
        "n_censored",
        F.sum("c_all").over(w_desc).alias("n_risk"),
    )
    n, d = F.col("n_risk"), F.col("n_events")
    stepped = risk.select(
        "t_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(d == 0, F.lit(0))
        .when(
            n > d,
            F.floor(
                F.log((n - d).cast("double") / n.cast("double")) * 1e6
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("__step"),
        (d >= n).cast("long").alias("__z"),
    )
    w_asc = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return stepped.select(
        "t_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(
            F.max("__z").over(w_asc) == 1, F.lit(None).cast("long")
        )
        .otherwise(F.sum("__step").over(w_asc))
        .alias("log_surv_micro"),
    )


def seasonal_strength(
    events: DataFrame, anchor: str = "2024-01-01", period: int = 7
) -> DataFrame:
    """One-row card (n_days, strength_milli, peak_slot, peak_mean_milli):
    how much of the daily-volume variance the weekly profile explains —
    strength = SS_between / SS_total over daily event counts grouped by
    day-of-week (slot = day % period), the seasonal-strength statistic
    (Hyndman's STL-based measure, reduced to the single-period ANOVA
    form).  strength_milli near 1000 = volume is pure weekday pattern;
    near 0 = the weekday profile explains nothing.  peak_slot = the
    busiest weekday slot (packed argmax, smallest slot on ties).

    Integer staging: with S_w, n_w per slot and S, n, Q = Σy² global,
    SS_between·1000 = Σ_w (S_w²·1000 div n_w) − S²·1000 div n and
    SS_total·1000 = Q·1000 − S²·1000 div n — every division truncated
    at a FIXED point before sums meet (order-free; truncation can push
    the between-term a hair negative, clamped at 0).  All counts —
    engine-exact, no transcendental anywhere.

    Scale: one groupBy to (day, y) — map-side combinable over events —
    then every later aggregate runs on ≤ n_days rows (the markov_eval
    free-window rule)."""
    if not 2 <= period <= 366:
        raise ValueError("seasonal_strength: period in [2, 366]")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit(anchor))).cast("long")
    daily = events.select(day.alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    slots = daily.select(
        F.pmod("day", period).alias("w"), "y"
    ).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_w"),
        F.sum("y").cast("long").alias("s_w"),
    )
    # s_w² · 1000 must stay under 2^63 → s_w < 3e9 events per slot;
    # raise per row (the packed-key loud-refusal convention)
    s_w_ok = F.when(F.col("s_w") < F.lit(3_000_000_000), F.col("s_w")).otherwise(
        F.raise_error(
            F.lit("seasonal_strength: slot volume >= 3e9 — rescale y")
        ).cast("long")
    )
    per_slot = slots.select(
        "w",
        "n_w",
        s_w_ok.alias("s_w"),
    ).select(
        "w",
        "n_w",
        "s_w",
        F.expr("s_w * s_w * 1000 div n_w").alias("b_term"),
        F.expr("s_w * 1000 div n_w").alias("mean_milli"),
    )
    glob = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("q"),
    )
    agg = per_slot.agg(
        F.sum("b_term").cast("long").alias("b_sum"),
        F.max(
            F.col("mean_milli") * F.lit(period)
            + (F.lit(period - 1) - F.col("w"))
        ).alias("__pk"),
    )
    card = glob.crossJoin(F.broadcast(agg))
    return card.select(
        "n_days",
        F.expr(
            "greatest(b_sum - s * s * 1000 div n_days, 0) * 1000"
            " div greatest(q * 1000 - s * s * 1000 div n_days, 1)"
        )
        .cast("long")
        .alias("strength_milli"),
        (F.lit(period - 1) - F.col("__pk") % F.lit(period))
        .cast("int")
        .alias("peak_slot"),
        F.expr(f"__pk div {period}").cast("long").alias("peak_mean_milli"),
    )
