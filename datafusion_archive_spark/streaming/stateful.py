"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (``ROADMAP.md:36-56``); this is
the extension-surface pattern for operators Spark's built-in windowed
aggregations can't express: arbitrary per-key state evolved batch by
batch, with timeout-based eviction. The example operator maintains a
per-user running profile (event count, value sum, last-seen timestamp)
and emits the updated profile per micro-batch.

State size is O(distinct keys) and sharded by the stream's groupBy
hash partitioning — the same layout a 1000-executor cluster uses, so
the local test exercises the real shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)


def _update_user_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        mx = int(ts_us.max())
        last_us = mx if last_us is None else max(last_us, mx)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(total, 2)],
            "last_ts_us": [last_us],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Attach the stateful operator to a (streaming) events DataFrame
    keyed by user_id. Works on batch DataFrames too? No — Spark gates
    applyInPandasWithState to streaming; use the batch twin
    (groupBy().agg()) for oracles."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)

HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("counts", T.ArrayType(T.LongType()), False),
    ]
)


def _make_heavy_hitter_fn(k: int, capacity: int):
    """Build the per-group update fn with (k, capacity) baked in —
    applyInPandasWithState passes only (key, pdfs, state)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (lang,) = key
        if state.exists:
            toks, cnts = state.get
            counts = dict(zip(toks, cnts))
        else:
            counts = {}
        for pdf in pdfs:
            for tok in pdf["token"]:
                if tok in counts:
                    counts[tok] += 1
                elif len(counts) < capacity:
                    counts[tok] = 1
                else:
                    # space-saving eviction: replace the current
                    # minimum, inheriting its count (+1) — bounds the
                    # overestimate by the evicted minimum
                    victim = min(counts, key=counts.get)
                    counts[tok] = counts.pop(victim) + 1
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update((
            [t for t, _ in items],
            [c for _, c in items],
        ))
        top = items[:k]
        yield pd.DataFrame(
            {
                "lang": [lang] * len(top),
                "token": [t for t, _ in top],
                "cnt": [c for _, c in top],
            }
        )

    return update


def streaming_heavy_hitters(
    tokens: DataFrame, k: int = 10, capacity: int = 1000
) -> DataFrame:
    """Bounded-state heavy hitters per key (space-saving / Metwally
    top-k): per language, maintain at most ``capacity`` (token, count)
    slots; when full, a new token replaces the current minimum and
    inherits its count — the classic O(capacity)-state sketch whose
    counts are exact whenever ``capacity`` exceeds the distinct-token
    cardinality, and overestimate by at most the evicted minimum
    otherwise. State is sharded by the groupBy hash — O(keys x
    capacity) total, the layout that holds on any cluster size.

    ``tokens`` must be a streaming DataFrame with (lang, token) rows
    (explode upstream); emits the current top-``k`` per key each
    micro-batch.
    """
    return tokens.groupBy("lang").applyInPandasWithState(
        _make_heavy_hitter_fn(k, capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Markov transitions (the incremental twin of the certified
# batch query queries/pipeline4.q_events_transitions)
# ---------------------------------------------------------------------------

TR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("from_type", T.StringType(), False),
        T.StructField("to_type", T.StringType(), False),
    ]
)

TR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType(), False),
        T.StructField("last_event_id", T.LongType(), False),
        T.StructField("last_type", T.StringType(), False),
    ]
)


def _update_transitions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per user: remember the last event across micro-batches and emit
    one (from_type, to_type) row per consecutive pair — including the
    pair that straddles the batch boundary. Rows within a batch are
    sorted by (ts, event_id), the same order the batch twin's lead
    window uses; cross-batch correctness requires the source to
    deliver each user's events in non-decreasing event-time order
    (guaranteed for time-ordered file drops / log segments — the only
    deployment where sequence mining without a reorder buffer is
    sound)."""
    (user_id,) = key
    last = state.get if state.exists else None
    frm: list[str] = []
    to: list[str] = []
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.assign(ts_us=pdf["ts"].astype("int64") // 1000).sort_values(
        ["ts_us", "event_id"]
    )
    for us, eid, etype in zip(
        pdf["ts_us"], pdf["event_id"], pdf["event_type"]
    ):
        if last is not None:
            frm.append(last[2])
            to.append(etype)
        last = (int(us), int(eid), etype)
    if last is not None:
        state.update(last)
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(frm),
            "from_type": frm,
            "to_type": to,
        }
    )


def streaming_transitions(events: DataFrame) -> DataFrame:
    """Attach the transition emitter to a streaming events DataFrame.
    Emits raw (user_id, from_type, to_type) pair rows per micro-batch
    (append semantics); aggregate downstream (or in the sink) to get
    the transition matrix. State is one (ts, event_id, type) triple
    per user — O(users), far below the windowed-agg state of the same
    pipeline."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TR_OUTPUT_SCHEMA,
        stateStructType=TR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


AZ_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("eligible", T.BooleanType(), False),
        T.StructField("anomaly", T.BooleanType(), False),
    ]
)

AZ_STATE_SCHEMA = T.StructType(
    [T.StructField("vals", T.ArrayType(T.DoubleType()), False)]
)

_AZ_WINDOW = 20
_AZ_MIN_PRIORS = 10
_AZ_THRESHOLD = 2.5


def _update_anomaly(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per user: keep the last 20 observed values across micro-batches
    and z-score each arriving event against them — the streaming form
    of the certified batch frame (pipeline6.events_anomaly_zscore:
    ROWS 20 PRECEDING..1 PRECEDING, >= 10 priors, |z| >= 2.5,
    stddev_samp). Same time-ordered-delivery requirement as the
    transition emitter; state is a bounded 20-double ring per user."""
    import math

    (user_id,) = key
    vals: list[float] = list(state.get[0]) if state.exists else []
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.assign(ts_us=pdf["ts"].astype("int64") // 1000).sort_values(
        ["ts_us", "event_id"]
    )
    eids, etypes, els, ans = [], [], [], []
    for eid, etype, value in zip(
        pdf["event_id"], pdf["event_type"], pdf["value"]
    ):
        el = an = False
        if len(vals) >= _AZ_MIN_PRIORS:
            n = len(vals)
            mean = sum(vals) / n
            var = sum((v - mean) ** 2 for v in vals) / (n - 1)
            sd = math.sqrt(var)
            if sd > 0:
                el = True
                an = abs((float(value) - mean) / sd) >= _AZ_THRESHOLD
        eids.append(int(eid))
        etypes.append(etype)
        els.append(el)
        ans.append(an)
        vals.append(float(value))
        if len(vals) > _AZ_WINDOW:
            vals = vals[-_AZ_WINDOW:]
    state.update((vals,))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(eids),
            "event_id": eids,
            "event_type": etypes,
            "eligible": els,
            "anomaly": ans,
        }
    )


def streaming_anomaly_zscore(events: DataFrame) -> DataFrame:
    """Attach the rolling z-score anomaly flagger to a streaming events
    DataFrame (append semantics; aggregate flags downstream). State is
    O(users × 20 doubles) — bounded regardless of stream length,
    sharded by the groupBy hash like every stateful operator here."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_anomaly,
        outputStructType=AZ_OUTPUT_SCHEMA,
        stateStructType=AZ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RD_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("n_types_seen", T.LongType(), False),
    ]
)

RD_STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()), False)]
)


def _update_running_distinct(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per user: the set of event types observed so far; each arriving
    event is stamped with the post-arrival set size — the streaming
    form of the certified batch decomposition
    (pipeline10.window_running_distinct: first-occurrence flag +
    cumulative sum over (ts, event_id) order). Same
    time-ordered-delivery requirement as the transition emitter;
    state is bounded by the TYPE cardinality per user (a small
    enum), never by stream length."""
    (user_id,) = key
    seen = set(state.get[0]) if state.exists else set()
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.assign(ts_us=pdf["ts"].astype("int64") // 1000).sort_values(
        ["ts_us", "event_id"]
    )
    eids, counts = [], []
    for eid, etype in zip(pdf["event_id"], pdf["event_type"]):
        seen.add(etype)
        eids.append(int(eid))
        counts.append(len(seen))
    state.update((sorted(seen),))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(eids),
            "event_id": eids,
            "n_types_seen": counts,
        }
    )


def streaming_running_distinct(events: DataFrame) -> DataFrame:
    """Attach the running COUNT(DISTINCT event_type) stamper to a
    streaming events DataFrame (append semantics). Batch twin:
    queries/pipeline10.q_window_running_distinct (driver-certified)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_distinct,
        outputStructType=RD_OUTPUT_SCHEMA,
        stateStructType=RD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
