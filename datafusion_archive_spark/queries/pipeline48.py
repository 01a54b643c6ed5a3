"""Pipeline wave 48 (round 5, forty-sixth wave): triple exponential
smoothing — the seasonal member of the forecasting family
(``double_smoothing_forecast`` certifies the trend-only recurrence).

``holt_winters_weekly`` — additive Holt–Winters with a 7-day season,
fit per nation:

    l_t = α(y_t − s_{t−7}) + (1−α)(l_{t−1} + b_{t−1})
    b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
    s_t = γ(y_t − l_t) + (1−γ) s_{t−7}

initialized with l₇ = mean(y₁..₇), b₇ = (mean(y₈..₁₄) −
mean(y₁..₇))/7, s_i = y_i − l₇, and scored by the in-sample
one-step-ahead RMSE of ŷ_t = l_{t−1} + b_{t−1} + s_{t−7}.

The recurrence is non-associative WITH a 9-dimensional carried state
(level, trend, 7 seasonal slots) — the Spark side is a grouped
``applyInPandas`` (one vectorized pass per nation; the nation count
is the parallelism, exactly how fleet forecasting runs thousands of
series), and the oracle is a generated DuckDB recursive CTE whose
state row carries l, b, s1..s7 and rewrites only the active
day-of-cycle slot each step. Same pattern as the clamped-scan wave
(pipeline44) but with a vector state.

The reference has no UDFs-over-groups (``/root/reference/ROADMAP.md``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

_ALPHA = 0.2
_BETA = 0.05
_GAMMA = 0.1
_S = 7


def _daily_by_nation(spark, sf):
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    return (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == cust.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )


_HW_SCHEMA = (
    "nation string, n_days long, final_level double, "
    "final_trend double, rmse_onestep double"
)


def _hw_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("d")
    ys = pdf["y"].to_numpy()
    n = len(ys)
    if n < 2 * _S + 1:
        # too short to initialize two seasonal cycles — drop the
        # group (the oracle's recursion excludes it the same way)
        return pd.DataFrame(
            {
                "nation": pd.Series([], dtype=str),
                "n_days": pd.Series([], dtype="int64"),
                "final_level": pd.Series([], dtype=float),
                "final_trend": pd.Series([], dtype=float),
                "rmse_onestep": pd.Series([], dtype=float),
            }
        )
    l0 = float(ys[:_S].mean())
    b = (float(ys[_S : 2 * _S].mean()) - l0) / _S
    s = [float(ys[i]) - l0 for i in range(_S)]
    lev = l0
    sse = 0.0
    cnt = 0
    for t in range(_S, n):
        p = t % _S
        yhat = lev + b + s[p]
        e = float(ys[t]) - yhat
        sse += e * e
        cnt += 1
        new_lev = _ALPHA * (float(ys[t]) - s[p]) + (1 - _ALPHA) * (
            lev + b
        )
        b = _BETA * (new_lev - lev) + (1 - _BETA) * b
        s[p] = _GAMMA * (float(ys[t]) - new_lev) + (1 - _GAMMA) * s[p]
        lev = new_lev
    return pd.DataFrame(
        {
            "nation": [pdf["nation"].iloc[0]],
            "n_days": [n],
            "final_level": [round(lev, 4)],
            "final_trend": [round(b, 6)],
            "rmse_onestep": [round((sse / cnt) ** 0.5, 4)],
        }
    )


def q_holt_winters_weekly(spark, sf):
    """Per-nation additive Holt–Winters fit + one-step RMSE."""
    return (
        _daily_by_nation(spark, sf)
        .groupBy("nation")
        .applyInPandas(_hw_group, schema=_HW_SCHEMA)
        .orderBy("nation")
    )


QUERIES = {"holt_winters_weekly": q_holt_winters_weekly}


def _hw_oracle() -> str:
    a, bt, g, s = _ALPHA, _BETA, _GAMMA, _S
    # base state at rn = s (0-indexed slot j holds season of day j+1)
    base_s = ", ".join(
        f"(SELECT y FROM seq q WHERE q.nation = i.nation "
        f"AND q.rn = {j + 1}) - i.l0 AS s{j}"
        for j in range(s)
    )
    # recursive step: slot p = (rn - 1) % s is rewritten
    new_s = ", ".join(
        f"CASE WHEN (q.rn - 1) % {s} = {j} "
        f"THEN {g} * (q.y - ({a} * (q.y - st.s{j}) "
        f"+ {1 - a} * (st.l + st.b))) + {1 - g} * st.s{j} "
        f"ELSE st.s{j} END AS s{j}"
        for j in range(s)
    )
    pick = " ".join(
        f"WHEN (q.rn - 1) % {s} = {j} THEN st.s{j}" for j in range(s)
    )
    return f"""
        WITH RECURSIVE daily AS MATERIALIZED (
          SELECT n.n_name AS nation, o.o_orderdate AS d,
                 CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS y
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
        ),
        seq AS MATERIALIZED (
          SELECT nation, y,
                 row_number() OVER (PARTITION BY nation ORDER BY d)
                   AS rn
          FROM daily
        ),
        init AS MATERIALIZED (
          SELECT nation,
                 avg(CASE WHEN rn <= {s} THEN y END) AS l0,
                 (avg(CASE WHEN rn > {s} AND rn <= {2 * s} THEN y END)
                  - avg(CASE WHEN rn <= {s} THEN y END)) / {s} AS b0,
                 max(rn) AS n
          FROM seq GROUP BY 1
        ),
        state AS (
          SELECT i.nation, CAST({s} AS BIGINT) AS rn, i.l0 AS l, i.b0 AS b,
                 {base_s},
                 CAST(0.0 AS DOUBLE) AS sse, CAST(0 AS BIGINT) AS cnt
          FROM init i
          WHERE i.n >= {2 * s + 1}
          UNION ALL
          SELECT q.nation, q.rn,
                 {a} * (q.y - (CASE {pick} END))
                   + {1 - a} * (st.l + st.b) AS l,
                 {bt} * (({a} * (q.y - (CASE {pick} END))
                   + {1 - a} * (st.l + st.b)) - st.l)
                   + {1 - bt} * st.b AS b,
                 {new_s},
                 st.sse + (q.y - (st.l + st.b + (CASE {pick} END))) ** 2
                   AS sse,
                 st.cnt + 1 AS cnt
          FROM state st
          JOIN seq q ON q.nation = st.nation AND q.rn = st.rn + 1
        ),
        final AS (
          SELECT s.*, i.n
          FROM state s JOIN init i ON s.nation = i.nation
          WHERE s.rn = i.n
        )
        SELECT nation,
               CAST(n AS BIGINT) AS n_days,
               round(l, 4) AS final_level,
               round(b, 6) AS final_trend,
               round(sqrt(sse / cnt), 4) AS rmse_onestep
        FROM final
        ORDER BY nation
    """


ORACLES = {"holt_winters_weekly": _hw_oracle()}
