"""Structured Streaming layer.

The reference is batch-only (report/report.md:646, "No real time
computations"), so none of this is parity-critical — it extends the
engine the way a production transcript pipeline would run: transcripts
arrive continuously, extraction is incremental (narrow → append mode),
and event-time windowed aggregation with a watermark bounds state for
late data. The same extraction kernel (btd.extract.relations) serves
batch and streaming — one codepath to validate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btd.extract.relations import extract_triples
from btd.schema import TRANSCRIPTS


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript parquet (schema enforced —
    streaming sources never infer)."""
    return spark.readStream.schema(TRANSCRIPTS).parquet(path)


def stream_extract_triples(transcripts: DataFrame) -> DataFrame:
    """Incremental KG extraction: stateless/narrow, so append-mode with
    no watermark needed; each micro-batch extracts independently."""
    return extract_triples(transcripts)


def windowed_turn_counts(
    transcripts: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time turns-per-conversation-per-window with a watermark
    bounding state: late rows beyond the watermark are dropped, state
    for closed windows is evicted — the thing that makes this runnable
    forever at 10^12-turn scale."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide or window).alias("w"),
            "conv_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            # exact distinct aggs are unsupported on streaming DFs;
            # approx (HLL) is the streaming-native answer
            F.approx_count_distinct("role").alias("n_roles"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id",
            "n_turns",
            "n_roles",
        )
    )


def sessionize_stream(transcripts: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: gap-based sessionization per
    conversation via ``applyInPandasWithState`` (update mode).

    State per conv_id = the open session (index, count, bounds). Each
    micro-batch is processed vectorized (pandas diff/cumsum — no
    per-row Python beyond the final small groupby); closed sessions
    are emitted once, the open session is re-emitted on every update.
    This is the operator shape for any custom streaming aggregation
    Spark lacks natively (north-rule 'custom stateful operators').
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = pd.Timedelta(minutes=gap_minutes)
    out_schema = (
        "conv_id string, session_idx int, n_turns long, "
        "start_ts timestamp, end_ts timestamp"
    )
    state_schema = "session_idx int, n_turns long, start_ts timestamp, end_ts timestamp"

    def fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.exists:
            si, n, st_, en = state.get
            st_, en = pd.Timestamp(st_), pd.Timestamp(en)
        else:
            si, n, st_, en = 0, 0, None, None
        ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values().reset_index(
            drop=True
        )
        rows = []
        if len(ts):
            # vectorized session boundaries within the batch. Gap test
            # on SECOND-floored timestamps — the batch twin
            # (btd.dataops.sessions, unix_timestamp) and the SQL
            # oracles (floor(epoch(ts))) compare whole seconds, so
            # sub-second data must not split sessions differently here
            tsf = ts.dt.floor("s")
            new_sess = tsf.diff() > gap
            if en is not None:
                new_sess.iloc[0] = (
                    tsf.iloc[0] - pd.Timestamp(en).floor("s")
                ) > gap
            sess_of = new_sess.cumsum()
            for s_off, grp in ts.groupby(sess_of):
                if s_off == 0 and en is not None:
                    # continuation of the open session
                    n += len(grp)
                    en = grp.iloc[-1]
                else:
                    if n:  # close the previous session
                        rows.append((conv_id, si, n, st_, en))
                        si += 1
                    n, st_, en = len(grp), grp.iloc[0], grp.iloc[-1]
        state.update((int(si), int(n), st_, en))
        rows.append((conv_id, si, n, st_, en))  # open session, update-mode
        yield pd.DataFrame(
            rows,
            columns=["conv_id", "session_idx", "n_turns", "start_ts", "end_ts"],
        )

    return transcripts.groupBy("conv_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_materialize_triples(
    transcripts: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Continuous KG materialization: streaming extraction appended to a
    predicate-partitioned parquet table with exactly-once semantics.

    The file sink's write-ahead log in ``checkpoint_dir`` makes restarts
    resume at the last committed micro-batch — the streaming form of the
    pipeline's manifest-based stage resume. Returns the started query;
    caller drains (processAllAvailable) or runs it continuously.
    """
    return (
        stream_extract_triples(transcripts)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("pred")
        .start()
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "append") -> None:
    """Drain all available input synchronously into a memory sink —
    the local smoke path (production uses kafka/iceberg sinks with
    checkpointLocation)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def dedup_stream(transcripts: DataFrame) -> DataFrame:
    """Streaming exact deduplication: first occurrence of each
    (conv_id, turn_idx) wins, later duplicates are dropped against the
    streaming state store — the incremental form of the batch
    dropDuplicates the curation chain runs. Unbounded state without a
    watermark; production pairs this with ``withWatermark`` on ts so
    keys older than the horizon are evicted (exactness then holds for
    duplicates arriving within the watermark, which is the delivery
    guarantee a replayed transcript log actually needs).
    """
    return transcripts.dropDuplicates(["conv_id", "turn_idx"])


def response_join_stream(
    transcripts: DataFrame,
    window_seconds: int = 1800,
    watermark: str = "60 minutes",
) -> DataFrame:
    """Stream-stream inner self-join — the canonical two-stream shape:
    every user turn joined to its conversation's assistant turns
    arriving within ``window_seconds`` after it ("which responses
    answer this prompt").

    BOTH sides carry an event-time watermark and the join predicate
    time-bounds a_ts within [u_ts, u_ts + window]; together these let
    Spark evict buffered join state once the watermark passes a row's
    reachable window — bounded state forever, the requirement for
    running a join over a 10^12-turn stream. Append mode: each match
    is emitted exactly once, when both sides have arrived.
    """
    u = (
        transcripts.where(F.col("role") == "user")
        .select(
            F.col("conv_id").alias("u_conv_id"),
            F.col("turn_idx").alias("u_turn_idx"),
            F.col("ts").alias("u_ts"),
        )
        .withWatermark("u_ts", watermark)
    )
    a = (
        transcripts.where(F.col("role") == "assistant")
        .select(
            F.col("conv_id").alias("a_conv_id"),
            F.col("turn_idx").alias("a_turn_idx"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", watermark)
    )
    return u.join(
        a,
        F.expr(
            "u_conv_id = a_conv_id AND a_ts >= u_ts "
            f"AND a_ts <= u_ts + interval {window_seconds} seconds"
        ),
    )


def enrich_stream(transcripts: DataFrame, tool_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each streaming turn gains its
    tool's dimension attributes. The static side is re-read per
    micro-batch and broadcast (dimension ≪ stream); no state store —
    the canonical fact-stream × dim-table shape."""
    from pyspark.sql import functions as F

    return transcripts.join(F.broadcast(tool_dim), "tool", "left")


def zscore_anomaly_stream(
    events: DataFrame, threshold: float = 2.0
) -> DataFrame:
    """Custom stateful operator #2: RUNNING per-user z-score anomalies
    over an event stream via ``applyInPandasWithState`` (append mode) —
    the online twin of btd.temporal.zscore_outliers. Each event is
    scored against the user's history SO FAR (prior events only, by
    (ts, event_id) order): z = (value − mean_prior) / stddev_prior
    (sample), emitted once when |z| > threshold and at least 2 prior
    events exist with positive variance — the alert an agent-runaway /
    fraud monitor raises the moment the spike arrives, not at window
    close.

    State per user = true Welford moments (n, mean, M2): three scalars,
    so state size is O(users), never O(events) — the bound that lets
    this run forever. Per batch the expanding stats are vectorized as
    SHIFTED-ORIGIN cumulative sums (origin K = the running mean, so the
    summed terms are O(deviation²), not O(value²) — the naive Σv²
    formulation's catastrophic cancellation at large magnitudes could
    yield a tiny positive variance where the oracle's stable
    STDDEV_SAMP is exactly 0, flipping the var>0 emission predicate;
    with the shift, an all-constant history gives var = 0 EXACTLY),
    shifted one row for the PRIOR frame; no per-row Python. The exact
    SQL twin is an expanding window (ROWS UNBOUNDED PRECEDING AND
    1 PRECEDING) with the same n≥2 / s>0 guards. Cross-batch
    determinism needs batches arriving in event-time order per user
    (one micro-batch for the gate's static replay — same caveat as
    sessionize_stream).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "event_id long, user_id long, value double, z double, "
        "n_prior long"
    )
    state_schema = "n long, mean double, m2 double"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        n0, mean0, m20 = state.get if state.exists else (0, 0.0, 0.0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            yield pd.DataFrame(
                columns=["event_id", "user_id", "value", "z", "n_prior"]
            )
            return
        # NULL values neither score nor enter state — the SQL twin's
        # COUNT(value)/AVG/STDDEV_SAMP all skip NULLs, and one NaN
        # would otherwise poison the running moments forever
        pdf = (
            pdf[pdf["value"].notna()]
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        if not len(pdf):
            yield pd.DataFrame(
                columns=["event_id", "user_id", "value", "z", "n_prior"]
            )
            return
        v = pdf["value"].astype("float64").to_numpy()
        # shift the origin to the running mean (first value for a new
        # user): the cumulants below are then sums of O(deviation)
        # terms — Welford-equivalent stability, still fully vectorized
        K = mean0 if n0 > 0 else v[0]
        d = v - K
        # prior-frame cumulants: state re-centered to K + in-batch
        # cumulative shifted by one row
        cs0 = n0 * (mean0 - K)
        css0 = m20 + n0 * (mean0 - K) ** 2
        cs = np.concatenate(([0.0], np.cumsum(d)[:-1])) + cs0
        css = np.concatenate(([0.0], np.cumsum(d * d)[:-1])) + css0
        n = np.arange(len(v), dtype="int64") + n0
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = cs / n + K
            var = (css - cs * cs / n) / (n - 1)
            z = (v - mean) / np.sqrt(var)
        ok = (n >= 2) & (var > 0) & (np.abs(z) > threshold)
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"][ok],
                "user_id": user_id,
                "value": v[ok],
                "z": z[ok].round(6),
                "n_prior": n[ok],
            }
        )
        # fold the batch into true Welford state (n, mean, M2)
        nT = n0 + len(v)
        csT = cs0 + d.sum()
        cssT = css0 + (d * d).sum()
        meanT = csT / nT + K
        m2T = cssT - csT * csT / nT
        state.update((int(nT), float(meanT), float(m2T)))
        yield out

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
