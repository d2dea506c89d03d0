"""Structured Streaming integration: the incremental plans must agree with
their batch-defined semantics (queries/streaming_batch.py) when the whole
fixture is replayed through the stream."""

from __future__ import annotations

import shutil

import pytest

from hadoopwebgraph_spark.catalog import load
from hadoopwebgraph_spark.queries.streaming_batch import q50_tumbling_window
from hadoopwebgraph_spark.streaming import streams


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    from .conftest import SF_SMALL

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMALL}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_tumbling_stream_matches_batch(spark, sf_small, events_dir):
    ev = streams.stream_events(spark, events_dir)
    q = streams.run_to_memory(streams.tumbling_counts(ev), "t_tumble", "complete")
    try:
        got = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM t_tumble").collect()
        }
        want = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in q50_tumbling_window(spark, sf_small).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_stream_starts_on_empty_directory(spark, sf_small, tmp_path):
    """A stream may start before its first file arrives: stream_events
    falls back to the catalog's canonical events schema when the batch
    footer read finds zero files, and picks up files that land later."""
    d = tmp_path / "empty_then_filled"
    d.mkdir()
    ev = streams.stream_events(spark, str(d))  # must not raise
    q = streams.run_to_memory(streams.tumbling_counts(ev), "t_late", "complete")
    try:
        assert spark.sql("SELECT * FROM t_late").count() == 0
        shutil.copy(f"{sf_small}/events.parquet", d / "part-0.parquet")
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_late").count()
        want = q50_tumbling_window(spark, sf_small).count()
        assert got == want
    finally:
        q.stop()


def test_socket_source_matches_batch(spark, sf_small):
    """The message-bus seam: events served as newline-delimited JSON over
    a socket (the exact parse path a Kafka `value` takes) must produce
    the same tumbling counts as the batch-defined plan."""
    import socket
    import threading
    import time

    from pyspark.sql import functions as F

    ev = load(spark, sf_small, "events")
    lines = [
        r.js
        for r in ev.select(
            F.to_json(
                F.struct(
                    "event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
                    "user_id",
                    "event_type",
                    "value",
                    "props",
                )
            ).alias("js")
        ).collect()
    ]
    payload = ("\n".join(lines) + "\n").encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def serve():
        conn, _ = srv.accept()
        conn.sendall(payload + b"\n")  # malformed trailing line -> dropped
        done.wait(60)  # keep the connection open while the query drains
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = streams.stream_events(
        spark, {"format": "socket", "options": {"host": "127.0.0.1", "port": port}}
    )
    q = streams.run_to_memory(
        streams.tumbling_counts(stream), "t_sock", "complete"
    )
    try:
        want = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in q50_tumbling_window(spark, sf_small).collect()
        }
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                (r.window_start, r.event_type): (r.n, r.sum_value)
                for r in spark.sql("SELECT * FROM t_sock").collect()
            }
            if got == want:
                break
            time.sleep(0.5)
        assert got == want
    finally:
        done.set()
        q.stop()
        srv.close()


def test_session_stream_runs(spark, events_dir):
    ev = streams.stream_events(spark, events_dir)
    q = streams.run_to_memory(streams.session_counts(ev), "t_sess", "complete")
    try:
        rows = spark.sql("SELECT * FROM t_sess").collect()
        assert len(rows) > 0
        assert all(r.n_events >= 1 for r in rows)
    finally:
        q.stop()


def test_stream_dedup(spark, sf_small, events_dir):
    ev = streams.stream_events(spark, events_dir)
    q = streams.run_to_memory(streams.stream_dedup(ev), "t_dedup", "append")
    try:
        got = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0].n
        want = (
            load(spark, sf_small, "events")
            .select("user_id", "event_type")
            .distinct()
            .count()
        )
        assert got == want
    finally:
        q.stop()


def test_stateful_running_totals(spark, sf_small, events_dir):
    ev = streams.stream_events(spark, events_dir)
    q = streams.run_to_memory(streams.running_user_totals(ev), "t_state", "update")
    try:
        rows = spark.sql("SELECT * FROM t_state").collect()
        assert len(rows) > 0
        batch = (
            load(spark, sf_small, "events")
            .groupBy("user_id")
            .count()
            .collect()
        )
        want = {r.user_id: r["count"] for r in batch}
        got = {r.user_id: r.n_events for r in rows}
        # final state for each user must match the batch count
        assert got == want
    finally:
        q.stop()


def test_transform_with_state_plan_and_processor_logic(spark, sf_small, events_dir):
    """Protobuf-free certification of the transformWithStateInPandas
    operator: (a) the streaming plan constructs with the declared output
    schema; (b) the processor's state machine, driven directly with a
    stub ValueState handle over the real fixture data, reproduces the
    batch count/min/max aggregate exactly. Only the v2 state server's
    wire protocol (Spark's code, not ours) is left to the e2e test
    below, which skips where protobuf is absent."""
    import pandas as pd
    from pyspark.sql import functions as F

    # (a) plan construction + schema
    ev = streams.stream_events(spark, events_dir)
    plan_df = streams.user_value_extremes(ev)
    assert plan_df.isStreaming
    assert plan_df.schema == streams.EXTREMES_OUT_SCHEMA

    # (b) processor logic with a stub handle
    class StubValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class StubHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, StubValueState())

    proc_cls = streams.make_extremes_processor()
    events_pdf = load(spark, sf_small, "events").select("user_id", "value").toPandas()
    got = {}
    for user_id, group in events_pdf.groupby("user_id"):
        proc = proc_cls()
        proc.init(StubHandle())
        # replay in two chunks to exercise state carry-over across calls
        half = max(1, len(group) // 2)
        chunks = [group.iloc[:half], group.iloc[half:]]
        out = None
        for chunk in chunks:
            if len(chunk) == 0:
                continue
            out = pd.concat(list(proc.handleInputRows((user_id,), [chunk], None)))
        proc.close()
        r = out.iloc[-1]
        got[int(user_id)] = (int(r.n_events), float(r.min_value), float(r.max_value))

    batch = (
        load(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("mn"),
            F.round(F.max("value"), 2).alias("mx"),
        )
        .collect()
    )
    want = {r.user_id: (r.n, r.mn, r.mx) for r in batch}
    assert got == want


def test_transform_with_state_extremes(spark, sf_small, events_dir):
    """transformWithStateInPandas (arbitrary-state v2): replaying the full
    fixture must leave each user's ValueState equal to the batch
    count/min/max aggregate.

    The v2 state server speaks protobuf between the JVM and the Python
    driver worker; without the google.protobuf package (absent in this
    container) the query cannot start, so the parity check is gated the
    same way as the multimodal codec stub."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState's state protocol needs protobuf",
    )
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = streams.stream_events(spark, events_dir)
        q = streams.run_to_memory(
            streams.user_value_extremes(ev), "t_tws", "update"
        )
        try:
            rows = spark.sql("SELECT * FROM t_tws").collect()
            assert len(rows) > 0
            got = {r.user_id: (r.n_events, r.min_value, r.max_value) for r in rows}
            batch = (
                load(spark, sf_small, "events")
                .groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(F.min("value"), 2).alias("mn"),
                    F.round(F.max("value"), 2).alias("mx"),
                )
                .collect()
            )
            want = {r.user_id: (r.n, r.mn, r.mx) for r in batch}
            assert got == want
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_stream_interval_join(spark, sf_small, events_dir):
    """Watermarked stream-stream join must match the equivalent batch
    interval join over the full replay."""
    from pyspark.sql import functions as F

    ev = streams.stream_events(spark, events_dir)
    q = streams.run_to_memory(
        streams.purchases_after_views(ev), "t_ssjoin", "append"
    )
    try:
        got = spark.sql("SELECT count(*) AS n FROM t_ssjoin").collect()[0].n
        e = load(spark, sf_small, "events")
        v = e.filter("event_type = 'view'").select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
        )
        p = e.filter("event_type = 'purchase'").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
        )
        want = p.join(
            v,
            F.expr(
                "p_user = v_user AND v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 1 HOUR"
            ),
        ).count()
        assert got == want
    finally:
        q.stop()


def test_custom_python_stream_source_replay(spark, sf_small):
    """The eventreplay custom DataSourceStreamReader must (a) deliver the
    whole log across MULTIPLE micro-batches (offsets advance by
    batchRows), (b) read ranges row-group-pruned on executors, and
    (c) produce stream == batch aggregates."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.streaming.replay_source import (
        register_replay_source,
    )

    register_replay_source(spark)
    path = f"{sf_small}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.format("eventreplay")
        .schema(schema)
        .option("path", path)
        .option("batchRows", 300)
        .option("numPartitions", 3)
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("event_id")).alias("id_sum"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_replay")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        got = {
            r.event_type: (r.n, r.id_sum)
            for r in spark.sql("SELECT * FROM t_replay").collect()
        }
    finally:
        q.stop()
    want = {
        r.event_type: (r.n, r.id_sum)
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("id_sum"))
        .collect()
    }
    assert got == want
    assert n_batches >= 3  # 1000 rows / 300 per trigger -> >= 4 batches


def test_incremental_sessionize_matches_batch(spark, sf_small, events_dir):
    """Full fixture replayed as one micro-batch: the stateful sessionizer's
    emitted rows must equal q136_sessionize's batch output exactly (counts
    and times; value sums to float tolerance — pandas vs JVM sum order)."""
    from hadoopwebgraph_spark.queries.streaming_batch import q136_sessionize

    ev = streams.stream_events(spark, events_dir)
    q = streams.run_to_memory(
        streams.incremental_sessionize(ev), "t_sessionize", "update"
    )
    try:
        got = {
            (r.user_id, r.session_seq): r
            for r in spark.sql("SELECT * FROM t_sessionize").collect()
        }
        want = {
            (r.user_id, r.session_seq): r
            for r in q136_sessionize(spark, sf_small).collect()
        }
        assert set(got) == set(want)
        for k, w in want.items():
            g = got[k]
            assert g.n_events == w.n_events, k
            assert g.session_start == w.session_start, k
            assert g.session_end == w.session_end, k
            # stream side is EXACT integer cents; only the batch side
            # float-sums (error << half a cent before its round(.., 2))
            assert abs(g.total_value - w.total_value) < 0.006, k
    finally:
        q.stop()


def test_incremental_sessionize_state_carryover():
    """Drive the REAL update closure (make_sessionize_update) directly with
    a stub GroupState: replaying a user's events in two chunks must
    finalize the same sessions as one chunk — including a session that
    STRADDLES the chunk boundary."""
    import pandas as pd

    from hadoopwebgraph_spark.streaming.streams import make_sessionize_update

    class StubState:
        def __init__(self):
            self._v, self.exists = None, False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    def ev(ts_minutes, base="2024-01-01 09:00:00"):
        t0 = pd.Timestamp(base)
        return pd.DataFrame(
            {
                "ts": [t0 + pd.Timedelta(minutes=m) for m in ts_minutes],
                "event_id": range(len(ts_minutes)),
                "value": [1.5] * len(ts_minutes),
            }
        )

    update = make_sessionize_update()

    def run(chunks):
        st = StubState()
        rows = {}
        for c in chunks:
            for df in update((7,), iter([c]), st):
                for r in df.itertuples(index=False):
                    rows[(r.user_id, r.session_seq)] = r
        return rows

    # session 1 = minutes 0..60 step 5, 40-min hole, session 2 = 105,110;
    # chunk split at minute 35 (mid-session-1)
    minutes = list(range(0, 61, 5)) + [105, 110]
    one = run([ev(minutes)])
    two = run([ev([m for m in minutes if m <= 35]),
               ev([m for m in minutes if m > 35])])
    assert set(one) == set(two) == {(7, 1), (7, 2)}
    for k in one:
        assert one[k].n_events == two[k].n_events
        assert one[k].session_start == two[k].session_start
        assert one[k].session_end == two[k].session_end
        assert abs(one[k].total_value - two[k].total_value) < 1e-9
    # and the straddling session really did span both chunks
    assert one[(7, 1)].n_events == 13


def test_incremental_sessionize_chunk_invariance_property():
    """Property (hypothesis): for ANY in-order event sequence and ANY
    chunking of it, the finalized sessions equal the one-shot replay —
    the state machine is prefix-composable."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from hadoopwebgraph_spark.streaming.streams import make_sessionize_update

    class StubState:
        def __init__(self):
            self._v, self.exists = None, False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    update = make_sessionize_update(gap_minutes=30)

    def run(chunks):
        st_ = StubState()
        rows = {}
        for c in chunks:
            if len(c) == 0:
                continue
            for df in update((1,), iter([c]), st_):
                for r in df.itertuples(index=False):
                    rows[(r.user_id, r.session_seq)] = (
                        r.n_events, r.session_start, r.session_end,
                        round(r.total_value, 2),
                    )
        return rows

    def mk(minutes):
        t0 = pd.Timestamp("2024-01-01")
        return pd.DataFrame(
            {
                "ts": [t0 + pd.Timedelta(minutes=m) for m in minutes],
                "event_id": range(len(minutes)),
                "value": [float(i) for i in range(len(minutes))],
            }
        )

    @given(
        gaps=st.lists(st.integers(min_value=0, max_value=90), min_size=1, max_size=40),
        cut=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def prop(gaps, cut):
        minutes, t = [], 0
        for g in gaps:
            t += g
            minutes.append(t)
        df = mk(minutes)
        k = cut.draw(st.integers(min_value=0, max_value=len(minutes)))
        k2 = cut.draw(st.integers(min_value=k, max_value=len(minutes)))
        one = run([df])
        three = run([df.iloc[:k], df.iloc[k:k2], df.iloc[k2:]])
        assert one == three

    prop()


def test_incremental_heavy_hitters_chunked_superset():
    """Drive the REAL MG update closure with a stub GroupState over a
    chunked Zipf-ish replay: the FINAL summary must contain every token
    whose full-stream count clears the q143 threshold, despite tokens
    entering, being decremented, and re-entering across chunks."""
    import pandas as pd

    from hadoopwebgraph_spark.functions.text import HH_MG_CAPACITY, HH_PHI_BP
    from hadoopwebgraph_spark.streaming.streams import make_heavy_hitters_update

    class StubState:
        def __init__(self):
            self._v, self.exists = None, False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    toks = []
    for i in range(1, 301):
        toks.extend([f"t{i}"] * max(1, 2000 // (i * i)))
    n = len(toks)
    update = make_heavy_hitters_update(HH_MG_CAPACITY)
    st = StubState()
    final = None
    # interleaved chunks: heavy tokens spread across all chunks
    for c in range(5):
        chunk = pd.DataFrame({"tok": toks[c::5]})
        for df in update((0,), iter([chunk]), st):
            final = df
    exact = pd.Series(toks).value_counts()
    heavy = {t for t, c in exact.items() if c * 10000 >= HH_PHI_BP * n}
    assert heavy, "replay must have heavy tokens"
    assert heavy <= set(final["tok"])
    assert len(final) <= HH_MG_CAPACITY


def test_incremental_heavy_hitters_stream_superset_of_batch(
    spark, sf_small, events_dir
):
    """Full fixture replayed through the stateful operator: the emitted
    candidate union must cover the exact phi-heavy event types computed
    in batch, with bounded state per bucket."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.text import HH_MG_CAPACITY, HH_PHI_BP

    ev = streams.stream_events(spark, events_dir)
    q = streams.run_to_memory(
        streams.incremental_heavy_hitters(
            ev.select(F.col("event_type").alias("tok")), n_buckets=4
        ),
        "t_hh",
        "update",
    )
    try:
        got = spark.sql("SELECT * FROM t_hh").collect()
        cand = {r.tok for r in got}
        per_bucket = {}
        for r in got:
            per_bucket[r.bucket] = per_bucket.get(r.bucket, 0) + 1
        assert all(v <= HH_MG_CAPACITY for v in per_bucket.values())
        b = load(spark, sf_small, "events").groupBy("event_type").count()
        n = b.agg(F.sum("count")).first()[0]
        heavy = {
            r.event_type for r in b.collect() if r["count"] * 10000 >= HH_PHI_BP * n
        }
        assert heavy and heavy <= cand
    finally:
        q.stop()
