"""Structured Streaming ingestion tests (engine extension; the
reference has no streaming — SURVEY §2.7)."""

import time

import pytest
from pyspark.sql import functions as F

from vechord_spark.streaming.ingest import sessionize, windowed_event_counts


from vechord_spark.sources.testdata import load_table


def _drain(q):
    """Wait for an availableNow query to finish, then ALWAYS stop it.

    awaitTermination(timeout) RETURNS on timeout without stopping the
    query — a straggler would keep polling micro-batches for the rest
    of the pytest session, starving local[4] and compounding into the
    next straggler (measured: the tail of the suite degraded ~20x).
    Stopping in finally guarantees no zombie stream survives a test.
    """
    try:
        assert q.awaitTermination(300), "streaming query did not finish in 300s"
    finally:
        q.stop()


@pytest.fixture()
def events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_windowed_counts_batch(events):
    out = windowed_event_counts(events, window="1 day")
    rows = out.collect()
    assert sum(r.n_events for r in rows) == events.count()
    assert all(r.window_start is not None for r in rows)


def test_sessionize_batch(events):
    out = sessionize(events, gap="1 hour").collect()
    assert sum(r.n_events for r in out) == events.count()
    users = events.select("user_id").distinct().count()
    assert len({r.user_id for r in out}) == users


def test_streaming_windowed_counts(spark, events, tmp_path):
    """Same aggregation through a real stream: file source -> memory sink."""
    src = str(tmp_path / "stream_src")
    events.limit(200).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 day", watermark="2 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql("select sum(n_events) s from evt_counts").collect()[0].s
    assert got == 200


def test_stream_dedup_first_stateful(spark, tmp_path):
    """Custom stateful op (applyInPandasWithState): duplicate content
    across two micro-batches is emitted exactly once."""
    from vechord_spark.streaming.ingest import stream_dedup_first

    src = str(tmp_path / "dedup_src")
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "unique content one")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "The  quick brown FOX!"), (4, "unique content two")],
        "doc_id long, text string",
    )
    b1.write.parquet(src + "/b1")
    b2.write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_dedup_first(stream, state_ttl_ms=0)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql("select * from dedup_out order by doc_id").collect()
    ids = [r.doc_id for r in rows]
    # doc 3 normalizes to doc 1's fingerprint -> dropped
    assert 1 in ids and 2 in ids and 4 in ids
    assert 3 not in ids
    assert len(ids) == 3


def test_stream_to_registry_idempotent_ingest(spark, tmp_path):
    """foreachBatch registry sink: streamed rows land through append
    (serial PKs + unique semantics); re-delivered duplicates are
    dropped under on_conflict='ignore'."""
    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, TableSpec
    from vechord_spark.streaming.ingest import stream_to_registry

    reg = VechordRegistry("stream", str(tmp_path / "store"), spark)
    reg.register(
        TableSpec(
            "docs",
            [Column("doc_id", "long", primary_key=True), Column("text", "string")],
        )
    )
    # pre-existing row 2: the stream re-delivers it and must not dup
    reg.insert_rows("docs", [{"doc_id": 2, "text": "already here"}])

    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [(1, "one"), (2, "already here")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(2, "already here"), (3, "three"), (3, "three")],
        "doc_id long, text string",
    )
    b1.write.parquet(src + "/b1")
    b2.write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_to_registry(
        stream, reg, "docs", str(tmp_path / "ckpt"), on_conflict="ignore"
    )
    # availableNow isn't a stream_to_registry knob; drain then stop
    q.processAllAvailable()
    q.stop()
    rows = sorted((r.doc_id, r.text) for r in reg.load("docs").collect())
    assert rows == [(1, "one"), (2, "already here"), (3, "three")]


def test_stream_to_registry_rejects_bad_mode(spark, tmp_path):
    import pytest

    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, TableSpec
    from vechord_spark.streaming.ingest import stream_to_registry

    reg = VechordRegistry("stream2", str(tmp_path / "store"), spark)
    reg.register(TableSpec("t", [Column("id", "long", primary_key=True)]))
    with pytest.raises(ValueError):
        stream_to_registry(None, reg, "t", "ckpt", on_conflict="merge")


def test_streaming_sessionize_matches_batch(spark, events, tmp_path):
    """session_window through a real stream equals the batch result on
    the same data — the parity the engine's streaming surface promises
    (late data handled by watermark; availableNow drains everything, so
    no rows are late here and the outputs must be identical)."""
    src = str(tmp_path / "sess_src")
    sub = events.limit(300)
    sub.write.parquet(src)
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(spark.read.parquet(src), gap="1 hour").collect()
    }
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize(stream, gap="1 hour")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from sess_out").collect()
    }
    assert streamed == batch


def test_windowed_distinct_users_stream_matches_batch(spark, events, tmp_path):
    """HLL distinct-users per window: the streaming run must equal the
    batch run of the same expression exactly (the sketch is
    deterministic for a given input) — and exact countDistinct is
    what streaming aggregation legitimately cannot do."""
    from vechord_spark.streaming.ingest import windowed_distinct_users

    src = str(tmp_path / "du_src")
    events.limit(500).write.parquet(src)
    batch = windowed_distinct_users(
        spark.read.parquet(src), window="1 day"
    ).collect()
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_distinct_users(stream, window="1 day", watermark="2 days")
        .writeStream.format("memory")
        .queryName("du_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        (r.window_start, r.n_users_approx, r.n_events)
        for r in spark.sql("select * from du_counts").collect()
    }
    want = {(r.window_start, r.n_users_approx, r.n_events) for r in batch}
    assert got == want
    # sketch sanity: estimates within 5% of true per-window cardinality
    exact = {
        (r.w, r.n)
        for r in spark.read.parquet(src)
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("win.start").alias("w"), "n")
        .collect()
    }
    approx = {r.window_start: r.n_users_approx for r in batch}
    for w, n in exact:
        assert abs(approx[w] - n) <= max(1, 0.05 * n)


def test_trending_topk_over_streamed_counts(spark, events, tmp_path):
    """Counts stream into a sink; trending is a rank over the closed
    windows — equal to ranking the batch aggregation directly."""
    from vechord_spark.streaming.ingest import trending_topk

    src = str(tmp_path / "tr_src")
    events.limit(500).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_counts(stream, window="1 day", watermark="2 days")
        .writeStream.format("memory")
        .queryName("tr_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = trending_topk(spark.table("tr_counts"), k=2).collect()
    want = trending_topk(
        windowed_event_counts(spark.read.parquet(src), window="1 day"), k=2
    ).collect()
    key = lambda r: (r.window_start, r.rank)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    assert all(r.rank <= 2 for r in got)


def test_stream_interval_join_matches_batch(spark, events, tmp_path):
    """Watermarked stream-stream range join drained with availableNow
    equals the batch join of the same data — and the plan is a
    stream-stream join with state cleanup (the time-bound condition),
    not an unbounded product."""
    from vechord_spark.streaming.ingest import stream_interval_join

    src = str(tmp_path / "ssj_src")
    events.limit(400).write.parquet(src)
    static = spark.read.parquet(src)
    errors_b = static.filter(F.col("event_type") == "error")
    clicks_b = static.filter(F.col("event_type") == "click")
    batch = {
        (r.interval_id, r.point_id)
        for r in stream_interval_join(errors_b, clicks_b).collect()
    }

    stream = spark.readStream.schema(static.schema).parquet(src)
    errors_s = stream.filter(F.col("event_type") == "error")
    clicks_s = stream.filter(F.col("event_type") == "click")
    q = (
        stream_interval_join(errors_s, clicks_s)
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        (r.interval_id, r.point_id)
        for r in spark.sql("select * from ssj_out").collect()
    }
    assert got == batch and len(batch) > 0


def test_stream_funnel_matches_batch(spark, events, tmp_path):
    """The stateful funnel machine drained over a single-batch stream
    equals the batch higher-order fold (stage_reached is monotone, so
    the last update per user is the final depth)."""
    from vechord_spark.operators.funnel import funnel_stages
    from vechord_spark.streaming.ingest import stream_funnel

    stages = ["view", "click", "purchase"]
    src = str(tmp_path / "fun_src")
    events.limit(800).coalesce(1).write.parquet(src)
    static = spark.read.parquet(src)
    batch = {
        (r.user_id, r.stage_reached)
        for r in funnel_stages(static, "user_id", "ts", "event_type", stages).collect()
    }

    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        stream_funnel(stream, stages, state_ttl_ms=0)
        .writeStream.format("memory")
        .queryName("fun_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        (r.user_id, r.stage_reached)
        for r in spark.sql(
            "select user_id, max(stage_reached) as stage_reached from fun_out group by user_id"
        ).collect()
    }
    assert got == batch and len(batch) > 0


def test_stream_near_dedup_matches_batch_owners(spark, tmp_path):
    """Single-batch stream: every LSH bucket's minimum doc_id owns it
    and every other member emits (doc_id, band, dup_of=owner) — the
    exact event set derivable from batch minhash_bands."""
    from vechord_spark.operators.dedup import minhash_bands
    from vechord_spark.sources.testdata import load_table
    from vechord_spark.streaming.ingest import stream_near_dedup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    # clone some docs so buckets actually collide (near-identical text)
    clones = docs.limit(15).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(clones)
    src = str(tmp_path / "nd_src")
    corpus.coalesce(1).write.parquet(src)
    static = spark.read.parquet(src)

    bands = minhash_bands(static, "doc_id", "text").collect()
    buckets: dict = {}
    for r in bands:
        buckets.setdefault((r.band, r.sig), []).append(r.doc_id)
    expected = {
        (m, band, min(ids))
        for (band, _sig), ids in buckets.items()
        for m in ids
        if len(ids) > 1 and m != min(ids)
    }
    assert expected, "fixture produced no colliding buckets"

    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        stream_near_dedup(stream, state_ttl_ms=0)
        .writeStream.format("memory")
        .queryName("nd_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        (r.doc_id, r.band, r.dup_of)
        for r in spark.sql("select * from nd_out").collect()
    }
    assert got == expected
    # the kill-list contract: distinct non-owner doc_ids
    kill = {d for d, _, _ in got}
    assert all(d >= 100000 or d in {m for m, _, _ in expected} for d in kill)


def test_stream_near_dedup_owner_persists_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the first batch's doc
    owns its buckets; the near-identical doc arriving in batch 2 emits
    dup_of pointing at it — state survives between batches."""
    from vechord_spark.streaming.ingest import stream_near_dedup

    src = tmp_path / "nd2_src"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    spark.createDataFrame([(1, base)], ["doc_id", "text"]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(
        [(2, base + " tail")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(str(src / "b2"))

    schema = spark.read.parquet(str(src / "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_near_dedup(stream, state_ttl_ms=0)
        .writeStream.format("memory")
        .queryName("nd2_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql("select * from nd2_out").collect()
    assert rows, "expected at least one shared bucket between the clones"
    assert all(r.doc_id == 2 and r.dup_of == 1 for r in rows)


def test_gopher_quality_composes_on_stream(spark, tmp_path):
    """gopher_quality is pure Column expressions, so a streaming frame
    flows through it unchanged — streamed report == batch report."""
    from vechord_spark.operators.quality import gopher_quality
    from vechord_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    src = str(tmp_path / "gq_src")
    docs.select("doc_id", "text").coalesce(1).write.parquet(src)
    static = spark.read.parquet(src)
    batch = {tuple(r) for r in gopher_quality(static, "doc_id", "text").collect()}

    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        gopher_quality(stream, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("gq_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {tuple(r) for r in spark.sql("select * from gq_out").collect()}
    assert got == batch and len(batch) == 100


def test_stream_line_dedup_matches_batch_events(spark, tmp_path):
    """Single-batch stream: drop events == every line occurrence past
    the (doc_id, line_no)-first one, derived independently via the
    batch window."""
    from pyspark.sql import Window
    from vechord_spark.streaming.ingest import stream_line_dedup

    corpus = [
        (1, "unique one\nshared footer\n\nunique two"),
        (2, "shared footer\nown line\nshared footer"),
        (3, "shared footer\nunique three"),
    ]
    src = str(tmp_path / "ld_src")
    spark.createDataFrame(corpus, ["doc_id", "text"]).coalesce(1).write.parquet(src)
    static = spark.read.parquet(src)

    lines = (
        static.select(
            "doc_id", F.posexplode(F.split("text", "\n")).alias("line_no", "line")
        )
        .withColumn("line", F.trim("line"))
        .filter(F.col("line") != "")
    )
    w = Window.partitionBy("line").orderBy("doc_id", "line_no")
    ranked = lines.withColumn("rn", F.row_number().over(w)).withColumn(
        "owner", F.first("doc_id").over(w)
    )
    expected = {
        (r.doc_id, r.line_no, r.owner)
        for r in ranked.filter("rn > 1").collect()
    }
    assert expected, "fixture must contain duplicate lines"

    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        stream_line_dedup(stream, state_ttl_ms=0)
        .writeStream.format("memory")
        .queryName("ld_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        (r.doc_id, r.line_no, r.dup_of)
        for r in spark.sql("select * from ld_out").collect()
    }
    assert got == expected


def test_stream_new_docs_matches_batch_anti_join(spark, tmp_path):
    """stream_new_docs must emit exactly the batch anti-join row set:
    bloom-negative rows pass straight through, bloom-positive ones are
    confirmed against the static seen keys per micro-batch."""
    from vechord_spark.operators.bloom import bloom_anti_join
    from vechord_spark.sources.testdata import load_table
    from vechord_spark.streaming.ingest import stream_new_docs

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    fp = F.md5(F.concat_ws(" ", F.slice(F.split(F.lower("text"), "[^a-z0-9]+"), 1, 5)))
    with_fp = docs.select("doc_id", fp.alias("fp"))
    seen = with_fp.filter(F.col("doc_id") % 3 == 0).select("fp")
    new = with_fp.filter(F.col("doc_id") % 3 != 0)

    src = str(tmp_path / "bloom_src")
    new.coalesce(2).write.parquet(src)
    static_new = spark.read.parquet(src)
    expected = {
        r.doc_id for r in bloom_anti_join(static_new, seen, "fp").collect()
    }
    batch_exact = {
        r.doc_id for r in static_new.join(seen, "fp", "left_anti").collect()
    }
    assert expected == batch_exact  # exactness of the batch operator

    stream = spark.readStream.schema(static_new.schema).parquet(src)
    q = (
        stream_new_docs(stream, seen, "fp")
        .writeStream.format("memory")
        .queryName("bloom_new")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {r.doc_id for r in spark.sql("select doc_id from bloom_new").collect()}
    assert got == expected


def test_stream_corpus_funnel_matches_batch(spark, tmp_path):
    """The streaming funnel (new-docs bloom -> Gopher gate -> first-seen
    dedup) must emit exactly the batch pipeline's survivor set on the
    same files: bloom_anti_join -> passes_gopher filter ->
    drop_exact_duplicates."""
    from vechord_spark.functions.text import fingerprint
    from vechord_spark.operators.bloom import bloom_anti_join
    from vechord_spark.operators.dedup import drop_exact_duplicates
    from vechord_spark.operators.quality import gopher_pass_filter
    from vechord_spark.streaming.ingest import stream_corpus_funnel

    good = (
        "the experiment and study with more data "
        + "that is because other results show " * 8
    )
    rows = []
    for i in range(40):
        if i % 5 == 0:
            text = "short junk"  # fails the gate (n_words < 50)
        elif i % 4 == 0:
            text = f"{good} duplicate group {i % 8}"  # intra-batch dupes
        else:
            text = f"{good} unique tail {i}"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # seen corpus: doc_ids 0-9's fingerprints (re-crawls must drop)
    seen_fps = docs.filter("doc_id < 10").select(
        fingerprint("text").alias("fp")
    ).distinct()
    batch_src = docs.filter("doc_id >= 10")

    src = str(tmp_path / "stream_src")
    batch_src.repartition(3).write.parquet(src)
    static = spark.read.parquet(src)

    # batch reference: same three exact layers
    expected = {
        r.doc_id
        for r in drop_exact_duplicates(
            bloom_anti_join(
                static.withColumn("__fp", fingerprint("text")),
                seen_fps.select(F.col("fp").alias("__fp")),
                "__fp",
            )
            .drop("__fp")
            .filter(gopher_pass_filter("text", min_required_words=1)),
            "doc_id",
            "text",
        ).collect()
    }
    assert expected, "test corpus must yield survivors"

    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        stream_corpus_funnel(
            stream,
            seen_fps,
            state_ttl_ms=0,
            gate_kwargs={"min_required_words": 1},
        )
        .writeStream.format("memory")
        .queryName("sfunnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {r.doc_id for r in spark.sql("select doc_id from sfunnel").collect()}
    # first-seen representative per duplicate group may differ between
    # the batch min-id rule and arrival order; compare group-level:
    # same gated-new fingerprint set survives exactly once
    fp_of = {r.doc_id: r.fp for r in static.select(
        "doc_id", fingerprint("text").alias("fp")).collect()}
    assert {fp_of[d] for d in got} == {fp_of[d] for d in expected}
    assert len(got) == len(expected)


def test_stream_to_registry_maintains_indexes(spark, tmp_path):
    """maintain_every: persisted index layouts extend as the stream
    runs — after the stream drains, the IVF and BM25 ledgers are
    current (files_behind 0) and probe/postings searches serve the
    streamed rows without any external maintenance call."""
    import random

    from vechord_spark.registry import VechordRegistry
    from vechord_spark.spec import Column, Keyword, TableSpec, Vector
    from vechord_spark.streaming.ingest import stream_to_registry

    rng = random.Random(41)
    reg = VechordRegistry("streamix", str(tmp_path / "store"), spark)
    reg.register(
        TableSpec(
            "docs",
            [
                Column("doc_id", "long", primary_key=True),
                Column("body", Keyword()),
                Column("vec", Vector(4)),
            ],
        )
    )
    reg.insert_rows(
        "docs",
        [
            {
                "doc_id": i,
                "body": f"seed token{i % 5}",
                "vec": [rng.uniform(-1, 1) for _ in range(4)],
            }
            for i in range(40)
        ],
    )
    reg.build_vector_index("docs", lists=4)
    reg.build_keyword_index("docs")

    src = str(tmp_path / "src")
    for b, lo in enumerate(range(100, 160, 20)):
        spark.createDataFrame(
            [
                (i, "streamed zeppelin", [5.0, 5.0, 5.0, 5.0])
                for i in range(lo, lo + 20)
            ],
            "doc_id long, body string, vec array<float>",
        ).write.parquet(f"{src}/b{b}")
    stream = (
        spark.readStream.schema("doc_id long, body string, vec array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_to_registry(
        stream, reg, "docs", str(tmp_path / "ckpt"), maintain_every=1
    )
    q.processAllAvailable()
    q.stop()

    st = reg.index_stats("docs")
    assert st["ivf"]["files_behind"] == 0 and st["ivf"]["ledger_fresh"]
    assert st["bm25"]["files_behind"] == 0 and st["bm25"]["ledger_fresh"]
    hits = {
        x.doc_id
        for x in reg.search_by_vector(
            "docs", [5.0, 5.0, 5.0, 5.0], topk=10, probes=4
        ).collect()
    }
    assert hits <= set(range(100, 160)) and len(hits) == 10
    kw = {x.doc_id for x in reg.search_by_keyword("docs", "zeppelin").collect()}
    assert kw and kw <= set(range(100, 160))

    with __import__("pytest").raises(ValueError, match="positive"):
        stream_to_registry(stream, reg, "docs", str(tmp_path / "c2"), maintain_every=0)
