package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailyAvgStream on a MemoryStream aggregates per day with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
    val q = EventStream.startDailyToMemory(df, "daily_test")
    try {
      mem.addData(
        (ts("2024-03-01 10:00:00"), 10.0),
        (ts("2024-03-01 14:00:00"), 20.0),
        (ts("2024-03-02 09:00:00"), 30.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM daily_test").collect()
        .map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2))).toSet
      assert(out == Set(("2024-03-01", 15.0, 2L), ("2024-03-02", 30.0, 1L)))
      // late-but-within-watermark event updates its day bucket
      mem.addData((ts("2024-03-01 18:00:00"), 30.0))
      q.processAllAvailable()
      val upd = spark.sql("SELECT * FROM daily_test")
        .groupBy("day").agg(max("n").as("n"))
        .filter($"day" === "2024-03-01").collect()(0).getLong(1)
      assert(upd == 3L)
    } finally q.stop()
  }

  test("dailyAvgStream transform gives identical results on a batch input") {
    val batch = Seq(
      (ts("2024-03-01 10:00:00"), 10.0),
      (ts("2024-03-01 14:00:00"), 20.0),
      (ts("2024-03-02 09:00:00"), 30.0)).toDF("ts", "value")
    val out = EventStream.dailyAvgStream(batch).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2))).toSet
    assert(out == Set(("2024-03-01", 15.0, 2L), ("2024-03-02", 30.0, 1L)))
  }

  test("dedupStream drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val q = EventStream.dedupStream(mem.toDF().toDF("k", "ts", "v"), "k")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        ("a", ts("2024-03-01 10:00:00"), 1.0),
        ("a", ts("2024-03-01 10:00:05"), 2.0), // dup key within watermark
        ("b", ts("2024-03-01 10:01:00"), 3.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT k, v FROM dedup_test").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(out == Set(("a", 1.0), ("b", 3.0)))
    } finally q.stop()
  }

  test("dedupStream on a batch input falls back to plain key dedup") {
    val batch = Seq(
      ("a", ts("2024-03-01 10:00:00"), 1.0),
      ("a", ts("2024-03-01 10:00:05"), 2.0),
      ("b", ts("2024-03-01 10:01:00"), 3.0)).toDF("k", "ts", "v")
    assert(EventStream.dedupStream(batch, "k").count() == 2)
  }

  test("sessionize: gap closes a session; idle sessions close on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.SessionIn]
    val q = EventStream.sessionize(spark, mem.toDS())
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      mem.addData(
        EventStream.SessionIn(1L, ts("2024-03-01 10:00:00"), 1.0),
        EventStream.SessionIn(1L, ts("2024-03-01 10:10:00"), 2.0),
        EventStream.SessionIn(2L, ts("2024-03-01 12:00:00"), 5.0))
      q.processAllAvailable()
      // user 1 went idle: the batch-1 watermark (12:00 - 10 min lateness
      // = 11:50) passes its gap timeout (10:10 + 30 min = 10:40), so the
      // session closes VIA TIMEOUT and its state is removed; user 2
      // (timeout 12:30) is still open
      assert(spark.sql("SELECT * FROM sessions_test").count() == 1)
      // 13:00 advances the watermark to 12:50, past user 2's idle
      // timeout → user 2 emits and its state is removed (bounded store)
      mem.addData(EventStream.SessionIn(1L, ts("2024-03-01 13:00:00"), 9.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM sessions_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(out.contains((1L, 2L, 10.0, 3.0)))
      assert(out.contains((2L, 1L, 0.0, 5.0)))
      assert(out.length == 2) // user 1's 13:00 session is still open
    } finally q.stop()
  }

  test("sessionize runs unchanged on the RocksDB state store (production backend)") {
    // the default HDFS-backed store keeps all state on the JVM heap; at
    // real scale (millions of open sessions per executor) the RocksDB
    // provider is the production choice — state spills off-heap/disk with
    // incremental checkpoints. Same operator, same results, one conf.
    implicit val sqlCtx = spark.sqlContext
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[EventStream.SessionIn]
    val q = EventStream.sessionize(spark, mem.toDS())
      .writeStream.format("memory").queryName("sessions_rocks")
      .outputMode("append").start()
    try {
      mem.addData(
        EventStream.SessionIn(1L, ts("2024-03-01 10:00:00"), 1.0),
        EventStream.SessionIn(1L, ts("2024-03-01 10:10:00"), 2.0),
        EventStream.SessionIn(2L, ts("2024-03-01 12:00:00"), 5.0))
      q.processAllAvailable()
      mem.addData(EventStream.SessionIn(1L, ts("2024-03-01 13:00:00"), 9.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM sessions_rocks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      // identical to the default-provider test above
      assert(out.contains((1L, 2L, 10.0, 3.0)))
      assert(out.contains((2L, 1L, 0.0, 5.0)))
      assert(out.length == 2)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  test("streaming upsert sink merges each micro-batch into the parquet target") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.startUpsertSink(
      mem.toDF().toDF("k", "v"), Seq("k"), s"$dir/data", s"$dir/ckpt")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((2L, "B"), (3L, "C")) // 2 updated, 3 inserted
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/data").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((1L, "a"), (2L, "B"), (3L, "C")))
      // duplicate-keyed rows within ONE batch collapse to a single winner
      // (one-row-per-key contract), and no swap leftovers remain
      mem.addData((4L, "x"), (4L, "y"))
      q.processAllAvailable()
      val after = spark.read.parquet(s"$dir/data").collect()
        .map(r => r.getLong(0)).groupBy(identity).view.mapValues(_.length)
      assert(after(4L) == 1)
      assert(!new java.io.File(s"$dir/data__backup").exists)
      assert(!new java.io.File(s"$dir/data__staging").exists)
    } finally q.stop()
  }

  test("upsert sink restarts from its checkpoint without losing or duplicating") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    val mem = MemoryStream[(Long, String)]
    val q1 = EventStream.startUpsertSink(
      mem.toDF().toDF("k", "v"), Seq("k"), s"$dir/data", s"$dir/ckpt")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart against the SAME checkpoint: the committed offset means
    // batch 0 is not re-delivered; new data continues from there
    mem.addData((2L, "B"), (3L, "c"))
    val q2 = EventStream.startUpsertSink(
      mem.toDF().toDF("k", "v"), Seq("k"), s"$dir/data", s"$dir/ckpt")
    try {
      q2.processAllAvailable()
      val out = spark.read.parquet(s"$dir/data").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((1L, "a"), (2L, "B"), (3L, "c")))
    } finally q2.stop()
  }

  test("sessionize batch mode closes on gap and flushes trailing sessions") {
    import spark.implicits._
    val ds = Seq(
      EventStream.SessionIn(1L, ts("2024-03-01 10:00:00"), 1.0),
      EventStream.SessionIn(1L, ts("2024-03-01 10:10:00"), 2.0),
      EventStream.SessionIn(1L, ts("2024-03-01 13:00:00"), 9.0),
      EventStream.SessionIn(2L, ts("2024-03-01 12:00:00"), 5.0)).toDS()
    val out = EventStream.sessionize(spark, ds).collect()
      .map(o => (o.user_id, o.n_events, o.duration_min, o.total_value)).toSet
    assert(out == Set((1L, 2L, 10.0, 3.0), (1L, 1L, 0.0, 9.0), (2L, 1L, 0.0, 5.0)))
  }

  test("window-algebra sessionization equals the stateful formulation") {
    import spark.implicits._
    // same semantics, two very different plans: lag/sum window algebra
    // (ops.Sessionize) vs flatMapGroupsWithState (EventStream)
    val rows = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1.0),
      (1L, ts("2024-03-01 10:10:00"), 2.0),
      (1L, ts("2024-03-01 13:00:00"), 9.0),
      (2L, ts("2024-03-01 12:00:00"), 5.0),
      (2L, ts("2024-03-01 12:29:00"), 4.0),
      (3L, ts("2024-03-01 01:00:00"), 7.0),
      // sub-millisecond boundary: gap = 30min + 800µs, which IS a break
      // in exact-microsecond arithmetic but exactly 30min under ms
      // truncation (.0001 and .0009 both truncate to .000) — pins both
      // formulations to µs precision
      (4L, ts("2024-03-01 02:00:00.0001"), 1.0),
      (4L, ts("2024-03-01 02:30:00.0009"), 2.0))
    val relational = graft.ops.Sessionize
      .sessionizeBatch(rows.toDF("user_id", "ts", "value"), "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_events"),
        r.getAs[Double]("duration_min"), r.getAs[Double]("total_value"))).toSet
    val stateful = EventStream.sessionize(spark,
        rows.map(r => EventStream.SessionIn(r._1, r._2, r._3)).toDS())
      .collect()
      .map(o => (o.user_id, o.n_events, o.duration_min, o.total_value)).toSet
    assert(relational == stateful)
  }

  // fixture for the corpus-curation stream: doc 1 passes every gate;
  // doc 2 is doc 1 with different PII (same fingerprint after redaction
  // → deduped); docs 3-5 die at the language / repetition / quality gates
  private val corpusRows = Seq(
    (1L, ts("2024-03-01 10:00:00"),
      "the quick brown fox jumps over a lazy dog today contact a@b.com"),
    (2L, ts("2024-03-01 10:05:00"),
      "the quick brown fox jumps over a lazy dog today contact x.y@z.org"),
    (3L, ts("2024-03-01 10:06:00"), "der hund und die katze das ein haus"),
    (4L, ts("2024-03-01 10:07:00"), "the cat the cat the cat the cat"),
    (5L, ts("2024-03-01 10:08:00"), "tiny doc"))

  test("streaming curation gates, redacts, and dedups within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusStream.curate(mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("curate_test")
      .outputMode("append").start()
    try {
      mem.addData(corpusRows: _*)
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, text FROM curate_test").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out.map(_._1).toSet == Set(1L), s"expected only doc 1, got $out")
      assert(out.head._2.endsWith("contact <EMAIL>"), "stream must emit redacted text")
      // the dup fingerprint arriving later in a NEW batch is still dropped
      mem.addData((6L, ts("2024-03-01 10:09:00"),
        "the quick brown fox jumps over a lazy dog today contact late@dup.io"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM curate_test").collect()(0).getLong(0) == 1)
    } finally q.stop()
  }

  test("batch curation is the deterministic twin of the streaming path") {
    import spark.implicits._
    val out = CorpusStream.curate(corpusRows.toDF("doc_id", "ts", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }
}
