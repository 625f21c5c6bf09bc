package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStream
import graft.streaming.EventsStream.Event

/** Streaming extension: watermarked windowed aggregation driven by
  * MemoryStream micro-batches (incremental updates, late-data drop) and
  * keyed session state. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, ts: String, user: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(ts), user, typ, v)

  test("streaming ingest dedup: duplicate content within the watermark is dropped") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventsStream.dedupedStream(
      stream.toDF().toDF("doc_id", "ts", "text"), "ts", "text")
    val q = deduped.writeStream
      .outputMode("append").format("memory").queryName("dedup_test").start()
    try {
      stream.addData(
        (1L, Timestamp.valueOf("2024-01-01 01:00:00"), "alpha doc"),
        (2L, Timestamp.valueOf("2024-01-01 01:10:00"), "alpha doc"), // dup content
        (3L, Timestamp.valueOf("2024-01-01 01:20:00"), "beta doc"))
      q.processAllAvailable()
      stream.addData( // later micro-batch, still within the watermark
        (4L, Timestamp.valueOf("2024-01-01 01:30:00"), "alpha doc"),
        (5L, Timestamp.valueOf("2024-01-01 01:40:00"), "gamma doc"))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").collect().map(_.getLong(0)).toSet
      // one survivor per distinct content; state carried across batches
      assert(ids == Set(1L, 3L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("streaming doc prep: dedup, quality gate, and token counts across micro-batches") {
    implicit val sc = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val soup = "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"
    val stream = MemoryStream[(Long, Timestamp, String)]
    val prepped = EventsStream.preppedDocStream(
      stream.toDF().toDF("doc_id", "ts", "text"))
    val q = prepped.writeStream
      .outputMode("append").format("memory").queryName("prep_test").start()
    try {
      stream.addData(
        (1L, Timestamp.valueOf("2024-01-01 01:00:00"), good),
        (2L, Timestamp.valueOf("2024-01-01 01:10:00"), soup), // quality-gated
        (3L, Timestamp.valueOf("2024-01-01 01:20:00"), good)) // dup of 1
      q.processAllAvailable()
      stream.addData(
        (4L, Timestamp.valueOf("2024-01-01 01:30:00"), good), // dup across batches
        (5L, Timestamp.valueOf("2024-01-01 01:40:00"), "short"))  // < 5 tokens → score 0
      q.processAllAvailable()
      val rows = spark.table("prep_test").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
      assert(rows.keySet == Set(1L), s"got ${rows.keySet}")
      assert(rows(1L) == good.split(" ").length)
    } finally q.stop()
  }

  test("windowed counts update incrementally across micro-batches") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStream.startWindowedQuery(stream.toDF(), "win_test")
    try {
      stream.addData(
        ev(1, "2024-01-01 01:00:00", 1, "click", 1.5),
        ev(2, "2024-01-01 02:00:00", 1, "click", 2.5),
        ev(3, "2024-01-01 03:00:00", 2, "view", 1.0))
      q.processAllAvailable()
      val r1 = spark.table("win_test")
        .groupBy("window_start", "event_type")
        .agg(max("n_events").as("n_events")) // update mode: keep latest
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(r1("click") == 2 && r1("view") == 1)

      // second micro-batch updates the same window
      stream.addData(ev(4, "2024-01-01 04:00:00", 3, "click", 1.0))
      q.processAllAvailable()
      val r2 = spark.table("win_test")
        .groupBy("window_start", "event_type")
        .agg(max("n_events").as("n_events"))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(r2("click") == 3)
    } finally q.stop()
  }

  test("batch mode runs the same windowed aggregation (backfill path)") {
    val df = Seq(
      ev(1, "2024-01-01 01:00:00", 1, "click", 1.5),
      ev(2, "2024-01-02 01:00:00", 1, "click", 2.0)).toDF()
    val r = EventsStream.windowedCounts(df).collect()
    assert(r.length == 2)
    assert(r.map(_.getAs[Long]("n_events")).sum == 2)
  }

  test("streamToStaging appends every micro-batch through the EntityWriter") {
    implicit val sc = spark.sqlContext
    val writer = new graft.sinks.StagingWriter(spark, tmpDir("whs"))
    val stream = MemoryStream[Event]
    val q = EventsStream.streamToStaging(
      stream.toDF(), writer, "EVENTS", tmpDir("ckpt"))
    try {
      stream.addData(ev(1, "2024-01-01 01:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      assert(writer.read("stg_events").count() == 1)
      stream.addData(
        ev(2, "2024-01-01 02:00:00", 2, "view", 1.0),
        ev(3, "2024-01-01 03:00:00", 3, "click", 1.0))
      q.processAllAvailable()
      assert(writer.read("stg_events").count() == 3)
    } finally q.stop()
  }

  test("streamToStaging restart from checkpoint does not re-append delivered batches") {
    implicit val sc = spark.sqlContext
    val writer = new graft.sinks.StagingWriter(spark, tmpDir("whs2"))
    val ckpt = tmpDir("ckpt2")
    val stream = MemoryStream[Event]
    val q1 = EventsStream.streamToStaging(stream.toDF(), writer, "EVENTS", ckpt)
    try {
      stream.addData(ev(1, "2024-01-01 01:00:00", 1, "click", 1.0))
      q1.processAllAvailable()
      assert(writer.read("stg_events").count() == 1)
    } finally q1.stop()

    // restart on the SAME checkpoint: offsets replay from the committed
    // point, so the already-delivered batch must not append again
    val q2 = EventsStream.streamToStaging(stream.toDF(), writer, "EVENTS", ckpt)
    try {
      stream.addData(ev(2, "2024-01-01 02:00:00", 2, "view", 1.0))
      q2.processAllAvailable()
      assert(writer.read("stg_events").count() == 2)
    } finally q2.stop()
  }

  test("sessionize keeps per-user running counts across batches") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStream.sessionize(spark, stream.toDS(), timeoutMs = None)
      .writeStream.outputMode("update").format("memory")
      .queryName("sess_test").start()
    try {
      stream.addData(
        ev(1, "2024-01-01 01:00:00", 7, "click", 1.0),
        ev(2, "2024-01-01 01:01:00", 7, "click", 1.0),
        ev(3, "2024-01-01 01:02:00", 8, "view", 1.0))
      q.processAllAvailable()
      stream.addData(ev(4, "2024-01-01 01:03:00", 7, "click", 1.0))
      q.processAllAvailable()
      val counts = spark.table("sess_test")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts(7L) == 3 && counts(8L) == 1)
      assert(spark.table("sess_test").filter(col("closed")).count() == 0)
    } finally q.stop()
  }
}
