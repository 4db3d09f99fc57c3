package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline
import graft.streaming.StreamPipeline.{BatchSink, Config}

/** Structured-streaming wrapper tests: delivery with retry, dead-letter
  * spill, watermarked volume agg, and checkpointed restart without
  * reprocessing. */
object SinkState {
  val delivered = new ConcurrentLinkedQueue[(String, Int)]()
  val attempts = new AtomicInteger(0)
  val failuresToInject = new AtomicInteger(0)
  def reset(failures: Int = 0): Unit = {
    delivered.clear(); attempts.set(0); failuresToInject.set(failures)
  }
}

class TestSink extends BatchSink {
  override def submit(tag: String, rows: Seq[Row]): Unit = {
    SinkState.attempts.incrementAndGet()
    if (SinkState.failuresToInject.getAndDecrement() > 0)
      throw new RuntimeException("injected sink failure")
    SinkState.failuresToInject.set(math.max(SinkState.failuresToInject.get(), 0))
    SinkState.delivered.add((tag, rows.size))
  }
}

class StreamingSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val golden =
    """2017-08-15T18:39:07.000000+00:00 my-hostname production--my-app/arn[3337]: {"district":"ddd","_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"oauth.login_start","dimensions":["district"],"stat_type":"counter","value_field":"value","rule":"login-start"}]}}"""

  private val regionLine =
    """2017-08-15T18:39:07.000000+00:00 my-hostname production--my-app/arn[3337]: {"dim1":"d","region":"us-west-2","value":1,"_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"ContainerExitCount","dimensions":["dim1"],"stat_type":"counter","value_field":"value","rule":"exit"}]}}"""

  test("streaming delivery: per-tag grouping, retry on transient failure") {
    implicit val sqlCtx = spark.sqlContext
    SinkState.reset(failures = 2) // first two submits fail → retry covers
    val ms = MemoryStream[String]
    val raw = ms.toDF().withColumnRenamed("value", "raw")
    val q = StreamPipeline
      .deliver(raw, Config("test-env", triggerInterval = "1 seconds", retryBaseMs = 5), new TestSink)
      .start()
    try {
      ms.addData(golden, regionLine)
      q.processAllAvailable()
    } finally q.stop()

    val byTag = SinkState.delivered.asScala.toSeq.groupBy(_._1)
    assert(byTag.keySet === Set("default", "us-west-2"))
    assert(SinkState.attempts.get() >= 4) // 2 failures + 2 successes
  }

  test("streaming delivery: exhausted retries spill to dead-letter parquet") {
    implicit val sqlCtx = spark.sqlContext
    SinkState.reset(failures = 1000) // never succeeds
    val dlq = Files.createTempDirectory("graft-dlq").toString + "/failed"
    val ms = MemoryStream[String]
    val raw = ms.toDF().withColumnRenamed("value", "raw")
    val q = StreamPipeline
      .deliver(
        raw,
        Config("test-env", triggerInterval = "1 seconds", retryAttempts = 2, retryBaseMs = 1,
          deadLetterPath = Some(dlq)),
        new TestSink
      )
      .start()
    try {
      ms.addData(golden)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(dlq).count() === 1)
    assert(SinkState.delivered.isEmpty)
  }

  test("watermarked 1-minute volume aggregation (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val raw = ms.toDF().withColumnRenamed("value", "raw")
    val agg = StreamPipeline.volumeAgg(raw, "test-env")
    val q = agg.writeStream.format("memory").queryName("vols").outputMode("update").start()
    try {
      def line(sec: Int) =
        f"""2017-08-15T18:39:$sec%02d.000000+00:00 h production--app-a/arn[1]: {"_kvmeta":{"team":"team-x","routes":[]}}"""
      ms.addData(line(1), line(2), line(3))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM vols").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("log_volume_count") === 3)
      assert(rows.head.getAs[String]("application") === "app-a")
      assert(rows.head.getAs[String]("team") === "team-x")
    } finally q.stop()
  }

  test("fast-lane streaming delivery matches declarative-lane output") {
    implicit val sqlCtx = spark.sqlContext
    SinkState.reset()
    val ms = MemoryStream[String]
    val raw = ms.toDF().withColumnRenamed("value", "raw")
    val q = StreamPipeline
      .deliver(raw, Config("test-env", triggerInterval = "1 seconds", fastLane = true), new TestSink)
      .start()
    try {
      ms.addData(golden, regionLine)
      q.processAllAvailable()
    } finally q.stop()
    val byTag = SinkState.delivered.asScala.toSeq.groupBy(_._1)
    assert(byTag.keySet === Set("default", "us-west-2"))
    assert(byTag.values.flatten.map(_._2).sum === 2)
  }

  test("streaming dedup with watermark drops duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val parsed = graft.parse.LogParse.parse(
      ms.toDF().withColumnRenamed("value", "raw"), "test-env")
    val deduped = parsed
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("record_id"))
      .select(col("record_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(golden)
      q.processAllAvailable()
      ms.addData(golden, regionLine) // golden is a duplicate (same raw → same record_id)
      q.processAllAvailable()
      assert(spark.sql("SELECT count(DISTINCT record_id) FROM dedup_out").head.getLong(0) === 2)
      assert(spark.sql("SELECT count(*) FROM dedup_out").head.getLong(0) === 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState delay tracker: gauge emitted on timeout, then reset") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val anchor = 1700000000L
    val points = ms.toDF().toDF("key", "point_ts")
    val gauges = graft.streaming.DelayTracker
      .track(points, intervalMs = 100, nowSec = () => anchor + 60)
    val q = gauges.writeStream.format("memory").queryName("delays")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      ms.addData(("app-a", anchor + 50), ("app-a", anchor + 20), ("app-b", anchor + 59))
      // gauges appear once the processing-time timeout fires on a later
      // trigger; poll with a deadline (processAllAvailable doesn't settle
      // while timeouts are pending)
      val deadline = System.currentTimeMillis() + 60000
      def rows() = spark.sql("SELECT key, max_delay_sec FROM delays").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      while (rows().size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(rows().get("app-a").contains(40L)) // max(60-50, 60-20)
      assert(rows().get("app-b").contains(1L))
    } finally q.stop()
  }

  test("checkpointed restart does not reprocess delivered records") {
    val dir = Files.createTempDirectory("graft-restart")
    val srcDir = dir.resolve("src").toString
    val ckpt = dir.resolve("ckpt").toString
    new java.io.File(srcDir).mkdirs()

    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(srcDir, name), lines.mkString("\n").getBytes)

    SinkState.reset()
    writeFile("a.txt", Seq(golden))
    def startQuery() = {
      val raw = spark.readStream.text(srcDir).withColumnRenamed("value", "raw")
      StreamPipeline
        .deliver(
          raw,
          Config("test-env", triggerInterval = "1 seconds", checkpointLocation = Some(ckpt)),
          new TestSink
        )
        .start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(SinkState.delivered.asScala.map(_._2).sum === 1)

    writeFile("b.txt", Seq(golden, golden))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    // only the 2 new records delivered after restart — the checkpoint
    // (DynamoDB-lease-table analog) prevents reprocessing a.txt
    assert(SinkState.delivered.asScala.map(_._2).sum === 3)
  }
}
