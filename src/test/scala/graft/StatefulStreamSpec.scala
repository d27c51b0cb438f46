package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** flatMapGroupsWithState sessionization: streaming twin of ev_sessions. */
class StatefulStreamSpec extends SparkSpec {

  test("stateful sessionize emits closed sessions across micro-batches") {
    val dir = tmpDir("stateful_events")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.sessionize(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.sql("SELECT * FROM sessions")
    // compare against the batch sessionization (only CLOSED sessions are
    // emitted by the stream; the last session per user is still open)
    val batch = SparkEntry.queries("ev_sessions")(spark, "/root/testdata/sf0.001")
    val batchClosed = batch.count() - batch.select("user_id").distinct().count()
    assert(streamed.count() == batchClosed,
      s"streamed ${streamed.count()} vs batch closed $batchClosed")
    // spot-check one user's session event counts match the batch result
    val u = batch.filter(col("user_id") === 1).select("n_events")
      .collect().map(_.getLong(0)).toSeq.dropRight(1)
    val s = streamed.filter(col("user_id") === 1).orderBy("first_event")
      .select("n_events").collect().map(_.getLong(0)).toSeq
    assert(s.sorted == u.sorted, s"user1 streamed $s vs batch $u")
  }
}
