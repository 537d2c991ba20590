package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint-restart recovery: a file-source stream with a checkpointed
  * foreachBatch sink must deliver every input row exactly once across a
  * stop/restart — THE durability property a 100 TB streaming job needs
  * (executors die; the checkpoint is the contract). */
class RestartSpec extends SparkTestBase {

  test("file-source stream resumes from checkpoint exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft_restart")
    val srcDir = s"$root/src"; val outDir = s"$root/out"
    val ckDir = s"$root/ck"
    new java.io.File(srcDir).mkdirs()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))

    def writeBatch(name: String, ids: Range): Unit = {
      val rows = ids.map(i => s"""{"event_id":$i,"value":${i * 1.5}}""")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/$name.jsonl"),
        rows.mkString("\n"))
    }

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(srcDir)
      val q = graft.streaming.StreamOps
        .foreachBatchParquet(stream, outDir)
        .option("checkpointLocation", ckDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    writeBatch("a", 0 until 50)
    runOnce()                       // processes batch a, then stops
    writeBatch("b", 50 until 80)
    runOnce()                       // restart from checkpoint: only b is new

    val out = spark.read.parquet(outDir)
    assert(out.count() == 80, "every row exactly once across restart")
    assert(out.select("event_id").distinct().count() == 80)
    val sum = out.agg(org.apache.spark.sql.functions.sum("value"))
      .collect()(0).getDouble(0)
    assert(math.abs(sum - (0 until 80).map(_ * 1.5).sum) < 1e-9)
  }
}
