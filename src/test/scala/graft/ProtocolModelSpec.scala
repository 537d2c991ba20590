package graft

import org.apache.spark.sql.functions._
import graft.engine.Versioned
import graft.ops.MergeOps

/** Model-based randomized check of the whole commit protocol: a seeded
  * random sequence of table operations (merge / compact / retention /
  * rollback / vacuum) runs against BOTH the real versioned store and a
  * trivial in-memory model, and the committed read must equal the model
  * after EVERY step — plus time travel must reproduce every retained
  * model snapshot at the end. This is the lakehouse-protocol test
  * style: the model is obviously correct, so any divergence is a
  * protocol bug, and the random interleaving of maintenance ops reaches
  * compositions (retention→rollback→vacuum→merge...) no hand-written
  * scenario enumerates. Seeds are FIXED — the runs are deterministic,
  * failures reproduce. */
class ProtocolModelSpec extends SparkTestBase {

  private val Parts = Vector("A", "B", "C")

  /** The model: key → (value, partition), plus the snapshot history the
    * store's commit log should replay. */
  private case class Model(
      rows: Map[Long, (Double, String)],
      snapshots: Vector[Map[Long, (Double, String)]],  // index = version-1
      floor: Long) {
    def current: Map[Long, (Double, String)] = rows
  }

  private def mergeModel(m: Map[Long, (Double, String)],
                         batch: Seq[(Long, Double, String)])
      : Map[Long, (Double, String)] = {
    // mergeUpsert semantics: batch partitions restage fully; rows of a
    // touched partition whose key the batch replaces take the batch
    // value; other keys survive; brand-new keys append. Key moves
    // ACROSS partitions follow the batch (the old row's partition is
    // touched or not — if not touched, the old row survives too; the
    // engine treats the key column as authoritative within touched
    // partitions only). To keep the model trivially right, the
    // generator never moves a key between partitions.
    m ++ batch.map { case (k, v, p) => k -> (v, p) }
  }

  private def run(seed: Long, steps: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_model_$seed").toFile
      d.delete(); d.getAbsolutePath
    }
    // a key's partition is fixed by the key: k mod 3 → A/B/C (ensures
    // the "never moves partitions" model precondition)
    def partOf(k: Long): String = Parts((k % 3).toInt)
    def batch(n: Int): Seq[(Long, Double, String)] =
      (1 to n).map { _ =>
        val k = rnd.nextInt(30).toLong
        (k, math.floor(rnd.nextDouble() * 1e4) / 1e2, partOf(k))
      }.distinctBy(_._1)

    val init = batch(10)
    MergeOps.mergeUpsert(spark, dir, init.toDF("k", "v", "p"), "k", "p")
    var model = Model(mergeModel(Map.empty, init),
      Vector(mergeModel(Map.empty, init)), floor = 1L)

    def readBack(): Map[Long, (Double, String)] =
      MergeOps.readCorpus(spark, dir, "p").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap

    for (step <- 1 to steps) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 | 4 =>                            // merge
          val b = batch(1 + rnd.nextInt(5))
          if (b.nonEmpty) {
            MergeOps.mergeUpsert(spark, dir, b.toDF("k", "v", "p"), "k", "p")
            val next = mergeModel(model.rows, b)
            model = model.copy(rows = next,
              snapshots = model.snapshots :+ next)
          }
        case 5 =>                                            // compact
          // publishes a version ONLY if some partition is fragmented;
          // mirror by checking whether the version count grew
          val before = Versioned.currentVersion(spark, dir).get
          MergeOps.compactPartitions(spark, dir, "p", maxFilesPerPart = 1)
          if (Versioned.currentVersion(spark, dir).get > before)
            model = model.copy(snapshots = model.snapshots :+ model.rows)
        case 6 =>                                            // retention
          val drop = Parts(rnd.nextInt(Parts.size))
          val dropName = Versioned.partDirName("p", drop)
          val had = model.rows.values.exists(_._2 == drop)
          // dropping the LAST populated partition is table deletion and
          // the engine refuses it (fail-fast require) — skip that draw
          val others = model.rows.values.exists(_._2 != drop)
          if (!had || others)
            MergeOps.applyRetention(spark, dir, name => name != dropName)
          if (had && others) {
            val next = model.rows.filter { case (_, (_, p)) => p != drop }
            model = model.copy(rows = next,
              snapshots = model.snapshots :+ next)
          }
        case 7 =>                                            // rollback
          val candidates =
            (model.floor to model.snapshots.size.toLong).filter(_ >= 1L)
          if (candidates.size > 1) {
            val to = candidates(rnd.nextInt(candidates.size))
            Versioned.rollback(spark, dir, to)
            if (to != model.snapshots.size.toLong) {
              val restored = model.snapshots(to.toInt - 1)
              model = model.copy(rows = restored,
                snapshots = model.snapshots :+ restored)
            }
          }
        case 8 | 9 =>                                        // vacuum
          val keep = 1 + rnd.nextInt(3)
          Versioned.vacuum(spark, dir, keepVersions = keep)
          val cur = model.snapshots.size.toLong
          val newFloor = math.max(model.floor, math.max(1L, cur - keep + 1))
          model = model.copy(floor = newFloor)
      }
      val got = readBack()
      assert(got == model.current,
        s"seed=$seed step=$step: committed read diverged from model\n" +
          s"  store: ${got.toSeq.sortBy(_._1)}\n" +
          s"  model: ${model.current.toSeq.sortBy(_._1)}")
    }

    // end state: every retained version time-travels to its model
    // snapshot; the commit log's version numbering matches the model's
    val committed = Versioned.committedVersions(spark, dir)
    assert(committed.last == model.snapshots.size.toLong,
      s"seed=$seed: version count ${committed.last} != " +
        s"model ${model.snapshots.size}")
    committed.filter(_ >= model.floor).foreach { v =>
      val got = Versioned.readVersion(spark, dir, v, Some("p")).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
      assert(got == model.snapshots(v.toInt - 1),
        s"seed=$seed: time travel to v$v diverged from model snapshot")
    }
  }

  test("30-step randomized op sequences match the in-memory model at " +
       "every step and on all retained time-travel reads (3 seeds)") {
    Seq(11L, 42L, 77L).foreach(run(_, steps = 30))
  }
}
