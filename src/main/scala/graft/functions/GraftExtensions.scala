package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** One-stop registration of every graft_* native function through Spark's
  * stock plug-in mechanism: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) and the
  * whole function surface — codegen'd scalar kernels, sketch/vote
  * aggregates, the n-gram generator — is available to ANY session,
  * including plain `spark-sql` / thrift-server users who never touch the
  * Scala API. The per-object `register(spark)` helpers the operators call
  * imperatively stay (idempotent, library-embedding path); both routes
  * share this descriptor list so the two surfaces cannot drift. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    // SQL UPDATE / MERGE INTO on graft catalog tables (see
    // graft.sql.GraftDml; live sessions use GraftDml.install instead)
    ext.injectPlannerStrategy(_ => new graft.sql.GraftDmlStrategy)
  }
}

object GraftExtensions {
  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def d(name: String, clazz: Class[_],
                b: Seq[Expression] => Expression): Descriptor =
    (FunctionIdentifier(name),
     new ExpressionInfo(clazz.getCanonicalName, name), b)

  /** Imperative twin of the extensions path: register the named subset
    * (idempotent) into an existing session — the library-embedding route
    * the operators use. Same descriptors, so the two cannot drift. */
  def register(spark: org.apache.spark.sql.SparkSession,
               names: String*): Unit = {
    val known = descriptors.map(_._1.funcName).toSet
    val unknown = names.filterNot(known)
    require(unknown.isEmpty,
      s"unknown graft function name(s): ${unknown.mkString(", ")} — " +
        s"known: ${known.toSeq.sorted.mkString(", ")}")
    descriptors.filter(t => names.contains(t._1.funcName)).foreach {
      case (id, info, b) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
  }

  val descriptors: Seq[Descriptor] = Seq(
    d("graft_dot", classOf[DotProduct], c => DotProduct(c(0), c(1))),
    d("graft_jaccard", classOf[JaccardSorted],
      c => JaccardSorted(c(0), c(1))),
    d("graft_overlap", classOf[OverlapSorted],
      c => OverlapSorted(c(0), c(1))),
    d("graft_knn_vote", classOf[KnnVote],
      c => KnnVote(c(0), c(1), c(2), k = 5)),
    d("graft_top1", classOf[Top1Neighbor], c => Top1Neighbor(c(0), c(1))),
    d("graft_simhash", classOf[SimhashAgg], c => SimhashAgg(c(0))),
    d("graft_cms", classOf[CmsAgg], c => CmsAgg(c(0), c(1), c(2))),
    d("graft_bitmap_distinct", classOf[BitmapDistinctAgg],
      c => BitmapDistinctAgg(c(0))),
    d("graft_bitmap", classOf[BitmapBuildAgg], c => BitmapBuildAgg(c(0))),
    d("graft_bitmap_union", classOf[BitmapUnionAgg],
      c => BitmapUnionAgg(c(0))),
    d("graft_bitmap_card", classOf[BitmapCard], c => BitmapCard(c(0))),
    d("graft_topfreq", classOf[TopFreqAgg], c => TopFreqAgg(c(0), c(1))),
    d("graft_kll", classOf[KllAgg], c => KllAgg(c(0), c(1), c(2))),
    d("graft_theta", classOf[ThetaAgg], c => ThetaAgg(c(0))),
    d("graft_theta_est", classOf[ThetaEstimate], c => ThetaEstimate(c(0))),
    d("graft_theta_setop", classOf[ThetaSetOp],
      c => ThetaSetOp(c(0), c(1), c(2))),
    d("graft_minset", classOf[MinKDistinctAgg],
      c => MinKDistinctAgg(c(0), c(1))),
    d("graft_ngrams", classOf[NgramGenerator],
      c => NgramGenerator(c(0), c(1))),
    d("graft_pq_adc", classOf[PqAdcScore], c => PqAdcScore(c(0), c(1))),
    d("graft_topc", classOf[TopCNeighbors],
      c => TopCNeighbors(c(0), c(1),
        c = c(2).eval(null).asInstanceOf[Number].intValue)),
    // Spark's own codegen'd bloom probe (the runtime-filter kernel),
    // surfaced as a callable function so operators can screen a column
    // against a pre-built `util.sketch.BloomFilter` embedded as a binary
    // literal. Args: (serialized filter BINARY, xxhash64(value) BIGINT).
    d("graft_bloom_might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
      c => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(c(0), c(1))),
    // ... and its BUILD side (the runtime-filter aggregate), so a
    // grouped query can emit one mergeable serialized bloom PER GROUP —
    // the per-partition data-skipping sidecar's writer kernel. Args:
    // (xxhash64(value) BIGINT, estimatedNumItems CONST, numBits CONST).
    d("graft_bloom_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate],
      c => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(c(0), c(1), c(2))))
}
