package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{BoundedCollectLongPairs, CosineSimilarity, LatestByOrder, LshTableBuckets, MinHashBandBuckets, SimHash64, SortableDoubleBits, TopKByOrder, VectorAvg, WordShingles}

/** SQL surface of the graft function library, registered through the
  * sanctioned `SparkSessionExtensions` hook:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   — or —
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * gives `SELECT cosine_similarity(a, b)`, `simhash64(text)`,
  * `word_shingles(text, 3)`, `minhash_band_buckets(text, 8, 2)`,
  * `lsh_table_buckets(emb, tables, planes, dims)`,
  * `latest_by(value, ord1, ord2)`,
  * `top_k_by(value, ord1, ord2, k[, ord2_desc])`,
  * `sortable_double_bits(x)`, `vector_avg(emb)`, and
  * `bounded_collect_pairs(key, payload, limit)` in plain SQL, plus
  * the ROW_NUMBER-idiom optimizer rewrites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectOptimizerRule(_ => graft.plans.RowNumberToLatestBy)
  }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** (name, info, builder) triples — the shape injectFunction takes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0),
        if (args.length > 1) intLit(args(1), "w") else 3)),
    (FunctionIdentifier("minhash_band_buckets"),
      new ExpressionInfo(classOf[MinHashBandBuckets].getName, "minhash_band_buckets"),
      (args: Seq[Expression]) => MinHashBandBuckets(args(0),
        if (args.length > 1) intLit(args(1), "b") else 8,
        if (args.length > 2) intLit(args(2), "r") else 2)),
    (FunctionIdentifier("lsh_table_buckets"),
      new ExpressionInfo(classOf[LshTableBuckets].getName, "lsh_table_buckets"),
      (args: Seq[Expression]) => LshTableBuckets(args(0),
        if (args.length > 1) intLit(args(1), "tables") else 4,
        if (args.length > 2) intLit(args(2), "planes") else 4,
        if (args.length > 3) intLit(args(3), "dims") else 64)),
    (FunctionIdentifier("latest_by"),
      new ExpressionInfo(classOf[LatestByOrder].getName, "latest_by"),
      (args: Seq[Expression]) =>
        LatestByOrder(args(1), args(2), args(0)).toAggregateExpression()),
    (FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKByOrder].getName, "top_k_by"),
      (args: Seq[Expression]) =>
        TopKByOrder(intLit(args(3), "k"), args(1), args(2), args(0),
          ord2Desc = args.length > 4 && (args(4) match {
            case Literal(b: Boolean, _) => b
            case other => throw new IllegalArgumentException(
              s"top_k_by ord2_desc must be a boolean literal, got $other")
          })).toAggregateExpression()),
    (FunctionIdentifier("sortable_double_bits"),
      new ExpressionInfo(classOf[SortableDoubleBits].getName, "sortable_double_bits"),
      (args: Seq[Expression]) => SortableDoubleBits(args(0))),
    (FunctionIdentifier("vector_avg"),
      new ExpressionInfo(classOf[VectorAvg].getName, "vector_avg"),
      (args: Seq[Expression]) => VectorAvg(args(0)).toAggregateExpression()),
    (FunctionIdentifier("bounded_collect_pairs"),
      new ExpressionInfo(classOf[BoundedCollectLongPairs].getName, "bounded_collect_pairs"),
      (args: Seq[Expression]) => BoundedCollectLongPairs(
        intLit(args(2), "limit"), args(0), args(1)).toAggregateExpression()),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContain].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => graft.functions.BloomMightContain(args(0), args(1) match {
        // the serialized filter arrives as a binary literal (X'…' in
        // SQL text, or lit(bytes) from code) — driver-built state,
        // same contract as the DataFrame API
        case Literal(b: Array[Byte], org.apache.spark.sql.types.BinaryType) => b
        case other => throw new IllegalArgumentException(
          s"bloom_might_contain filter must be a binary literal, got $other")
      })))

  // ---- table-valued functions: the versioned store in plain SQL ----
  //
  // `SELECT * FROM graft_snapshot('/path')`, time travel via
  // `graft_snapshot_at(path, v)`, stat-pruned range reads via
  // `graft_range(path, col, lo, hi)`, bloom-pruned point lookups via
  // `graft_point(path, col, 'v1,v2')`, the commit-stamped feed via
  // `graft_change_feed(path, 'pk1,pk2', fromV, toV)`. Each builder
  // resolves at ANALYSIS time to the same LogicalPlan the DataFrame
  // API produces (SparkSession.active is the resolving session), so
  // predicates, projections, and joins written in SQL optimize
  // through the identical manifest/bucket machinery — SQL users get
  // data skipping without touching the Scala API.

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  /** A SQL literal as the plain JVM value readRange's bound builder
    * expects (UTF8String → String; numerics pass through).
    */
  private def boundLit(e: Expression, what: String): Option[Any] = e match {
    case Literal(null, _) => None
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => Some(s.toString)
    case Literal(v, _) => Some(v)
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }
  private def active = org.apache.spark.sql.SparkSession.active
  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.logical

  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_snapshot"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_snapshot path")
        plan(graft.cdc.CdcPipeline.readSnapshot(active, path).getOrElse(
          throw new IllegalArgumentException(s"no graft store at $path")))
      }),
    (FunctionIdentifier("graft_snapshot_at"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_snapshot_at"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_snapshot_at path")
        val v = longLit(args(1), "graft_snapshot_at version")
        plan(graft.cdc.CdcPipeline.readSnapshotAt(active, path, v).getOrElse(
          throw new IllegalArgumentException(s"no version $v at $path")))
      }),
    (FunctionIdentifier("graft_snapshot_ts"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_snapshot_ts"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_snapshot_ts path")
        val ts = longLit(args(1), "graft_snapshot_ts commit_us")
        plan(graft.cdc.CdcPipeline.readSnapshotAsOfTime(active, path, ts).getOrElse(
          throw new IllegalArgumentException(
            s"no commit at or before $ts µs at $path")))
      }),
    (FunctionIdentifier("graft_range"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_range"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_range path")
        val column = strLit(args(1), "graft_range column")
        plan(graft.cdc.CdcPipeline.readRange(active, path, column,
          boundLit(args(2), "graft_range lo"), boundLit(args(3), "graft_range hi"))
          .getOrElse(throw new IllegalArgumentException(s"no graft store at $path")))
      }),
    (FunctionIdentifier("graft_point"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_point"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_point path")
        val column = strLit(args(1), "graft_point column")
        val values = strLit(args(2), "graft_point values csv")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        plan(graft.cdc.CdcPipeline.readPoint(active, path, column, values)
          .getOrElse(throw new IllegalArgumentException(s"no graft store at $path")))
      }),
    (FunctionIdentifier("graft_history"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_history"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_history path")
        plan(graft.cdc.CdcPipeline.describeHistory(active, path).getOrElse(
          throw new IllegalArgumentException(s"no graft store at $path")))
      }),
    (FunctionIdentifier("graft_fsck"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_fsck"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_fsck path")
        plan(graft.cdc.CdcPipeline.fsck(active, path))
      }),
    (FunctionIdentifier("graft_schema_history"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_schema_history"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_schema_history path")
        plan(graft.cdc.CdcPipeline.describeSchemaHistory(active, path).getOrElse(
          throw new IllegalArgumentException(s"no graft store at $path")))
      }),
    (FunctionIdentifier("graft_audit"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_audit"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_audit path")
        val pk = strLit(args(1), "graft_audit pk list").split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        plan(graft.cdc.CdcPipeline.auditData(active, path, pk).getOrElse(
          throw new IllegalArgumentException(s"no graft store at $path")))
      }),
    (FunctionIdentifier("graft_vacuum_preview"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_vacuum_preview"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_vacuum_preview path")
        val keep = if (args.length > 1)
          longLit(args(1), "graft_vacuum_preview keepVersions").toInt else 2
        val spark = active
        import spark.implicits._
        plan(graft.cdc.CdcPipeline.vacuumPreview(path, keep)
          .toDF("version", "reclaimable_bytes"))
      }),
    (FunctionIdentifier("graft_change_feed"),
      new ExpressionInfo("graft.cdc.CdcPipeline", "graft_change_feed"),
      (args: Seq[Expression]) => {
        val path = strLit(args(0), "graft_change_feed path")
        val pk = strLit(args(1), "graft_change_feed pk list").split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        val from = longLit(args(2), "graft_change_feed fromVersion")
        val to = longLit(args(3), "graft_change_feed toVersion")
        plan(graft.cdc.CdcPipeline.readChangeFeed(active, path, pk, from, to).getOrElse(
          throw new IllegalArgumentException(
            s"change feed ($from, $to] unavailable at $path (vacuumed or missing)")))
      }))

  /** Register into an already-built session (tests, REPLs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    tableFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
    }
  }
}
