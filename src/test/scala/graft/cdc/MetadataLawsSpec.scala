package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.LocalSpark
import java.nio.file.Files
import scala.util.Random

/** A71/A72 randomized MODEL test (the DeletionVectorLawsSpec idiom):
  * a seeded interleaving of merges (some deliberately violating),
  * predicate updates, constraint add/drop, generated-column
  * add/drop, and RESTOREs runs against the real store and a
  * driver-side model of (rows, constraint set, generated set). After
  * EVERY step: the served snapshot — including computed columns —
  * must equal the model, the declared metadata must equal the
  * model's sets, and every REFUSED write must leave all three
  * exactly unchanged. This is the class of interleaving
  * (declare → merge → restore-past-the-declaration → redeclare)
  * where a carry bug or a half-published refusal surfaces as a
  * mismatch within a step or two.
  */
class MetadataLawsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("random merge/update/constraint/generated/restore interleavings match the model at every step") {
    val dir = Files.createTempDirectory("graft").toString
    val rnd = new Random(20260814L)
    val n = 800L

    val cfg = CdcTableConfig(
      cdcTable = "t", sourcePath = "t", targetDb = "g", targetTable = "laws",
      targetPath = dir, pk = Seq("id"), fieldSpecs = Nil,
      passthrough = Seq("grp", "payload"), numBuckets = Some(8))

    // model state
    val rows = scala.collection.mutable.Map[Long, Long]() // id -> payload
    (0L until n).foreach(id => rows(id) = id * 10L)
    var constraints = Map.empty[String, Long] // name -> min payload bound
    var generated = Set.empty[String] // only ever "g1" (payload*2+1)

    CdcPipeline.publish(
      spark.range(0, n).select(col("id"), (col("id") % 97).as("grp"),
        (col("id") * 10L).as("payload")),
      dir, Seq("id"), buckets = Some(8))

    // per committed version: full model snapshot (for RESTORE)
    val history = scala.collection.mutable.Map[Long, (Map[Long, Long], Map[String, Long], Set[String])]()
    def record(): Unit =
      history(CdcPipeline.currentVersion(dir).get) =
        ((rows.toMap, constraints, generated))
    record()

    def changes(ups: Seq[(Long, Long)], dels: Seq[Long]) =
      (ups.map { case (id, p) => (id, id % 97, Some(p), "u") } ++
        dels.map(id => (id, id % 97, None: Option[Long], "d")))
        .toDF("id", "grp", "payload", "__op")

    def check(step: Int): Unit = {
      val snap = CdcPipeline.readSnapshot(spark, dir).get
      val got = snap.select("id", "payload").as[(Long, Long)].collect().toMap
      assert(got === rows.toMap, s"step $step: snapshot != model")
      assert(snap.columns.contains("g1") === generated.contains("g1"),
        s"step $step: generated column presence")
      if (generated.contains("g1")) {
        val g = snap.select("id", "g1").as[(Long, Long)].collect().toMap
        assert(g === rows.map { case (id, p) => id -> (p * 2 + 1) }.toMap,
          s"step $step: computed values")
      }
      assert(CdcPipeline.checkConstraints(dir).keySet === constraints.keySet,
        s"step $step: constraint set")
      assert(CdcPipeline.generatedColumns(dir).keySet === generated,
        s"step $step: generated set")
    }

    (1 to 22).foreach { step =>
      val verBefore = CdcPipeline.currentVersion(dir).get
      rnd.nextInt(7) match {
        case 0 | 1 => // merge: upserts (+ a delete), possibly violating
          val bound = constraints.values.maxOption
          val violate = bound.isDefined && rnd.nextBoolean()
          val ups = (1 to 20).map { _ =>
            val id = rnd.nextLong(n + 200)
            val p = if (violate) bound.get - 1 - rnd.nextInt(50)
              else math.abs(rnd.nextLong(1000000L)) + bound.getOrElse(0L)
            (id, p)
          }
          val dels = rows.keys.take(3).toSeq
          if (violate) {
            intercept[CdcPipeline.ConstraintViolationException] {
              CdcPipeline.mergeAndPublish(spark, cfg, changes(ups, dels), 23L)
            }
            assert(CdcPipeline.currentVersion(dir).get === verBefore,
              s"step $step: refused merge must not publish")
          } else {
            CdcPipeline.mergeAndPublish(spark, cfg, changes(ups, dels), 23L)
            ups.foreach { case (id, p) => rows(id) = p }
            dels.foreach(rows.remove)
          }
        case 2 => // predicate update of one grp, possibly violating
          val g = rnd.nextInt(97)
          val bound = constraints.values.maxOption
          val hits = rows.keys.filter(_ % 97 == g)
          val violate = bound.isDefined && hits.nonEmpty && rnd.nextBoolean()
          if (violate) {
            intercept[CdcPipeline.ConstraintViolationException] {
              CdcPipeline.updateWhere(spark, dir, Seq("id"), col("grp") === g,
                Map("payload" -> lit(bound.get - 7L)))
            }
            assert(CdcPipeline.currentVersion(dir).get === verBefore)
          } else {
            CdcPipeline.updateWhere(spark, dir, Seq("id"), col("grp") === g,
              Map("payload" -> (col("payload") + lit(5L))))
            if (hits.nonEmpty) hits.foreach(id => rows(id) = rows(id) + 5L)
          }
        case 3 => // add a constraint at/below the current min (succeeds)
          // or above it (refuses, declares nothing)
          val name = s"c$step"
          val minP = rows.values.minOption.getOrElse(0L)
          if (rnd.nextBoolean() && rows.nonEmpty) {
            intercept[CdcPipeline.ConstraintViolationException] {
              CdcPipeline.addCheckConstraint(spark, dir, name,
                s"payload >= ${minP + 1}")
            }
            assert(CdcPipeline.currentVersion(dir).get === verBefore)
          } else {
            CdcPipeline.addCheckConstraint(spark, dir, name, s"payload >= $minP")
            constraints += name -> minP
          }
        case 4 => // drop a random constraint (or no-op when none)
          constraints.keys.toSeq.sorted.headOption match {
            case Some(name) =>
              CdcPipeline.dropCheckConstraint(dir, name)
              constraints -= name
            case None =>
              assert(CdcPipeline.dropCheckConstraint(dir, "absent") === None)
          }
        case 5 => // toggle the generated column
          if (generated.contains("g1")) {
            CdcPipeline.dropGeneratedColumn(dir, "g1")
            generated -= "g1"
          } else {
            CdcPipeline.addGeneratedColumn(dir, "g1", LongType, "payload * 2 + 1")
            generated += "g1"
          }
        case 6 => // RESTORE to a random recorded version: all three revert
          val vs = history.keys.toSeq.sorted
          val target = vs(rnd.nextInt(vs.length))
          CdcPipeline.restoreSnapshot(dir, target)
          val (r, c, g) = history(target)
          rows.clear(); rows ++= r
          constraints = c; generated = g
      }
      record()
      check(step)
    }
    StoreFs.deleteRecursive(dir)
  }
}
