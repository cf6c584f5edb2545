package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, NormalizeText, TextAlgos}

/** The injected optimizer rule (GraftExtensions → GraftOptimizations)
  * collapses redundant normalize passes: idempotent self-composition and
  * lower() over already-normalized output. Asserts both the plan shape
  * (one NormalizeText node survives) and value equality on real data. */
class GraftOptimizationsSpec extends SparkSpec {

  private def countNormalize(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.expressions.map { e =>
      var n = 0
      e.foreach { case _: NormalizeText => n += 1; case _ => }
      n
    }.sum

  test("normalize_text(normalize_text(x)) collapses to one kernel pass") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val once = docs.select(
      GraftFunctions.normalizeText(spark, col("text")).as("n"))
    val twice = docs.select(
      GraftFunctions.normalizeText(spark,
        GraftFunctions.normalizeText(spark, col("text"))).as("n"))
    assert(countNormalize(once) == 1)
    assert(countNormalize(twice) == 1, "self-composition must collapse")
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
  }

  test("lower(normalize_text(x)) drops the lower pass") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs.select(
      lower(GraftFunctions.normalizeText(spark, col("text"))).as("n"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("lower("), s"lower survived:\n$plan")
    assert(countNormalize(df) == 1)
    // semantic ground truth: normalize output is already lowercase
    val s = docs.select(col("text")).head.getString(0)
    assert(TextAlgos.normalize(s) == TextAlgos.normalize(s).toLowerCase)
  }
}
