package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast-centroid LloydScores kernel (r22) must be BIT-IDENTICAL
  * to the per-centroid literal-array formulation it replaced in the
  * s07 training loop — the s07 oracle replays every seed scan, both Lloyd
  * iterations and the final rollup with no tolerance, so any FP
  * reordering or null-semantics drift would show up as a driver red. */
class LloydScoresSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local("graft-lloyd-spec", cores = "2")

  /** The pre-r22 literal formulation, verbatim (Similarity.lloydScores
    * before the broadcast rewrite). */
  private def oldScores(cents: Array[Array[Double]]): org.apache.spark.sql.Column =
    array(cents.toIndexedSeq.map { c =>
      val nc = c.map(x => x * x).sum
      lit(-2.0) * call_function("graft_dot", col("embedding"),
        array(c.toIndexedSeq.map(lit): _*)) + lit(nc)
    }: _*)

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("broadcast kernel == literal formulation, bit for bit (float corpus, k=8)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(421)
    val rows = Seq.fill(80)(Array.fill(64)(rnd.nextFloat() * 2f - 1f)).zipWithIndex
      .map { case (a, i) => (i.toLong, a.toSeq) }
    val df = rows.toDF("id", "embedding")
    val cents = Array.fill(8)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val both = df.select($"id", oldScores(cents).as("o"),
      graft.operators.Similarity.lloydScoresOf($"embedding", cents).as("n")).collect()
    both.foreach { r =>
      val o = r.getSeq[Double](1)
      val n = r.getSeq[Double](2)
      assert(o.length == n.length)
      o.indices.foreach(j => assert(bits(o(j)) == bits(n(j)),
        s"id=${r.getLong(0)} j=$j: ${o(j)} vs ${n(j)}"))
    }
  }

  test("double corpus and k=1 degenerate") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20)(Array.fill(16)(rnd.nextDouble())).zipWithIndex
      .map { case (a, i) => (i.toLong, a.toSeq) }
    val df = rows.toDF("id", "embedding")
    val cents = Array(Array.fill(16)(rnd.nextDouble()))
    val both = df.select(oldScores(cents).as("o"),
      graft.operators.Similarity.lloydScoresOf($"embedding", cents).as("n")).collect()
    both.foreach { r =>
      assert(bits(r.getSeq[Double](0).head) == bits(r.getSeq[Double](1).head))
    }
  }

  test("ragged input yields NULL elements (matching nullable graft_dot); null input yields null") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None))
      .toDF("id", "embedding")
    val cents = Array(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))
    val rows = df.select($"id",
      graft.operators.Similarity.lloydScoresOf($"embedding", cents).as("n"))
      .orderBy($"id").collect()
    val ragged = rows(0).getSeq[Any](1)
    assert(ragged.length == 2 && ragged.forall(_ == null),
      s"ragged input must score as per-element NULLs, got $ragged")
    assert(rows(1).isNullAt(1), "null input must yield a null array")
  }

  test("kernel stays codegen'd: CODEGEN_ONLY factory mode drives it") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "embedding")
      val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
      val r = df.select(
        graft.operators.Similarity.lloydScoresOf($"embedding", cents).as("n"))
        .collect().head.getSeq[Double](0)
      // -2*(1*1) + 1 = -1 ; -2*(2*1) + 1 = -3
      assert(bits(r(0)) == bits(-1.0) && bits(r(1)) == bits(-3.0), r.toString)
    } finally spark.conf.set(key, prev)
  }

  test("s07 task binaries carry a broadcast stub, not the centroid literals") {
    // the expression's serialized footprint must be bounded: the Broadcast
    // handle serializes to a stub (id + metadata), not the k×dim matrix
    val sc = spark.sparkContext
    val cents = Array.fill(8)(Array.fill(64)(1.0))
    val bc = sc.broadcast(cents)
    val norms = cents.map(_.map(x => x * x).sum)
    val expr = graft.functions.LloydScores(
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      bc, norms)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(expr)
    oos.close()
    val ser = bos.toByteArray
    // 8×64 doubles = 4096 B of payload; the stub form must stay well under
    assert(ser.length < 3000,
      s"LloydScores serialized to ${ser.length} B — centroids leaked into the closure?")
  }
}
