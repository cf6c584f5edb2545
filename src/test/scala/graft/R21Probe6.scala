package graft

import org.apache.spark.sql.functions._

/** Dev utility (r21, session 2): reproduce the codegen compile failure in
  * s07's Lloyd-assignment stage ("Expression isNull_N is not an rvalue",
  * whole stage + UnsafeProjection falling back to interpreter mode) and
  * print the generated code so the offending pattern can be identified. */
object R21Probe6 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("r21probe6", "8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    System.err.println("[probe6] session up")
    val emb = Tables.load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    System.err.println("[probe6] loaded")
    val seeds = graft.operators.Similarity.farthestPointSeeds(emb, 8)
    System.err.println("[probe6] seeds done")
    val sums = emb
      .select(col("embedding"), graft.operators.Similarity.lloydScores(seeds).as("sc"))
      .select((array_position(col("sc"), array_min(col("sc"))) - 1)
        .cast("int").as("cid"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(floor(col("v").cast("double") * 1048576.0)).as("s"),
        count(lit(1)).as("n"))
    System.err.println("[probe6] sums built")
    import org.apache.spark.sql.execution.debug._
    val cg = try sums.queryExecution.debug.codegenToSeq() catch {
      case t: Throwable =>
        System.err.println(s"[probe6] codegenToSeq threw: $t")
        t.getStackTrace.take(12).foreach(f => System.err.println(s"  at $f"))
        Seq.empty
    }
    System.err.println(s"[probe6] subtrees: ${cg.size}")
    cg.zipWithIndex.foreach { case ((subtree, code, _), i) =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/sub$i.java"), code)
      println(s"=== SUBTREE $i written, ${code.linesIterator.size} lines ===")
    }
    try { val n = sums.collect().length; println(s"[probe6] rows=$n") }
    catch { case t: Throwable => println(s"[probe6] exec threw: $t") }
    spark.stop()
  }
}
