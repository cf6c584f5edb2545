package graft
/** Dev utility: print the executed plan of a codegen'd custom expression. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plan", "4")
    import spark.implicits._
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(functions.GraftFunctions.fingerprint64(spark, $"text").as("fp"))
    println("PLAN_START")
    println(df.queryExecution.executedPlan.toString.take(2000))
    println("PLAN_END")
    spark.stop()
  }
}
