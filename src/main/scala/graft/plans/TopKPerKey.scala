package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan — SURVEY.md §2.2's tier-(c) extension path
  * (custom `LogicalPlan` + `SparkStrategy` + physical operator) for a
  * primitive Spark genuinely lacks: **top-k rows per key without a full
  * per-key sort**.
  *
  * Spark's idiom (`row_number().over(partitionBy(key).orderBy(o)) <= k`)
  * shuffles EVERY row and sorts every partition. This operator keeps a
  * bounded k-row heap per key: a partial pass prunes each input partition
  * to ≤ k rows per key BEFORE the shuffle (the per-key generalization of
  * what `TakeOrderedAndProject` does globally), so the exchange moves at
  * most partitions×keys×k rows regardless of input size — at 100 TB with
  * k=3 that's the difference between shuffling 100 TB and shuffling
  * megabytes. Algebraically safe because top-k is a semigroup:
  * topK(A ∪ B) = topK(topK(A) ∪ topK(B)).
  *
  * Memory: k × (distinct keys per partition) retained rows — the same
  * class as a non-spilling hash aggregate. For ultra-high-cardinality
  * keys size partitions accordingly (or fall back to the window idiom,
  * which sorts but spills); for the common case — modest key counts,
  * huge row counts — this operator wins outright.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

/** Physical operator: bounded per-key heaps in one pass over each
  * partition. `partial = true` runs before the exchange (any
  * distribution); the final instance requires clustering on the keys so
  * each key's survivors meet in one partition. */
case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (keys.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // heap head = the WORST retained row (reverse ordering), so "better
      // than head" decides eviction in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}

object GraftPlans {

  /** Top-k rows per key. `orderBy` is (column, descending) pairs — include
    * a unique tiebreak for deterministic output (same requirement as any
    * row_number formulation). Injects the strategy into the session's
    * experimental strategies (idempotent; also available via
    * GraftExtensions). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      TopKPerKey(keyCols.map(attr), order, k, analyzed))
  }
}
