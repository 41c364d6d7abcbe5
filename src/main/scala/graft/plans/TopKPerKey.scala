package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY.md §3.12 / prompt preference
  * (c)): top-k rows per key as a FIRST-CLASS operator — logical node,
  * planner strategy, and physical exec — registered through
  * `SparkSessionExtensions` (see [[GraftExtensions]]).
  *
  * Why an operator instead of `row_number().over(window) <= k`: the window
  * form sorts every key group (Spark 4's WindowGroupLimit prunes to k per
  * partition but still via sort-based machinery); this exec keeps a bounded
  * HEAP per key — O(n log k) comparisons, memory bounded by
  * `k × keys-per-partition` rows, no sort buffer — the shape that survives
  * hub keys with millions of rows at 100 TB.
  *
  * Semantics: rows whose sort position per key is within the top k under
  * `order`; ties beyond position k are dropped non-deterministically, so
  * callers wanting full determinism append a unique tiebreak to `order`
  * (same contract as the window formulation).
  */
object TopKPerKey {

  /** DataFrame-facing API. `order` is (columnName, ascending) pairs and
    * must include a deterministic tiebreak for reproducible results
    * (e.g. `Seq("score" -> false, "id" -> true)`).
    */
  def apply(df: DataFrame, keyCols: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(keyCols.nonEmpty && order.nonEmpty && k > 0)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"TopKPerKey: no column '$name' in ${analyzed.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val node = TopKPerKeyNode(keys, sortOrders, k, analyzed)
    ofRows(df.sparkSession, node)
  }

  /** Bridge to the private[sql] Dataset.ofRows (Scala access modifiers are
    * erased at the bytecode level, so plain reflection reaches the public
    * JVM method; this is the standard pattern for out-of-tree plan nodes).
    */
  private def ofRows(session: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame = {
    val datasetObj = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val module = datasetObj.getField("MODULE$").get(null)
    val m = datasetObj.getMethods.find(m =>
      m.getName == "ofRows" && m.getParameterCount == 2).get
    m.invoke(module, session, plan).asInstanceOf[DataFrame]
  }
}

/** Logical node: declares semantics only; output = child output. */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Optimizer rule: a deterministic Filter directly above [[TopKPerKeyNode]]
  * whose predicates reference only the node's KEY columns commutes with the
  * operator — "top k per key, then keep some keys" ≡ "keep some keys, then
  * top k per key", because the operator treats key groups independently.
  * Pushing the key predicates below the node re-enters Catalyst's normal
  * pushdown pipeline, so they keep sinking to the scan (`PushedFilters`).
  * Without this rule a custom logical node is a pushdown BARRIER: Catalyst
  * won't move a Filter through an operator it doesn't know is
  * key-group-preserving. Predicates referencing non-key columns stay above
  * (they would change which rows win the top k).
  */
object PushFilterThroughTopKPerKey
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Fire only when every key is a bare Attribute: for a computed key
    // (e.g. `a % 10`) a predicate over the underlying attribute is NOT a
    // predicate over the key value — rows within one key group differ on
    // it, and pushing would change which rows win the top k.
    case f @ Filter(cond, t: TopKPerKeyNode)
        if t.keys.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
      val keyAttrs = AttributeSet(t.keys)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(keyAttrs))
      if (push.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(push.reduce(And), t.child))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
  }
}

/** Planner strategy mapping the logical node to the physical exec. The
  * per-partition key-count threshold for the in-memory heap path is read
  * here (plan time) from `spark.graft.topk.maxHeapKeys`.
  */
class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val maxHeapKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.maxHeapKeys", "131072").toInt
      TopKPerKeyExec(keys, order, k, maxHeapKeys, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical exec: requires child rows clustered by the keys (the planner
  * inserts the hash exchange), then scans each partition once keeping a
  * bounded max-heap of rows per key.
  *
  * Memory contract: the heap map is O(k × distinct-keys-in-partition) rows,
  * which is NOT bounded by k alone — a partition with millions of distinct
  * keys would blow the heap. When the map grows past `maxHeapKeys` keys the
  * exec degrades to a SPILLABLE external sort: all currently-kept heap rows
  * plus the rest of the input go into an [[UnsafeExternalRowSorter]] ordered
  * by (keys, order), and the sorted stream is limited to the first k rows
  * per key group. Rows the heap phase already DISCARDED are safe to drop —
  * a heap only evicts a row when k strictly-better rows for the same key are
  * kept, so a discarded row is provably outside its key's top k. The heap
  * path (no sort, O(n log k) comparisons) thus serves the common bounded-key
  * case, and the sort path bounds memory in the adversarial one.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    maxHeapKeys: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs  = keys
    val sortOrder = order
    val limit     = k
    val keyCap    = math.max(maxHeapKeys, 1)
    val childOut  = child.output
    child.execute().mapPartitions({ rows =>
      import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      val keyProj  = UnsafeProjection.create(keyExprs, childOut)
      val rowOrd   = GenerateOrdering.generate(sortOrder, childOut)
      // Max-heap of the CURRENTLY-KEPT rows per key: the head is the worst
      // kept row; a new row replaces it when strictly better.
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      var overflowed = false
      var overflowRow: InternalRow = null
      while (rows.hasNext && !overflowed) {
        val row = rows.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= keyCap) {
            overflowed = true
            overflowRow = row.copy()
          } else {
            heap = new java.util.PriorityQueue[InternalRow](limit,
              (a: InternalRow, b: InternalRow) => rowOrd.compare(b, a)) // reversed: head = worst
            heaps.put(key.copy(), heap)
          }
        }
        if (heap != null) {
          if (heap.size < limit) heap.add(row.copy())
          else if (rowOrd.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }
      }
      import scala.jdk.CollectionConverters._
      if (!overflowed) {
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      } else {
        // Spill path: external sort by (keys, order), then stream first k
        // per key group. Sorter memory is task-managed and spills to disk.
        import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder => SO}
        import org.apache.spark.sql.execution.UnsafeExternalRowSorter
        import org.apache.spark.util.collection.unsafe.sort.PrefixComparators
        val schema = org.apache.spark.sql.catalyst.types.DataTypeUtils
          .fromAttributes(childOut)
        val fullOrder = keyExprs.map(e => SO(e, Ascending)) ++ sortOrder
        val ordering = GenerateOrdering.generate(fullOrder, childOut)
        // Constant prefix: every comparison falls through to the full row
        // ordering — correct, just without the radix fast path.
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow) = { p.value = 0L; p.isNull = false; p }
        }
        val sorter = UnsafeExternalRowSorter.create(
          schema, ordering, PrefixComparators.LONG, prefixComputer,
          4L * 1024 * 1024, false)
        val toUnsafe = UnsafeProjection.create(childOut, childOut)
        heaps.values().forEach(h => h.forEach(r => sorter.insertRow(toUnsafe(r))))
        heaps.clear()
        sorter.insertRow(toUnsafe(overflowRow))
        while (rows.hasNext) sorter.insertRow(toUnsafe(rows.next()))
        var curKey: InternalRow = null
        var emitted = 0
        sorter.sort().filter { row =>
          val kr = keyProj(row)
          if (curKey == null || kr != curKey) { curKey = kr.copy(); emitted = 0 }
          emitted += 1
          emitted <= limit
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
