package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §7.3 mechanism (c)): exact top-k
  * rows per key without a full per-partition sort.
  *
  * Logical node + physical exec + planner strategy; exposed through
  * [[graft.ops.TopK.perKey]] and registered either via
  * `spark.experimental.extraStrategies` (live session) or
  * [[graft.functions.GraftExtensions]] (session build time).
  *
  * Scale rationale vs `row_number() OVER (PARTITION BY key ORDER BY ord)`:
  * the window operator sorts every row of every partition before ranking;
  * this exec keeps one bounded k-heap per key and streams the input once —
  * no sort buffer, no spill pressure from rows that can never rank. The
  * required ClusteredDistribution makes Catalyst insert the hash exchange,
  * so AQE still owns partition sizing.
  *
  * Memory guard: the in-memory heap map is O(keys_in_partition × k), which
  * an adversarial key cardinality could blow up. Past `maxKeysInMemory`
  * keys the partition SPILLS: all held rows flush to a key-sorted chunk
  * file and the map resets. Top-k is decomposable — the global top-k per
  * key is a subset of the union of per-chunk top-ks — so a final k-way
  * merge of the chunks (streamed key-group by key-group, O(chunks × k)
  * rows in memory) reproduces the exact answer. Unspilled partitions take
  * the original zero-IO path.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan,
    maxKeysInMemory: Int = TopKPerKeyExec.DefaultMaxKeysInMemory)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan,
    maxKeysInMemory: Int)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderLocal = order
    val childOutput = child.output
    val maxKeys = maxKeysInMemory
    child.execute().mapPartitions { it =>
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // head of the heap = the row that sorts LAST among the kept k
      val heapOrd: java.util.Comparator[InternalRow] = ordering.reverse
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput.map(a => a: Expression),
        childOutput)
      var heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val spillFiles = scala.collection.mutable.ArrayBuffer.empty[File]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        spillFiles.foreach(f => if (f.exists()) f.delete())
      })

      /** Flush every held row to a chunk file, entries sorted by key bytes
        * (any consistent total order groups equal keys for the merge —
        * unsigned-lex over UnsafeRow bytes is one, since UnsafeRow
        * equality is byte equality). */
      def spill(): Unit = {
        val entries = new Array[(Array[Byte], Array[Array[Byte]])](heaps.size())
        var i = 0
        heaps.forEach { (key, heap) =>
          val rows = new Array[Array[Byte]](heap.size())
          var j = 0
          heap.forEach { r => rows(j) = rowProj(r).getBytes.clone(); j += 1 }
          entries(i) = (key.getBytes.clone(), rows)
          i += 1
        }
        java.util.Arrays.sort(entries,
          (a: (Array[Byte], Array[Array[Byte]]), b: (Array[Byte], Array[Array[Byte]])) =>
            java.util.Arrays.compareUnsigned(a._1, b._1))
        val f = File.createTempFile("graft_topk_spill", ".bin")
        spillFiles += f
        val out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
        try entries.foreach { case (key, rows) =>
          rows.foreach { row =>
            out.writeInt(key.length); out.write(key)
            out.writeInt(row.length); out.write(row)
          }
        } finally out.close()
        heaps = new java.util.HashMap()
      }

      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
        if (heaps.size() > maxKeys) spill()
      }

      if (spillFiles.isEmpty) {
        // zero-IO fast path: everything fit
        val out = Seq.newBuilder[InternalRow]
        heaps.values().forEach(h => h.forEach(out += _))
        out.result().iterator
      } else {
        spill() // remainder joins the chunks; all data now on disk

        /** Streaming reader over one key-sorted chunk. */
        final class ChunkReader(f: File) {
          private val in = new DataInputStream(
            new BufferedInputStream(new FileInputStream(f), 1 << 16))
          var key: Array[Byte] = _
          var row: UnsafeRow = _
          var open = true
          def advance(): Boolean = {
            val kLen = try in.readInt() catch {
              case _: java.io.EOFException => in.close(); open = false; return false
            }
            key = new Array[Byte](kLen); in.readFully(key)
            val rLen = in.readInt()
            val bytes = new Array[Byte](rLen); in.readFully(bytes)
            val u = new UnsafeRow(childOutput.length)
            u.pointTo(bytes, rLen)
            row = u
            true
          }
          advance()
        }

        val pq = new java.util.PriorityQueue[ChunkReader](spillFiles.size,
          (a: ChunkReader, b: ChunkReader) =>
            java.util.Arrays.compareUnsigned(a.key, b.key))
        spillFiles.foreach { f => val r = new ChunkReader(f); if (r.open) pq.add(r) }

        // k-way merge: per key group, gather that key's rows from every
        // chunk into one k-heap (≤ chunks × k rows live), emit, move on
        new Iterator[InternalRow] {
          private var pending: java.util.Iterator[InternalRow] =
            java.util.Collections.emptyIterator()
          private def advanceGroup(): Unit = {
            while (!pending.hasNext && !pq.isEmpty) {
              val groupKey = pq.peek().key
              val heap =
                new java.util.PriorityQueue[InternalRow](kLocal + 1, heapOrd)
              while (!pq.isEmpty &&
                  java.util.Arrays.compareUnsigned(pq.peek().key, groupKey) == 0) {
                val r = pq.poll()
                var more = true
                while (more &&
                    java.util.Arrays.compareUnsigned(r.key, groupKey) == 0) {
                  if (heap.size < kLocal) heap.add(r.row)
                  else if (ordering.compare(r.row, heap.peek()) < 0) {
                    heap.poll(); heap.add(r.row)
                  }
                  more = r.advance()
                }
                if (more) pq.add(r)
              }
              pending = heap.iterator()
            }
          }
          override def hasNext: Boolean = { advanceGroup(); pending.hasNext }
          override def next(): InternalRow = { advanceGroup(); pending.next() }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Default per-partition key cap before spilling: 256k keys × k rows is
    * comfortably inside a healthy executor; adversarial cardinalities go
    * to disk instead of OOM. */
  val DefaultMaxKeysInMemory: Int = 1 << 18
}

/** Planner strategy mapping the logical node to the exec. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, maxKeys) =>
      TopKPerKeyExec(keys, order, k, planLater(child), maxKeys) :: Nil
    case _ => Nil
  }
}
