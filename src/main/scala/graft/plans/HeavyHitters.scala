package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters: a MERGEABLE frequency summary that holds at
  * most `capacity` (item, count) pairs, guaranteeing every item with true
  * frequency above n/(capacity+1) survives with
  * `true − n/(capacity+1) ≤ est ≤ true`. The streaming-safe alternative to
  * an exact `groupBy(item).count()` when the item domain is unbounded
  * (URLs, n-grams, user ids at 100 TB): the aggregation buffer that crosses
  * the shuffle is `capacity` entries per map task, never the domain size.
  * Companion to the Count-Min sketch in
  * [[graft.analytics.Distribution]] — CMS answers point queries over the
  * whole domain, Misra–Gries NAMES the heavy hitters without a second
  * probe pass.
  *
  * Same `TypedImperativeAggregate` tier as [[TopKByScore]] (object-hash
  * partial aggregation, no codegen). When the observed distinct count never
  * exceeds `capacity`, no decrement ever fires and every count is EXACT —
  * the property the harness oracle checks; the approximation bound under
  * eviction is spec-tested.
  *
  * Merge subtracts the (capacity+1)-th largest combined count from all
  * entries (Agarwal et al.'s mergeable-summaries construction), which keeps
  * the summary within capacity while preserving the MG error bound.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  // update() casts the item to UTF8String, so a non-string column must be
  // rejected at analysis time, not with a ClassCastException mid-task.
  // (ExpectsInputTypes is private[sql] in Spark 4, hence the manual check;
  // the SQL registration casts the item, so any atomic type works there.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string item, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buf.get(k) match {
        case Some(c) => buf.update(k, c + 1L)
        case None if buf.size < capacity => buf.update(k, 1L)
        case None =>
          // classic MG decrement: every tracked count pays for the evictee
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val nc = buf(key) - 1L
            if (nc <= 0L) dead += key else buf.update(key, nc)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count; at most `capacity`
      // entries are strictly larger, so the summary shrinks within bound
      val cs = a.values.toArray
      java.util.Arrays.sort(cs)
      val t = cs(cs.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { key =>
        val nc = a(key) - t
        if (nc <= 0L) dead += key else a.update(key, nc)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((ka, ca), (kb, cb)) =>
      if (ca != cb) ca > cb else ka < kb
    }
    new GenericArrayData(sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c)): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.update(in.readUTF(), in.readLong()); j += 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))

  override def prettyName: String = "misra_gries"
}
