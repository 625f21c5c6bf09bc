package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter CANDIDATE summary (Misra & Gries 1982) —
  * the bounded-state half of the candidates-then-verify heavy-hitter
  * pattern. A plain `groupBy(key).count()` shuffles one partial cell
  * per distinct key per task; over a 100 TB token stream with billions
  * of distinct keys that shuffle IS the job. This aggregate keeps at
  * most `stateSize` counters per partial buffer, merges buffers with
  * the standard decrement-preserving MG merge, and emits the surviving
  * keys — a superset of every key with true frequency
  * `> N / (stateSize + 1)` (the MG guarantee: each decrement event
  * removes ≥ stateSize+1 units of stream mass, so a key can lose at
  * most N/(stateSize+1) of its count and a heavy key never reaches 0).
  *
  * The caller then EXACT-COUNTS the ≤ stateSize candidates in a second
  * bounded pass and applies the real threshold — the final output is
  * exact and deterministic (the candidate SET may vary with partition
  * order; the verified heavy-hitter set cannot, because every true
  * heavy hitter survives every order and impostors are filtered by the
  * exact recount). Counts inside the sketch are NOT emitted: they are
  * lower bounds with order-dependent slack — exposing them would leak
  * nondeterminism into a gate output.
  *
  * State is an open-addressed-enough `mutable.HashMap[UTF8String, Long]`
  * capped at `stateSize`; input strings are COPIED before storage
  * (the eval'd UTF8String aliases the scan's reused row buffer).
  * Registered as `mg_candidates(key, stateSize)`.
  */
case class MisraGriesCandidates(
    child: Expression,
    stateSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(stateSize >= 1, s"stateSize $stateSize must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_candidates needs a STRING key, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Insert `w` units of `key`, then restore the ≤ stateSize bound by
    * the MG decrement: subtract the smallest count from every entry
    * and drop the zeros (≥ 1 entry — the minimum itself — always
    * drops, so one decrement restores the bound). */
  private def add(
      b: mutable.HashMap[UTF8String, Long], key: UTF8String, w: Long): Unit = {
    b.updateWith(key) {
      case Some(c) => Some(c + w)
      case None    => Some(w)
    }
    if (b.size > stateSize) {
      val d = b.valuesIterator.min
      b.filterInPlace((_, c) => c > d)
      b.mapValuesInPlace((_, c) => c - d)
    }
  }

  override def update(
      b: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[UTF8String].copy(), 1L)
    b
  }

  override def merge(
      b: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => add(b, k, c) }
    b
  }

  override def eval(b: mutable.HashMap[UTF8String, Long]): Any = {
    val arr = b.keysIterator.toArray
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(b: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      b.put(UTF8String.fromBytes(kb), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesCandidates = copy(child = newChild)
}
