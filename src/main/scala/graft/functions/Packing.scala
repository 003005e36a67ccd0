package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** F3 — little-endian result packing (reference `FlockDB.scala:278-299`,
  * `Flockdb.thrift:24-29`): the wire contract packs id lists as LE i64 byte buffers and
  * count results as LE i32 buffers; destination-id lists arrive packed the same way.
  * Pure driver-side codec over page-sized results (pages are client-sized by contract),
  * so no distributed form is needed.
  */
object Packing {

  def packLongs(ls: Seq[Long]): Array[Byte] = {
    val buffer = ByteBuffer.allocate(ls.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    ls.foreach(buffer.putLong)
    buffer.array()
  }

  def packInts(is: Seq[Int]): Array[Byte] = {
    val buffer = ByteBuffer.allocate(is.size * 4).order(ByteOrder.LITTLE_ENDIAN)
    is.foreach(buffer.putInt)
    buffer.array()
  }

  def unpackLongs(bytes: Array[Byte]): Array[Long] = {
    val longs = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer
    val results = new Array[Long](longs.limit)
    longs.get(results)
    results
  }

  def unpackInts(bytes: Array[Byte]): Array[Int] = {
    val ints = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer
    val results = new Array[Int](ints.limit)
    ints.get(results)
    results
  }
}
