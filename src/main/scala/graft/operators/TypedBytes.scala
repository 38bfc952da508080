package graft.operators

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets

/** Typed-bytes wire format — hadoop-streaming's binary pipe framing
  * (hadoop-tools/hadoop-streaming .../typedbytes/Type.java:27-43 defines the
  * type codes; TypedBytesOutput/Input define the framing: one type-code byte,
  * then a type-specific payload; VECTOR/LIST/MAP nest recursively, LIST is
  * terminated by the 255 marker).
  *
  * Scala ADT + streaming codec, used by `Pipe.pipeTypedBytes` for byte-level
  * interop with typed-bytes-speaking subprocess tools.
  */
object TypedBytes {

  sealed trait TBValue
  final case class TBBytes(v: Array[Byte]) extends TBValue
  final case class TBByte(v: Byte) extends TBValue
  final case class TBBool(v: Boolean) extends TBValue
  final case class TBInt(v: Int) extends TBValue
  final case class TBLong(v: Long) extends TBValue
  final case class TBFloat(v: Float) extends TBValue
  final case class TBDouble(v: Double) extends TBValue
  final case class TBString(v: String) extends TBValue
  final case class TBVector(v: Vector[TBValue]) extends TBValue
  final case class TBList(v: List[TBValue]) extends TBValue
  final case class TBMap(v: Map[TBValue, TBValue]) extends TBValue

  private val MarkerEndOfList = 255

  def write(out: DataOutputStream, value: TBValue): Unit = value match {
    case TBBytes(v) => out.writeByte(0); out.writeInt(v.length); out.write(v)
    case TBByte(v) => out.writeByte(1); out.writeByte(v.toInt)
    case TBBool(v) => out.writeByte(2); out.writeBoolean(v)
    case TBInt(v) => out.writeByte(3); out.writeInt(v)
    case TBLong(v) => out.writeByte(4); out.writeLong(v)
    case TBFloat(v) => out.writeByte(5); out.writeFloat(v)
    case TBDouble(v) => out.writeByte(6); out.writeDouble(v)
    case TBString(v) =>
      val b = v.getBytes(StandardCharsets.UTF_8)
      out.writeByte(7); out.writeInt(b.length); out.write(b)
    case TBVector(v) =>
      out.writeByte(8); out.writeInt(v.length); v.foreach(write(out, _))
    case TBList(v) =>
      out.writeByte(9); v.foreach(write(out, _)); out.writeByte(MarkerEndOfList)
    case TBMap(v) =>
      out.writeByte(10); out.writeInt(v.size)
      v.foreach { case (k, x) => write(out, k); write(out, x) }
  }

  /** Read one value; None at clean end-of-stream. */
  def read(in: DataInputStream): Option[TBValue] = {
    val code = try in.readUnsignedByte() catch { case _: EOFException => return None }
    Some(readPayload(in, code))
  }

  private def readPayload(in: DataInputStream, code: Int): TBValue = code match {
    case 0 => val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b); TBBytes(b)
    case 1 => TBByte(in.readByte())
    case 2 => TBBool(in.readBoolean())
    case 3 => TBInt(in.readInt())
    case 4 => TBLong(in.readLong())
    case 5 => TBFloat(in.readFloat())
    case 6 => TBDouble(in.readDouble())
    case 7 => val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
      TBString(new String(b, StandardCharsets.UTF_8))
    case 8 => val n = in.readInt()
      TBVector(Vector.fill(n)(read(in).getOrElse(throw new EOFException("vector"))))
    case 9 =>
      val buf = List.newBuilder[TBValue]
      var c = in.readUnsignedByte()
      while (c != MarkerEndOfList) { buf += readPayload(in, c); c = in.readUnsignedByte() }
      TBList(buf.result())
    case 10 => val n = in.readInt()
      TBMap((0 until n).map { _ =>
        val k = read(in).getOrElse(throw new EOFException("map key"))
        val v = read(in).getOrElse(throw new EOFException("map value"))
        k -> v
      }.toMap)
    case other => throw new java.io.IOException(s"unknown typed-bytes code $other")
  }
}
