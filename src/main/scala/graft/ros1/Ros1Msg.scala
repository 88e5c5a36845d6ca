package graft.ros1

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ros1msg schema parsing + payload decoding — the reference's only
  * wired-in payload encoding (reference: server/util/ros1msg/,
  * server/executor/expression.go:95). Public format: fields are
  * little-endian, packed, `string` = u32 length + bytes, `time`/
  * `duration` = u32 secs + u32 nsecs, arrays are `T[n]` (fixed) or
  * `T[]` (u32 count + elements).
  *
  * Type mapping follows SURVEY §1.2: unsigned ints widen
  * (uint8→Short, uint16→Int, uint32→Long, uint64→Long with documented
  * wraparound), time/duration decode to epoch/span nanoseconds as
  * Long (never TimestampType — dp3 is ns-native).
  *
  * Flattening mirrors the reference's AnalyzeSchema
  * (server/util/schema/parser.go:551-589): nested records become
  * dotted paths, fixed arrays shorter than 10 become `name[i]`,
  * variable-length arrays are kept as array columns but excluded from
  * the flat (stats/filter) view.
  */
object Ros1Msg {

  sealed trait FType extends Serializable
  final case class Prim(name: String) extends FType
  final case class FixedArray(elem: Prim, n: Int) extends FType
  final case class VarArray(elem: Prim) extends FType
  final case class MsgField(name: String, tpe: FType)
  final case class MsgDef(fields: Seq[MsgField]) extends Serializable

  private val primitives = Set("bool", "int8", "uint8", "int16",
    "uint16", "int32", "uint32", "int64", "uint64", "float32",
    "float64", "string", "time", "duration", "char", "byte")

  /** Parse the flat-primitive subset of a ros1 message definition:
    * one `type name` per line; `#` comments and `CONST=...` lines are
    * skipped. (The reference additionally resolves nested message
    * types from concatenated definition sections; the driver fixtures
    * and the reference's own standard test schema are flat.) */
  def parse(definition: String): MsgDef = {
    val fields = definition.linesIterator.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.isEmpty || line.contains("=")) None
      else line.split("\\s+") match {
        case Array(tpe, name) =>
          val (base, arr) =
            if (tpe.endsWith("[]")) (tpe.dropRight(2), Some(-1))
            else if (tpe.endsWith("]")) {
              val i = tpe.indexOf('[')
              (tpe.take(i), Some(tpe.slice(i + 1, tpe.length - 1).toInt))
            } else (tpe, None)
          if (!primitives.contains(base))
            throw new IllegalArgumentException(
              s"unsupported (non-primitive) ros1 type: $base")
          val p = Prim(base)
          Some(MsgField(name, arr match {
            case None     => p
            case Some(-1) => VarArray(p)
            case Some(n)  => FixedArray(p, n)
          }))
        case _ => None
      }
    }
    MsgDef(fields.toSeq)
  }

  def sparkType(t: FType): DataType = t match {
    case Prim(p) => p match {
      case "bool"              => BooleanType
      case "int8"              => ByteType
      case "uint8" | "char" | "byte" => ShortType
      case "int16"             => ShortType
      case "uint16"            => IntegerType
      case "int32"             => IntegerType
      case "uint32"            => LongType
      case "int64" | "uint64"  => LongType // uint64 wraparound documented
      case "float32"           => FloatType
      case "float64"           => DoubleType
      case "string"            => StringType
      case "time" | "duration" => LongType // nanoseconds
    }
    case FixedArray(e, _) => ArrayType(sparkType(e), containsNull = false)
    case VarArray(e)      => ArrayType(sparkType(e), containsNull = false)
  }

  def structType(d: MsgDef): StructType =
    StructType(d.fields.map(f => StructField(f.name, sparkType(f.tpe))))

  // --- binary decode -----------------------------------------------------

  private def decodePrim(buf: ByteBuffer, p: Prim): Any = p.name match {
    case "bool"   => buf.get() != 0
    case "int8"   => buf.get()
    case "uint8" | "char" | "byte" => (buf.get() & 0xff).toShort
    case "int16"  => buf.getShort()
    case "uint16" => buf.getShort() & 0xffff
    case "int32"  => buf.getInt()
    case "uint32" => buf.getInt().toLong & 0xffffffffL
    case "int64" | "uint64" => buf.getLong()
    case "float32" => buf.getFloat()
    case "float64" => buf.getDouble()
    case "string" =>
      val n = buf.getInt()
      val b = new Array[Byte](n); buf.get(b)
      new String(b, UTF_8)
    case "time" | "duration" =>
      val secs = buf.getInt().toLong & 0xffffffffL
      val nsecs = buf.getInt().toLong & 0xffffffffL
      secs * 1000000000L + nsecs
  }

  def decode(d: MsgDef, bytes: Array[Byte]): Row = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Row.fromSeq(d.fields.map { f =>
      f.tpe match {
        case p: Prim => decodePrim(buf, p)
        case FixedArray(e, n) => Seq.fill(n)(decodePrim(buf, e))
        case VarArray(e) =>
          val n = buf.getInt()
          Seq.fill(n)(decodePrim(buf, e))
      }
    })
  }

  /** Attach a `decoded` struct column by decoding `dataCol` with the
    * given definition — partition-local, no shuffle; Catalyst prunes
    * the binary column away when only decoded fields are referenced
    * downstream. */
  def decodeDf(df: DataFrame, definition: String,
      dataCol: String = "data"): DataFrame = {
    val defn = parse(definition)
    val decodedType = structType(defn)
    val outSchema = StructType(
      df.schema.fields :+ StructField("decoded", decodedType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idx = df.schema.fieldIndex(dataCol)
    df.mapPartitions { it =>
      it.map { row =>
        val decoded = decode(defn, row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }(enc)
  }

  /** dp3's flat field view: dotted paths for the decoded struct,
    * `name[i]` for fixed arrays shorter than 10; variable-length and
    * long arrays are skipped (reference parser.go:551-589 behavior,
    * limitation acknowledged in doc/paper/dp3.tex:1008-1014). */
  def flatColumns(d: MsgDef, prefix: String = "decoded")
      : Seq[org.apache.spark.sql.Column] =
    d.fields.flatMap { f =>
      f.tpe match {
        case _: Prim =>
          Seq(col(s"$prefix.${f.name}").as(f.name))
        case FixedArray(_, n) if n < 10 =>
          (0 until n).map(i =>
            col(s"$prefix.${f.name}").getItem(i).as(s"${f.name}[$i]"))
        case _ => Nil // var/long arrays excluded from the flat view
      }
    }
}
