package graft.ros1

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.Queue

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ros1msg schema parsing + payload decoding — the reference's only
  * wired-in payload encoding (reference: server/util/ros1msg/,
  * server/executor/expression.go:95). Public format: fields are
  * little-endian, packed, `string` = u32 length + bytes, `time`/
  * `duration` = u32 secs + u32 nsecs, arrays are `T[n]` (fixed) or
  * `T[]` (u32 count + elements).
  *
  * Full-grammar support: concatenated `MSG: pkg/Name` sub-definitions
  * (separated by `===`+ lines) are resolved into recursive record
  * types, with the reference's name-resolution rules
  * (server/util/ros1msg/transform.go:44-165): a bare type name first
  * resolves as written, then as `parentPkg/name`; `std_msgs/Header` is
  * registered under both `Header` and its full name. Every real ROS
  * message starts with `Header`, so this is the first-contact path for
  * real robotics data.
  *
  * Type mapping follows SURVEY §1.2: unsigned ints widen
  * (uint8→Short, uint16→Int, uint32→Long, uint64→Long with documented
  * wraparound), time/duration decode to epoch/span nanoseconds as
  * Long (never TimestampType — dp3 is ns-native). Records become Spark
  * StructType, arrays ArrayType — the idiomatic nested representation;
  * the flat (stats/filter) view is a projection over it.
  *
  * Flattening mirrors the reference's AnalyzeSchema
  * (server/util/schema/parser.go:551-589) including its traversal
  * discipline — a per-field queue where record subfields go to the
  * BACK and fixed-array elements to the FRONT — so flat column order
  * matches the reference exactly: nested records become dotted paths,
  * fixed arrays shorter than 10 become `name[i]`, variable-length and
  * long arrays are excluded from the flat view.
  */
object Ros1Msg {

  sealed trait FType extends Serializable
  final case class Prim(name: String) extends FType
  final case class Rec(fields: Seq[MsgField]) extends FType
  final case class FixedArray(elem: FType, n: Int) extends FType
  final case class VarArray(elem: FType) extends FType
  final case class MsgField(name: String, tpe: FType)
  final case class MsgDef(fields: Seq[MsgField]) extends Serializable

  private val primitives = Set("bool", "int8", "uint8", "int16",
    "uint16", "int32", "uint32", "int64", "uint64", "float32",
    "float64", "string", "time", "duration", "char", "byte")

  // --- parsing -----------------------------------------------------------

  /** One `type name` field line, split out of a definition section.
    * `#` comments and `CONST=...` lines are skipped (reference
    * grammar.go: constants are parsed then dropped by the transform). */
  private def fieldLines(section: String): Seq[(String, String)] =
    section.linesIterator.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.isEmpty || line.contains("=")) None
      else line.split("\\s+") match {
        case Array(tpe, name) => Some((tpe, name))
        case _                => None
      }
    }.toSeq

  /** Parse a ros1 message definition, resolving concatenated
    * sub-definition sections (`===...` separator + `MSG: pkg/Name`
    * header) into inline record types, like the reference's
    * transformAST (transform.go:138-165).
    *
    * @param pkg the parent message's package, used to resolve bare
    *            (non-namespaced) type names against namespaced
    *            sub-definitions (transform.go:127-136)
    */
  def parse(definition: String, pkg: String = ""): MsgDef = {
    // split on separator lines — the grammar accepts ANY run of '='
    // (reference grammar.go `Equals+`), so a single '=' line separates
    val sections = definition.split("(?m)^\\s*=+\\s*$").toSeq
    val main = sections.head
    // subdep registry: full name always; Header additionally bare
    // (transform.go:140-147)
    val subdefs: Map[String, String] = sections.tail.flatMap { sec =>
      val lines = sec.linesIterator.dropWhile(_.trim.isEmpty).toSeq
      lines.headOption.map(_.trim) match {
        case Some(h) if h.startsWith("MSG:") =>
          val full = h.drop(4).trim
          val body = lines.tail.mkString("\n")
          if (full == "std_msgs/Header")
            Seq("Header" -> body, full -> body)
          else Seq(full -> body)
        case _ => Nil
      }
    }.toMap

    def resolve(parentPkg: String, tpe: String,
        seen: Set[String]): FType = {
      val (base, arr) =
        if (tpe.endsWith("[]")) (tpe.dropRight(2), Some(-1))
        else if (tpe.endsWith("]")) {
          val i = tpe.indexOf('[')
          (tpe.take(i), Some(tpe.slice(i + 1, tpe.length - 1).toInt))
        } else (tpe, None)
      val elem: FType =
        if (primitives.contains(base)) Prim(base)
        else {
          // bare name as written, else parentPkg-qualified
          val (key, body) = subdefs.get(base).map(base -> _)
            .orElse(subdefs.get(s"$parentPkg/$base")
              .map(s"$parentPkg/$base" -> _))
            .getOrElse(throw new IllegalArgumentException(
              s"failed to resolve record type $parentPkg/$base"))
          if (seen.contains(key))
            throw new IllegalArgumentException(
              s"recursive ros1 type: $key")
          // the bare `Header` alias is ALWAYS std_msgs/Header
          // (reference derives pkg from the stored full type name,
          // transform.go:104); falling back to parentPkg would
          // mis-resolve any non-primitive field Header ever grew
          val childPkg =
            if (key == "Header") "std_msgs"
            else if (key.contains("/")) key.takeWhile(_ != '/')
            else parentPkg
          Rec(fieldLines(body).map { case (t, n) =>
            MsgField(n, resolve(childPkg, t, seen + key))
          })
        }
      arr match {
        case None     => elem
        case Some(-1) => VarArray(elem)
        case Some(n)  => FixedArray(elem, n)
      }
    }

    MsgDef(fieldLines(main).map { case (t, n) =>
      MsgField(n, resolve(pkg, t, Set.empty))
    })
  }

  def sparkType(t: FType): DataType = t match {
    case Prim(p) => p match {
      case "bool"              => BooleanType
      case "uint8" | "char" | "byte" => ShortType
      case "int8"              => ByteType
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
    case Rec(fs) =>
      StructType(fs.map(f => StructField(f.name, sparkType(f.tpe))))
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

  private def decodeAny(buf: ByteBuffer, t: FType): Any = t match {
    case p: Prim => decodePrim(buf, p)
    case Rec(fs) => Row.fromSeq(fs.map(f => decodeAny(buf, f.tpe)))
    case FixedArray(e, n) => Seq.fill(n)(decodeAny(buf, e))
    case VarArray(e) =>
      val n = buf.getInt()
      Seq.fill(n)(decodeAny(buf, e))
  }

  def decode(d: MsgDef, bytes: Array[Byte]): Row = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Row.fromSeq(d.fields.map(f => decodeAny(buf, f.tpe)))
  }

  /** Attach a `decoded` struct column by decoding `dataCol` with the
    * given definition — partition-local, no shuffle; Catalyst prunes
    * the binary column away when only decoded fields are referenced
    * downstream. */
  def decodeDf(df: DataFrame, definition: String, dataCol: String = "data",
      pkg: String = ""): DataFrame = {
    val defn = parse(definition, pkg)
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

  /** dp3's flat field view: dotted paths for nested records, `name[i]`
    * for fixed arrays shorter than 10; variable-length and long arrays
    * are skipped. Column ORDER matches the reference's AnalyzeSchema
    * queue discipline exactly (parser.go:551-589): per top-level field,
    * record subfields enqueue at the back, fixed-array elements at the
    * front — so `{a int8, b {c int8}, d int8}` flattens `a, d, b.c`. */
  def flatFields(d: MsgDef, prefix: String = "decoded")
      : Seq[(String, Column)] =
    d.fields.flatMap { f =>
      var queue = Queue((f.name, col(prefix).getField(f.name), f.tpe))
      val out = Seq.newBuilder[(String, Column)]
      while (queue.nonEmpty) {
        val ((name, expr, tpe), rest) = queue.dequeue
        queue = rest
        tpe match {
          case _: Prim => out += (name -> expr)
          case FixedArray(e, n) if n > 0 && n < 10 =>
            // elements go straight to the front
            queue = Queue((0 until n).map(i =>
              (s"$name[$i]", expr.getItem(i), e)): _*) ++ queue
          case _: FixedArray | _: VarArray => () // excluded from flat view
          case Rec(fs) =>
            // subfields enqueue at the back
            queue = queue ++ fs.map(sf =>
              (s"$name.${sf.name}", expr.getField(sf.name), sf.tpe))
        }
      }
      out.result()
    }

  def flatColumns(d: MsgDef, prefix: String = "decoded"): Seq[Column] =
    flatFields(d, prefix).map { case (name, expr) => expr.as(name) }
}
