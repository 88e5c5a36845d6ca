package graft.ros2

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.{UTF_8, UTF_16LE, UTF_16BE}

import scala.collection.immutable.Queue

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ROS2 IDL `.msg` schema parser — the reference's ros2msg module
  * (reference: server/util/ros2msg/msg_grammar.go:15-104 grammar,
  * transform.go:46-180 AST→schema transform; format documented at
  * https://docs.ros.org/en/iron/Concepts/Basic/About-Interfaces.html,
  * msg files only — no action/service support).
  *
  * ROS2 extends the ros1msg surface with: field DEFAULT values
  * (`int8 foo 10`, `string foo "bar"`), BOUNDED strings
  * (`string<=10`), BOUNDED arrays (`int8[<=10]`), and the extra
  * primitives wstring/char/byte. Constants (`uint8 NONE=0`) parse but
  * are skipped in the resolved schema, exactly like the reference
  * (transform.go:127-128,176-177). Sub-definitions are separated by
  * `=`-runs with `MSG:` headers; bare type names resolve against the
  * parent package, and `std_msgs/Header` additionally registers under
  * bare `Header` (transform.go:157-163).
  *
  * Original line-based recursive-descent implementation (the reference
  * uses the participle parser-combinator library); only the grammar
  * and transform CONTRACTS are shared, verified by porting the
  * reference's own test expectations (msg_grammar_test.go,
  * transform_test.go) into Ros2MsgSpec.
  */
object Ros2Msg {

  /** resolved type model, mirroring the reference's schema.Type */
  sealed trait RType
  final case class Prim(name: String, sizeBound: Int = 0) extends RType
  final case class Arr(items: RType, fixedSize: Int = 0,
      bounded: Boolean = false, sizeBound: Int = 0) extends RType
  final case class Rec(fields: Seq[RField]) extends RType

  final case class RField(name: String, tpe: RType,
      default: Option[Any] = None)
  final case class Ros2Schema(name: String, fields: Seq[RField])

  val primitives: Set[String] = Set(
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "float32", "float64", "string", "wstring", "bool",
    "time", "duration", "char", "byte")

  // --- raw AST -----------------------------------------------------------

  /** unresolved type spec, one per field/constant */
  final case class TypeSpec(name: String, sizeBound: Int,
      array: Boolean, bounded: Boolean, fixedSize: Int)

  private sealed trait Element
  private final case class FieldEl(name: String, tpe: TypeSpec,
      default: Option[Any]) extends Element
  private final case class ConstEl(name: String) extends Element

  /** `type[<=N]` / `type[N]` / `type[]` / `type<=N` / `type` with
    * optionally package-qualified names */
  private val TypeRe =
    """([A-Za-z0-9_]+(?:/[A-Za-z0-9_]+)*)(?:<=(\d+))?(?:\[(<=)?(\d+)?\])?""".r

  def parseType(spec: String): TypeSpec = spec.trim match {
    case TypeRe(name, bound, le, fixed) =>
      val isArray = spec.trim.endsWith("]")
      TypeSpec(name,
        sizeBound = Option(bound).map(_.toInt).getOrElse(0),
        array = isArray,
        bounded = le != null,
        fixedSize = Option(fixed).map(_.toInt).getOrElse(0))
    case other => throw new IllegalArgumentException(
      s"unparseable ros2 type: '$other'")
  }

  /** Strip an inline `#` comment, respecting quoted default values. */
  private def stripComment(line: String): String = {
    var inQuote: Char = 0
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuote != 0) {
        if (c == '\\') i += 1
        else if (c == inQuote) inQuote = 0
      } else if (c == '"' || c == '\'') inQuote = c
      else if (c == '#') return line.substring(0, i)
      i += 1
    }
    line
  }

  /** literal values: int, float, single/double-quoted string — outer
    * quotes stripped, inner escapes kept verbatim like the reference's
    * QuotedString.Capture (msg_grammar.go:44-49) */
  private def parseValue(s: String): Any = {
    val t = s.trim
    if (t.length >= 2 && (t.head == '"' || t.head == '\'')
      && t.last == t.head) t.substring(1, t.length - 1)
    else if (t.matches("[+-]?\\d+\\.\\d+")) t.toDouble
    else if (t.matches("[+-]?\\d+")) t.toLong
    else throw new IllegalArgumentException(s"unparseable value: '$t'")
  }

  private def parseElement(line: String): Option[Element] = {
    val clean = stripComment(line).trim
    if (clean.isEmpty) return None
    // constant: `type NAME=value` (whitespace around '=' elided);
    // a `<=` size bound inside the type spec is NOT the equals sign
    val eq = clean.indices.find(j => clean.charAt(j) == '='
      && (j == 0 || clean.charAt(j - 1) != '<')).getOrElse(-1)
    if (eq >= 0
      && clean.take(eq).trim.split("\\s+").length == 2) {
      val Array(_, name) = clean.take(eq).trim.split("\\s+")
      parseValue(clean.drop(eq + 1)) // validate the literal
      return Some(ConstEl(name))
    }
    val parts = clean.split("\\s+", 3)
    require(parts.length >= 2, s"unparseable ros2 field: '$clean'")
    val default = if (parts.length == 3) Some(parseValue(parts(2))) else None
    Some(FieldEl(parts(1), parseType(parts(0)), default))
  }

  private final case class RawDef(header: String,
      elements: Seq[Element])

  private def parseSection(lines: Seq[String]): Seq[Element] =
    lines.flatMap(parseElement)

  // --- parse + resolve ---------------------------------------------------

  /** Parse and resolve a full ROS2 message definition (main section +
    * `MSG:` sub-definitions) into the reference's schema shape. */
  def parse(definition: String, pkg: String, name: String): Ros2Schema = {
    val sections = definition.split("(?m)^\\s*=+\\s*$").toSeq
    val main = parseSection(sections.head.linesIterator.toSeq)
    val subdefs: Map[String, RawDef] = sections.tail.flatMap { sec =>
      val lines = sec.linesIterator
        .dropWhile(l => stripComment(l).trim.isEmpty).toSeq
      lines.headOption.map(l => stripComment(l).trim) match {
        case Some(h) if h.startsWith("MSG:") =>
          val full = h.drop(4).trim
          val d = RawDef(full, parseSection(lines.tail))
          if (full == "std_msgs/Header") Seq("Header" -> d, full -> d)
          else Seq(full -> d)
        case _ => Nil
      }
    }.toMap

    def resolve(parentPkg: String, t: TypeSpec,
        seen: Set[String]): RType = {
      val isPrim = primitives.contains(t.name)
      if (isPrim && !t.array) Prim(t.name, t.sizeBound)
      else if (isPrim && t.array)
        Arr(Prim(t.name), t.fixedSize, t.bounded, t.sizeBound)
      else {
        val (key, sub) = subdefs.get(t.name).map(t.name -> _)
          .orElse(subdefs.get(s"$parentPkg/${t.name}")
            .map(s"$parentPkg/${t.name}" -> _))
          .getOrElse(throw new IllegalArgumentException(
            s"failed to resolve subdep $parentPkg/${t.name}"))
        if (seen.contains(key)) throw new IllegalArgumentException(
          s"recursive ros2 type: $key")
        // a subdef used as a record must be namespaced
        // (reference: transform.go:108-110)
        if (!sub.header.contains("/"))
          throw new IllegalArgumentException(
            s"failed to resolve subdef type ${sub.header}")
        val subPkg = sub.header.takeWhile(_ != '/')
        val rec = Rec(sub.elements.collect {
          case FieldEl(n, tt, d) => RField(n,
            resolve(subPkg, tt, seen + key), d)
        })
        // record arrays carry only FixedSize — the reference drops the
        // bound for non-primitive items (transform.go:79-95)
        if (t.array) Arr(rec, t.fixedSize) else rec
      }
    }

    Ros2Schema(s"$pkg/$name", main.collect {
      case FieldEl(n, t, d) => RField(n, resolve(pkg, t, Set.empty), d)
    })
  }

  // --- Spark type mapping ------------------------------------------------

  /** Same widening rules as ros1 (SURVEY §1.2): unsigned ints widen one
    * step (uint64 stays Long with documented wraparound), time/duration
    * are epoch/span NANOSECONDS as Long, and the ros2-only wstring maps
    * to StringType. Size bounds affect the wire format only, never the
    * logical type. */
  def sparkType(t: RType): DataType = t match {
    case Prim(p, _) => p match {
      case "bool"                    => BooleanType
      case "uint8" | "char" | "byte" => ShortType
      case "int8"                    => ByteType
      case "int16"                   => ShortType
      case "uint16"                  => IntegerType
      case "int32"                   => IntegerType
      case "uint32"                  => LongType
      case "int64" | "uint64"        => LongType
      case "float32"                 => FloatType
      case "float64"                 => DoubleType
      case "string" | "wstring"      => StringType
      case "time" | "duration"       => LongType // nanoseconds
    }
    case Rec(fs) =>
      StructType(fs.map(f => StructField(f.name, sparkType(f.tpe))))
    case Arr(e, _, _, _) => ArrayType(sparkType(e), containsNull = false)
  }

  def structType(s: Ros2Schema): StructType =
    StructType(s.fields.map(f => StructField(f.name, sparkType(f.tpe))))

  // --- CDR decode --------------------------------------------------------

  /** XCDR1 payload decode — the wire format ROS2 messages carry in MCAP
    * (`message_encoding = "cdr"`). This is parity-EXCEEDING surface:
    * the reference parses ros2msg schemas (server/util/ros2msg/) but
    * never wires a CDR decoder, so the contract here is the public DDS
    * serialization rules (OMG DDSI-RTPS / XTypes XCDR1, as produced by
    * rmw_fastrtps):
    *
    *  - 4-byte encapsulation header; byte 1 bit 0 selects endianness
    *    (0x0000 = big, 0x0001 = little). Options bytes ignored.
    *  - every primitive aligns to its own size, with the alignment
    *    ORIGIN at the first byte after the encapsulation header.
    *  - string = u32 length INCLUDING the NUL terminator + bytes;
    *    wstring = u32 UTF-16 code-unit count (no terminator) + u16s.
    *  - sequences (unbounded AND bounded arrays) = u32 count +
    *    elements; fixed arrays are bare elements. Bounds are wire-time
    *    constraints only and do not change the serialized shape.
    *  - time/duration = int32 sec + uint32 nanosec (builtin_interfaces
    *    layout), decoded to nanoseconds like the ros1 path. */
  private final class CdrBuf(bytes: Array[Byte]) {
    require(bytes.length >= 4, "CDR payload shorter than its header")
    private val little = (bytes(1) & 0x01) == 1
    private val buf = ByteBuffer.wrap(bytes, 4, bytes.length - 4).slice()
    buf.order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)

    private def align(n: Int): Unit = {
      val rem = buf.position() % n
      if (rem != 0) buf.position(buf.position() + n - rem)
    }
    def i8(): Byte = buf.get()
    def u8(): Short = (buf.get() & 0xff).toShort
    def i16(): Short = { align(2); buf.getShort() }
    def u16(): Int = { align(2); buf.getShort() & 0xffff }
    def i32(): Int = { align(4); buf.getInt() }
    def u32(): Long = { align(4); buf.getInt().toLong & 0xffffffffL }
    def i64(): Long = { align(8); buf.getLong() }
    def f32(): Float = { align(4); buf.getFloat() }
    def f64(): Double = { align(8); buf.getDouble() }
    def str(): String = {
      val n = u32().toInt
      val b = new Array[Byte](n); buf.get(b)
      // length counts the NUL terminator; tolerate writers that omit it
      val len = if (n > 0 && b(n - 1) == 0) n - 1 else n
      new String(b, 0, len, UTF_8)
    }
    def wstr(): String = {
      val n = u32().toInt
      val b = new Array[Byte](2 * n); buf.get(b)
      new String(b, if (little) UTF_16LE else UTF_16BE)
    }
  }

  private def decodePrim(c: CdrBuf, name: String): Any = name match {
    case "bool"                    => c.i8() != 0
    case "int8"                    => c.i8()
    case "uint8" | "char" | "byte" => c.u8()
    case "int16"                   => c.i16()
    case "uint16"                  => c.u16()
    case "int32"                   => c.i32()
    case "uint32"                  => c.u32()
    case "int64" | "uint64"        => c.i64()
    case "float32"                 => c.f32()
    case "float64"                 => c.f64()
    case "string"                  => c.str()
    case "wstring"                 => c.wstr()
    case "time" | "duration" =>
      val secs = c.i32().toLong
      val nsecs = c.u32()
      secs * 1000000000L + nsecs
  }

  private def decodeAny(c: CdrBuf, t: RType): Any = t match {
    case Prim(p, _) => decodePrim(c, p)
    case Rec(fs)    => Row.fromSeq(fs.map(f => decodeAny(c, f.tpe)))
    case Arr(e, fixed, _, _) =>
      val n = if (fixed > 0) fixed else c.u32().toInt
      Seq.fill(n)(decodeAny(c, e))
  }

  def decode(s: Ros2Schema, bytes: Array[Byte]): Row = {
    val c = new CdrBuf(bytes)
    Row.fromSeq(s.fields.map(f => decodeAny(c, f.tpe)))
  }

  /** Attach a `decoded` struct column by CDR-decoding `dataCol` with
    * the given ros2msg definition — partition-local, no shuffle, same
    * contract as [[graft.ros1.Ros1Msg.decodeDf]]: Catalyst prunes the
    * binary column away when only decoded fields are referenced. */
  def decodeDf(df: DataFrame, definition: String, pkg: String,
      name: String, dataCol: String = "data"): DataFrame = {
    val schema = parse(definition, pkg, name)
    val outSchema = StructType(
      df.schema.fields :+ StructField("decoded", structType(schema)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idx = df.schema.fieldIndex(dataCol)
    df.mapPartitions { it =>
      it.map { row =>
        val decoded = decode(schema, row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }(enc)
  }

  /** dp3's flat field view over a decoded ros2 struct — identical queue
    * discipline to [[graft.ros1.Ros1Msg.flatFields]] (the reference's
    * AnalyzeSchema is encoding-agnostic, server/util/schema/parser.go:
    * 551-589): record subfields to the BACK, fixed-array elements to
    * the FRONT; fixed arrays shorter than 10 expand to `name[i]`;
    * variable-length, bounded, and long arrays are excluded. */
  def flatFields(s: Ros2Schema, prefix: String = "decoded")
      : Seq[(String, Column)] =
    s.fields.flatMap { f =>
      var queue = Queue((f.name, col(prefix).getField(f.name), f.tpe))
      val out = Seq.newBuilder[(String, Column)]
      while (queue.nonEmpty) {
        val ((name, expr, tpe), rest) = queue.dequeue
        queue = rest
        tpe match {
          case _: Prim => out += (name -> expr)
          case Arr(e, n, bounded, _) if !bounded && n > 0 && n < 10 =>
            queue = Queue((0 until n).map(i =>
              (s"$name[$i]", expr.getItem(i), e)): _*) ++ queue
          case _: Arr => () // var-length / bounded / long: excluded
          case Rec(fs) =>
            queue = queue ++ fs.map(sf =>
              (s"$name.${sf.name}", expr.getField(sf.name), sf.tpe))
        }
      }
      out.result()
    }

  def flatColumns(s: Ros2Schema, prefix: String = "decoded"): Seq[Column] =
    flatFields(s, prefix).map { case (name, expr) => expr.as(name) }
}
