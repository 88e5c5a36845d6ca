package graft.ros2

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
}
