package graft.engine

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import SqliteValue.SqliteEvalError

/** SQLite core scalar functions with VALUE semantics Spark's builtins
  * lack: ASCII-only case folding, numeric-coercion of text operands,
  * SQLite's substr index rules, `%!.15g` rendering inside hex/quote —
  * all probed live on 3.40 and pinned in SqliteExprSpec. One generic
  * CodegenFallback node keyed by function name; registered over the
  * engine's PRIVATE session by [[SqliteFunctions]] (shadowing the Spark
  * builtins there only). */
case class SqliteScalar(fn: String, children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def nullable: Boolean = true

  override def dataType: DataType = fn match {
    case "length" | "instr" | "sign" => LongType
    case "round" => DoubleType
    case "abs" =>
      if (SqliteExprs.isIntegral(children.head.dataType)) LongType
      else DoubleType
    // ceil/floor/trunc pass integer inputs through unchanged (probed:
    // ceil(3) → 3 integer, ceil(3.0) → 3.0 real); everything else in the
    // math family answers real
    case "ceil" | "ceiling" | "floor" | "trunc" =>
      if (SqliteExprs.isIntegral(children.head.dataType)) LongType
      else DoubleType
    case f if SqliteScalar.mathFns(f) => DoubleType
    case "zeroblob" => BinaryType
    case "substr" =>
      if (children.head.dataType == BinaryType) BinaryType else StringType
    case _ => StringType
  }

  override def eval(input: InternalRow): Any =
    SqliteExprs.fit(dataType,
      SqliteScalar.eval(fn, children.map(c => c.eval(input))))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SqliteScalar =
    copy(children = newChildren)

  override def prettyName: String = fn
}

object SqliteScalar {

  /** The SQLITE_ENABLE_MATH_FUNCTIONS family (present in the 3.40.1
    * oracle build, all semantics probed live): strict numeric coercion —
    * non-numeric text answers NULL, never 0.0 — NaN results answer NULL
    * while infinities pass through (exp(1000) → Inf, but acos(2) → NULL),
    * and the log family pre-checks its domain (log(-1) → NULL). */
  private[engine] val mathFns: Set[String] = Set(
    "ceil", "ceiling", "floor", "trunc",
    "ln", "log", "log10", "log2", "exp", "sqrt", "pow", "power", "mod",
    "pi", "sin", "cos", "tan", "sinh", "cosh", "tanh",
    "asin", "acos", "atan", "asinh", "acosh", "atanh", "atan2",
    "degrees", "radians")

  /** Registered names → accepted arity range. */
  val arities: Map[String, (Int, Int)] = Map(
    "abs" -> (1, 1), "sign" -> (1, 1), "round" -> (1, 2),
    "length" -> (1, 1),
    "upper" -> (1, 1), "lower" -> (1, 1),
    "hex" -> (1, 1), "quote" -> (1, 1),
    "substr" -> (2, 3), "substring" -> (2, 3),
    "instr" -> (2, 2), "replace" -> (3, 3),
    "trim" -> (1, 2), "ltrim" -> (1, 2), "rtrim" -> (1, 2),
    "zeroblob" -> (1, 1)) ++
    mathFns.map {
      case f @ ("pow" | "power" | "mod" | "atan2") => f -> (2, 2)
      case "pi" => "pi" -> (0, 0)
      case "log" => "log" -> (1, 2)
      case f => f -> (1, 1)
    }

  /** Build (folding all-literal calls immediately, with full dynamic
    * typing — same contract as [[SqliteRewrite]]'s fold). */
  def build(fn: String, args: Seq[Expression]): Expression = {
    val (lo, hi) = arities(fn)
    require(args.size >= lo && args.size <= hi,
      s"wrong number of arguments to function $fn()")
    val canon = fn match {
      case "substring" => "substr"
      case "ceiling" => "ceil"
      case "power" => "pow"
      case other => other
    }
    if (args.forall(_.isInstanceOf[Literal]))
      SqliteRewrite.dynLit(eval(canon,
        args.map(_.asInstanceOf[Literal].value)))
    else SqliteScalar(canon, args)
  }

  private def num(a: Any): Any = SqliteValue.numCoerce(a)

  private def asText(a: Any): String = SqliteValue.renderText(a)

  private def foldAsciiUp(s: String): String = {
    val c = s.toCharArray
    var i = 0
    while (i < c.length) {
      if (c(i) >= 'a' && c(i) <= 'z') c(i) = (c(i) - 32).toChar
      i += 1
    }
    new String(c)
  }

  private def foldAsciiDown(s: String): String = {
    val c = s.toCharArray
    var i = 0
    while (i < c.length) {
      if (c(i) >= 'A' && c(i) <= 'Z') c(i) = (c(i) + 32).toChar
      i += 1
    }
    new String(c)
  }

  /** SQLite printf's arRound table (decimal rounder constants). */
  private[engine] val AR: Array[Double] = Array(5e-01, 5e-02, 5e-03, 5e-04,
    5e-05, 5e-06, 5e-07, 5e-08, 5e-09, 5e-10)

  private val HEX = "0123456789ABCDEF"

  private def hexOf(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(HEX((b >> 4) & 0xf)).append(HEX(b & 0xf))
    }
    sb.toString
  }

  def eval(fn: String, args0: Seq[Any]): Any = {
    val args = args0.map(SqliteValue.norm)
    fn match {
      case "abs" =>
        // text/blob operands coerce through REAL (probed abs('abc') →
        // 0.0, a real, where 'abc'+0 is integer 0)
        val v = args.head match {
          case s @ (_: UTF8String | _: Array[Byte]) => SqliteValue.castReal(s)
          case other => other
        }
        v match {
          case null => null
          case l: java.lang.Long =>
            if (l.longValue == Long.MinValue)
              throw new SqliteEvalError("integer overflow")
            else java.lang.Long.valueOf(math.abs(l.longValue))
          case d: java.lang.Double =>
            java.lang.Double.valueOf(math.abs(d.doubleValue))
          case _ => null
        }

      case "sign" =>
        // probed: sign applies only to WHOLE numbers — sign('3x') → NULL
        val v = args.head match {
          case null => null
          case s: UTF8String => SqliteValue.wholeNum(s.toString).orNull
          case b: Array[Byte] =>
            SqliteValue.wholeNum(new String(b,
              java.nio.charset.StandardCharsets.UTF_8)).orNull
          case other => other
        }
        v match {
          case null => null
          case l: java.lang.Long =>
            java.lang.Long.valueOf(java.lang.Long.signum(l.longValue).toLong)
          case d: java.lang.Double =>
            java.lang.Long.valueOf(math.signum(d.doubleValue).toLong)
          case _ => null
        }

      case "round" =>
        val x = num(args.head)
        if (x == null) return null
        val p0 = if (args.size > 1) SqliteValue.castInt(args(1)) else
          java.lang.Long.valueOf(0L)
        if (p0 == null) return null
        // probed: negative precision is treated as 0 (round(123,-1) → 123.0)
        val p = math.max(0L, math.min(30L,
          p0.asInstanceOf[java.lang.Long].longValue)).toInt
        val d = x match {
          case l: java.lang.Long => return java.lang.Double.valueOf(
            l.doubleValue) // integers round to themselves
          case dd: java.lang.Double => dd.doubleValue
          case _ => 0.0
        }
        if (d.isInfinite) return java.lang.Double.valueOf(d)
        // SQLite's %.pf is its own printf: decimal rounder 5·10^-(p+1)
        // plus a value-scaled correction (realvalue·3e-16) when the
        // value is small enough, then 16-significant-digit extraction
        // truncated at p fraction digits. Probed triple: round(0.15,1)
        // → 0.2, round(0.1499999999999999,1) → 0.1, round(9.995,2) →
        // 10.0 — only this exact sequence reproduces all three.
        val av = math.abs(d)
        var idx = p
        var rounder = SqliteScalar.AR(idx % 10)
        while (idx >= 10) { rounder *= 1e-10; idx -= 10 }
        val bits = java.lang.Double.doubleToLongBits(av)
        val ex = -1023 + ((bits >> 52) & 0x7ff).toInt
        if (p + ex / 3 < 15) rounder += av * 3e-16
        val sum = new java.math.BigDecimal(av + rounder)
          .round(new java.math.MathContext(16, java.math.RoundingMode.DOWN))
          .setScale(p, java.math.RoundingMode.DOWN).doubleValue
        java.lang.Double.valueOf(if (d < 0) -sum else sum)

      case "length" => args.head match {
        case null => null
        case b: Array[Byte] => java.lang.Long.valueOf(b.length.toLong)
        case s: UTF8String => java.lang.Long.valueOf(s.numChars.toLong)
        case other =>
          java.lang.Long.valueOf(
            UTF8String.fromString(asText(other)).numChars.toLong)
      }

      case "upper" => args.head match {
        case null => null
        case b: Array[Byte] => b // probed: blobs pass through unchanged
        case other => UTF8String.fromString(foldAsciiUp(asText(other)))
      }

      case "lower" => args.head match {
        case null => null
        case b: Array[Byte] => b
        case other => UTF8String.fromString(foldAsciiDown(asText(other)))
      }

      case "hex" => args.head match {
        case null => UTF8String.fromString("")
        case b: Array[Byte] => UTF8String.fromString(hexOf(b))
        case other => UTF8String.fromString(hexOf(asText(other)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }

      case "quote" => args.head match {
        case null => UTF8String.fromString("NULL")
        case l: java.lang.Long => UTF8String.fromString(l.toString)
        case d: java.lang.Double =>
          // %!.15g when it round-trips, else the long %!.20e form (the
          // exact low digits of SQLite's own float loop are not
          // reproduced — documented, excluded from the golden battery)
          val s = SqliteValue.renderReal(d.doubleValue)
          val out = if (java.lang.Double.parseDouble(s) == d.doubleValue) s
          else String.format(java.util.Locale.ROOT, "%.20e", d)
          UTF8String.fromString(out)
        case s: UTF8String =>
          UTF8String.fromString("'" + s.toString.replace("'", "''") + "'")
        case b: Array[Byte] => UTF8String.fromString("X'" + hexOf(b) + "'")
        case _ => null
      }

      case "substr" =>
        if (args.exists(_ == null)) return null
        val p1v = SqliteValue.castInt(args(1)).asInstanceOf[java.lang.Long]
        val p2v: java.lang.Long =
          if (args.size > 2)
            SqliteValue.castInt(args(2)).asInstanceOf[java.lang.Long]
          else null
        args.head match {
          case b: Array[Byte] =>
            val (off, len) = substrRange(b.length, p1v.longValue,
              Option(p2v).map(_.longValue))
            java.util.Arrays.copyOfRange(b, off, off + len)
          case other =>
            val s = asText(other)
            val n = s.codePointCount(0, s.length)
            val (off, len) = substrRange(n, p1v.longValue,
              Option(p2v).map(_.longValue))
            val a = s.offsetByCodePoints(0, off)
            val z = s.offsetByCodePoints(a, len)
            UTF8String.fromString(s.substring(a, z))
        }

      case "instr" =>
        if (args.exists(_ == null)) return null
        (args.head, args(1)) match {
          case (a: Array[Byte], b: Array[Byte]) =>
            java.lang.Long.valueOf(byteIndexOf(a, b).toLong)
          case (x, y) =>
            val hay = asText(x); val needle = asText(y)
            if (needle.isEmpty) return java.lang.Long.valueOf(
              if (hay != null) 1L else 0L) // probed: instr(s,'') → 1
            val i = hay.indexOf(needle)
            java.lang.Long.valueOf(
              if (i < 0) 0L else hay.codePointCount(0, i).toLong + 1L)
        }

      case "replace" =>
        if (args.exists(_ == null)) return null
        val s = asText(args.head); val from = asText(args(1))
        val to = asText(args(2))
        UTF8String.fromString(
          if (from.isEmpty) s else s.replace(from, to))

      case "trim" | "ltrim" | "rtrim" =>
        if (args.head == null) return null
        if (args.size > 1 && args(1) == null) return null
        val s = asText(args.head)
        val set: Set[Int] =
          if (args.size > 1) asText(args(1)).codePoints()
            .toArray.toSet
          else Set(' '.toInt)
        var a = 0; var z = s.length
        if (fn != "rtrim")
          while (a < z && set.contains(s.codePointAt(a)))
            a += Character.charCount(s.codePointAt(a))
        if (fn != "ltrim")
          while (z > a && set.contains(s.codePointBefore(z)))
            z -= Character.charCount(s.codePointBefore(z))
        UTF8String.fromString(s.substring(a, z))

      case "zeroblob" =>
        val n = SqliteValue.castInt(args.head)
        if (n == null) return null
        val len = n.asInstanceOf[java.lang.Long].longValue
        if (len > 100000000L)
          throw new SqliteEvalError("string or blob too big")
        new Array[Byte](math.max(0L, len).toInt)

      case "pi" => java.lang.Double.valueOf(math.Pi)

      case "ceil" | "floor" | "trunc" => mathNum(args.head) match {
        case null => null
        case l: java.lang.Long => l // integers pass through (probed)
        case d: java.lang.Double =>
          val v = d.doubleValue
          java.lang.Double.valueOf(fn match {
            case "floor" => math.floor(v)
            case "trunc" => if (v < 0) math.ceil(v) else math.floor(v)
            case _ => math.ceil(v)
          })
        case _ => null
      }

      case "mod" =>
        // always real, NULL divisor-zero (probed mod(7,0) → NULL,
        // mod(-7,3) → -1.0: C fmod truncated semantics)
        (toD(args.head), toD(args(1))) match {
          case (x: java.lang.Double, y: java.lang.Double) =>
            if (y.doubleValue == 0.0) null
            else nanNull(x.doubleValue % y.doubleValue)
          case _ => null
        }

      case "log" | "ln" | "log10" | "log2" =>
        // domain pre-checked: any non-positive operand answers NULL
        // (probed log(-1), log(0,8), log(1,8) → NULL via the Inf check)
        if (fn == "log" && args.size > 1) {
          (toD(args.head), toD(args(1))) match {
            case (b: java.lang.Double, x: java.lang.Double) =>
              if (b.doubleValue <= 0.0 || x.doubleValue <= 0.0) null
              else finiteNull(math.log(x.doubleValue) / math.log(b.doubleValue))
            case _ => null
          }
        } else toD(args.head) match {
          case x: java.lang.Double =>
            if (x.doubleValue <= 0.0) null
            else finiteNull(fn match {
              case "ln" => math.log(x.doubleValue)
              case "log2" => math.log(x.doubleValue) / math.log(2.0)
              case _ => math.log10(x.doubleValue)
            })
          case _ => null
        }

      case "pow" | "atan2" => (toD(args.head), toD(args(1))) match {
        case (x: java.lang.Double, y: java.lang.Double) =>
          nanNull(if (fn == "pow") math.pow(x.doubleValue, y.doubleValue)
          else math.atan2(x.doubleValue, y.doubleValue))
        case _ => null
      }

      case "exp" | "sqrt" | "sin" | "cos" | "tan" | "sinh" | "cosh" |
          "tanh" | "asin" | "acos" | "atan" | "asinh" | "acosh" |
          "atanh" | "degrees" | "radians" => toD(args.head) match {
        case x: java.lang.Double =>
          val v = x.doubleValue
          nanNull(fn match {
            case "exp" => math.exp(v)
            case "sqrt" => math.sqrt(v)
            case "sin" => math.sin(v)
            case "cos" => math.cos(v)
            case "tan" => math.tan(v)
            case "sinh" => math.sinh(v)
            case "cosh" => math.cosh(v)
            case "tanh" => math.tanh(v)
            case "asin" => math.asin(v)
            case "acos" => math.acos(v)
            case "atan" => math.atan(v)
            case "asinh" => math.log(v + math.sqrt(v * v + 1.0))
            case "acosh" => math.log(v + math.sqrt(v * v - 1.0))
            case "atanh" => 0.5 * math.log((1.0 + v) / (1.0 - v))
            case "degrees" => math.toDegrees(v)
            case _ => math.toRadians(v)
          })
        case _ => null
      }

      case other =>
        throw new IllegalStateException(s"unknown sqlite scalar: $other")
    }
  }

  /** Math-family numeric coercion: STRICT — non-numeric text answers
    * NULL, never 0.0 (probed ceil('abc') → NULL where abs('abc') → 0.0);
    * whole-integer text stays integer (trunc('5') → 5, an integer). */
  private def mathNum(a: Any): Any = SqliteValue.norm(a) match {
    case null => null
    case s: UTF8String => SqliteValue.wholeNum(s.toString.trim).orNull
    case b: Array[Byte] => SqliteValue.wholeNum(
      new String(b, java.nio.charset.StandardCharsets.UTF_8).trim).orNull
    case other => other
  }

  private def toD(a: Any): java.lang.Double = mathNum(a) match {
    case l: java.lang.Long => java.lang.Double.valueOf(l.doubleValue)
    case d: java.lang.Double => d
    case _ => null
  }

  /** NaN → NULL; infinities pass through (probed exp(1000) → Inf,
    * atanh(1) → Inf, but acos(2) → NULL). */
  private def nanNull(v: Double): Any =
    if (v.isNaN) null else java.lang.Double.valueOf(v)

  private def finiteNull(v: Double): Any =
    if (v.isNaN || v.isInfinite) null else java.lang.Double.valueOf(v)

  /** SQLite's substr index arithmetic over n units (code points or
    * bytes), re-derived from live probes: 1-based, position 0 exists as
    * an empty slot before 1, negative start counts from the end,
    * negative length takes the units BEFORE the start. Returns
    * (0-based offset, length). */
  private def substrRange(n: Int, y0: Long, z0: Option[Long]): (Int, Int) = {
    var p1 = y0
    var p2 = z0.getOrElse(n.toLong + 1)
    if (p1 < 0) {
      p1 = n + p1
      if (p1 < 0) { if (p2 > 0) p2 += p1; p1 = 0 }
    } else if (p1 > 0) p1 -= 1
    else if (p2 > 0) p2 -= 1 // Y = 0: the empty slot consumes one unit
    if (p2 < 0) {
      // |p2| units BEFORE p1 (clipped at the left edge)
      val want = -p2
      val start = math.max(0L, p1 - want)
      return (start.toInt, math.min(p1, n.toLong).toInt - start.toInt)
    }
    val start = math.min(p1, n.toLong)
    val end = math.min(p1 + p2, n.toLong)
    (start.toInt, math.max(0L, end - start).toInt)
  }

  private def byteIndexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    if (needle.isEmpty) return 1
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i + 1
      i += 1
    }
    0
  }
}
