package graft.engine

import org.apache.spark.unsafe.types.UTF8String

/** SQLite's dynamic value semantics over the engine's runtime values —
  * the shared evaluator behind the [[SqliteExprs]] Catalyst expressions
  * and [[SqliteRewrite]]'s literal folding.
  *
  * The reference executes every user statement inside SQLite itself
  * (`db/src/db.rs:278`), so its expression layer is SQLite's: integer
  * division, NULL on divide-by-zero, text-to-number prefix coercion,
  * storage-class comparison ordering, `%!.15g` real rendering. Every rule
  * here was probed live against SQLite 3.40 and is pinned differentially
  * in SqliteExprSpec (goldens) and the OLTP fuzzer's expression grammar.
  *
  * Value domain after [[norm]]: null | java.lang.Long | java.lang.Double
  * | UTF8String | Array[Byte]. Performance note: this evaluator serves
  * the OLTP envelope only (statement-sized row counts); the analytics
  * path never sees it.
  */
object SqliteValue {

  /** Loud, SQLite-shaped runtime error (SQLite: `abs(-9223372036854775808)`
    * → "integer overflow"). */
  final class SqliteEvalError(msg: String) extends RuntimeException(msg)

  // ---------- normalization ------------------------------------------------

  /** Normalize any Catalyst runtime value into the SQLite domain. A NaN
    * double becomes NULL (SQLite stores NaN as NULL, probed). */
  def norm(a: Any): Any = a match {
    case null => null
    case v: Long => java.lang.Long.valueOf(v)
    case v: Int => java.lang.Long.valueOf(v.toLong)
    case v: Short => java.lang.Long.valueOf(v.toLong)
    case v: Byte => java.lang.Long.valueOf(v.toLong)
    case v: Boolean => java.lang.Long.valueOf(if (v) 1L else 0L)
    case v: Double => if (v.isNaN) null else java.lang.Double.valueOf(v)
    case v: Float =>
      if (v.isNaN) null else java.lang.Double.valueOf(v.toDouble)
    case v: java.math.BigDecimal => java.lang.Double.valueOf(v.doubleValue)
    case v: BigDecimal => java.lang.Double.valueOf(v.doubleValue)
    case v: org.apache.spark.sql.types.Decimal =>
      java.lang.Double.valueOf(v.toDouble)
    case v: UTF8String => v
    case v: String => UTF8String.fromString(v)
    case v: Array[Byte] => v
    case v => UTF8String.fromString(v.toString)
  }

  /** Storage class of a normalized value: 0 numeric, 1 text, 2 blob. */
  def storageClass(a: Any): Int = a match {
    case _: java.lang.Long | _: java.lang.Double => 0
    case _: UTF8String => 1
    case _: Array[Byte] => 2
    case _ => 0
  }

  private def blobText(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  private def textOf(a: Any): String = a match {
    case s: UTF8String => s.toString
    case b: Array[Byte] => blobText(b)
    case _ => throw new IllegalStateException("textOf on non-text")
  }

  // ---------- text → number coercion ---------------------------------------

  /** Longest numeric prefix of `s`, SQLite-style: optional sign, digits,
    * optional fraction, optional exponent (counted only if at least one
    * digit follows `e[+-]`). Returns None when no digit is consumed.
    * Integer results stay Long while the text is pure-integer form AND
    * fits i64; otherwise Double (probed: '1e'+0 → 1 integer; '1.'+0 →
    * 1.0 real; '9223372036854775808'+0 → real). */
  def parseNumPrefix(s0: String): Option[Any] = {
    val s = s0
    var i = 0
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    val start = i
    if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
    var intDigits = 0
    while (i < s.length && s.charAt(i).isDigit) { i += 1; intDigits += 1 }
    val intEnd = i
    var fracDigits = 0
    var hasDot = false
    if (i < s.length && s.charAt(i) == '.') {
      hasDot = true; i += 1
      while (i < s.length && s.charAt(i).isDigit) { i += 1; fracDigits += 1 }
    }
    var hasExp = false
    if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E') &&
      (intDigits > 0 || fracDigits > 0)) {
      var j = i + 1
      if (j < s.length && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
      var expDigits = 0
      while (j < s.length && s.charAt(j).isDigit) { j += 1; expDigits += 1 }
      if (expDigits > 0) { hasExp = true; i = j }
    }
    if (intDigits == 0 && fracDigits == 0) return None
    val text = s.substring(start, if (hasDot && fracDigits == 0 && !hasExp)
      intEnd + 1 else i)
    if (!hasDot && !hasExp) {
      // pure integer form: Long when it fits, else promote to real
      try Some(java.lang.Long.valueOf(java.lang.Long.parseLong(
        s.substring(start, intEnd))))
      catch { case _: NumberFormatException =>
        Some(java.lang.Double.valueOf(text.toDouble)) }
    } else Some(java.lang.Double.valueOf(text.toDouble))
  }

  /** Whether the WHOLE (trimmed) text is a well-formed number — SQLite's
    * test for applying NUMERIC affinity in comparisons ('5.0' converts,
    * '5x' stays text). */
  def wholeNum(s0: String): Option[Any] = {
    val s = s0.trim
    if (s.isEmpty) return None
    var i = 0
    if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
    var intD = 0; var fracD = 0; var expD = 0
    while (i < s.length && s.charAt(i).isDigit) { i += 1; intD += 1 }
    var hasDot = false; var hasExp = false
    if (i < s.length && s.charAt(i) == '.') {
      hasDot = true; i += 1
      while (i < s.length && s.charAt(i).isDigit) { i += 1; fracD += 1 }
    }
    if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      hasExp = true; i += 1
      if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      while (i < s.length && s.charAt(i).isDigit) { i += 1; expD += 1 }
      if (expD == 0) return None
    }
    if (i != s.length || intD + fracD == 0) return None
    if (!hasDot && !hasExp)
      try Some(java.lang.Long.valueOf(java.lang.Long.parseLong(s)))
      catch { case _: NumberFormatException =>
        Some(java.lang.Double.valueOf(s.toDouble)) }
    else Some(java.lang.Double.valueOf(s.toDouble))
  }

  /** Numeric coercion for arithmetic operands: text/blob parse their
    * numeric prefix (no prefix → integer 0, probed 'abc'+1 → 1). */
  def numCoerce(a: Any): Any = norm(a) match {
    case null => null
    case v: java.lang.Long => v
    case v: java.lang.Double => v
    case v: UTF8String =>
      parseNumPrefix(v.toString).getOrElse(java.lang.Long.valueOf(0L))
    case v: Array[Byte] =>
      parseNumPrefix(blobText(v)).getOrElse(java.lang.Long.valueOf(0L))
    case _ => java.lang.Long.valueOf(0L)
  }

  // ---------- casts ---------------------------------------------------------

  private def truncToI64(d: Double): Long =
    if (d.isNaN) 0L
    else if (d >= 9.223372036854776e18) Long.MaxValue
    else if (d <= -9.223372036854776e18) Long.MinValue
    else d.toLong

  /** CAST(x AS INTEGER): digit-prefix parse on text ('12.9' → 12, '1e3' →
    * 1), truncation toward zero with i64 clamping on reals (probed). */
  def castInt(a: Any): Any = norm(a) match {
    case null => null
    case v: java.lang.Long => v
    case v: java.lang.Double => java.lang.Long.valueOf(truncToI64(v))
    case other =>
      val s = textOf(other)
      var i = 0
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      var d = 0
      while (i < s.length && s.charAt(i).isDigit) { i += 1; d += 1 }
      if (d == 0) java.lang.Long.valueOf(0L)
      else try java.lang.Long.valueOf(
        java.lang.Long.parseLong(s.substring(start, i)))
      catch { case _: NumberFormatException =>
        java.lang.Long.valueOf(
          if (s.charAt(start) == '-') Long.MinValue else Long.MaxValue)
      }
  }

  /** CAST(x AS REAL): numeric-prefix parse on text, always real. */
  def castReal(a: Any): Any = norm(a) match {
    case null => null
    case v: java.lang.Long => java.lang.Double.valueOf(v.doubleValue)
    case v: java.lang.Double => v
    case other =>
      val p = parseNumPrefix(textOf(other))
        .getOrElse(java.lang.Long.valueOf(0L))
      p match {
        case l: java.lang.Long => java.lang.Double.valueOf(l.doubleValue)
        case d => d
      }
  }

  /** CAST(x AS NUMERIC): numbers keep their class (CAST(12.0 AS NUMERIC)
    * → 12.0 real, probed); text prefix-parses, then integralizes when the
    * parse is losslessly integer ('12.0' → 12). */
  def castNumeric(a: Any): Any = norm(a) match {
    case null => null
    case v: java.lang.Long => v
    case v: java.lang.Double => v
    case other =>
      parseNumPrefix(textOf(other)).getOrElse(java.lang.Long.valueOf(0L)) match {
        case l: java.lang.Long => l
        case d: java.lang.Double =>
          val dv = d.doubleValue
          if (dv == StrictMath.rint(dv) && math.abs(dv) < 9.007199254740992e15)
            java.lang.Long.valueOf(dv.toLong)
          else d
        case x => x
      }
  }

  /** SQLite's `%!.15g` real rendering: 15 significant digits, forced
    * fraction, exponent form outside [1e-4, 1e15) (probed battery:
    * '0.1', '0.333333333333333', '1.0e+20', '100000000000000.0',
    * '1.23456789012346e+15', 'Inf', '0.0' for -0.0). */
  def renderReal(d: Double): String = {
    if (d.isNaN) return "" // unreachable: NaN normalizes to NULL
    if (d.isInfinite) return if (d > 0) "Inf" else "-Inf"
    if (d == 0.0) return "0.0"
    val neg = d < 0 || (d == 0.0 && 1.0 / d < 0)
    val ad = math.abs(d)
    // %.14e gives exactly 15 significant digits, correctly rounded
    val e = String.format(java.util.Locale.ROOT, "%.14e", ad)
    val cut = e.indexOf('e')
    var mant = e.substring(0, cut).replace(".", "") // 15 digits
    var exp = Integer.parseInt(e.substring(cut + 1))
    // rounding in %.14e can carry: "9.99...e-1" → mantissa "100..."? no —
    // Java renders the carried form directly ("1.00000000000000e+00")
    // trim trailing zeros of the significand
    var len = mant.length
    while (len > 1 && mant.charAt(len - 1) == '0') len -= 1
    mant = mant.substring(0, len)
    // java StringBuilder: scala's would auto-tuple 3-arg append calls
    val sb = new java.lang.StringBuilder
    if (neg) sb.append('-')
    if (exp >= -4 && exp < 15) {
      if (exp >= 0) {
        if (mant.length > exp + 1) {
          sb.append(mant, 0, exp + 1).append('.')
            .append(mant, exp + 1, mant.length)
        } else {
          sb.append(mant)
          var k = mant.length
          while (k <= exp) { sb.append('0'); k += 1 }
          sb.append(".0")
        }
      } else {
        sb.append("0.")
        var k = -1
        while (k > exp) { sb.append('0'); k -= 1 }
        sb.append(mant)
      }
    } else {
      sb.append(mant.charAt(0)).append('.')
      if (mant.length > 1) sb.append(mant, 1, mant.length) else sb.append('0')
      sb.append('e').append(if (exp < 0) '-' else '+')
      val ae = math.abs(exp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    }
    sb.toString
  }

  /** SQLite text rendering of any value (CAST AS TEXT, `||` operands,
    * group_concat items). */
  def renderText(a: Any): String = norm(a) match {
    case null => null
    case v: java.lang.Long => v.toString
    case v: java.lang.Double => renderReal(v.doubleValue)
    case v: UTF8String => v.toString
    case v: Array[Byte] => blobText(v)
  }

  def castText(a: Any): Any = {
    val s = renderText(a)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** CAST(x AS BLOB): text/number render to their text form's UTF-8
    * bytes; blobs pass through. */
  def castBlob(a: Any): Any = norm(a) match {
    case null => null
    case v: Array[Byte] => v
    case v: UTF8String => v.getBytes.clone()
    case other =>
      renderText(other).getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  // ---------- arithmetic ----------------------------------------------------

  private def dbl(a: Any): Double = a match {
    case l: java.lang.Long => l.doubleValue
    case d: java.lang.Double => d.doubleValue
    case _ => 0.0
  }

  /** op: 0 add, 1 sub, 2 mul, 3 div, 4 mod. Dynamic result: integer math
    * while both operands are integers (overflow promotes to real, probed
    * 9223372036854775807+1 → 9.22e18), real otherwise; div/mod by zero →
    * NULL; `%` truncates BOTH operands to integer first but keeps a real
    * result class when either side was real (probed 7.5%2 → 1.0). */
  def arith(op: Int, a0: Any, b0: Any): Any = {
    val a = numCoerce(a0); val b = numCoerce(b0)
    if (a == null || b == null) return null
    (a, b) match {
      case (x: java.lang.Long, y: java.lang.Long) =>
        val l = x.longValue; val r = y.longValue
        op match {
          case 0 => try java.lang.Long.valueOf(Math.addExact(l, r))
            catch { case _: ArithmeticException =>
              java.lang.Double.valueOf(l.toDouble + r.toDouble) }
          case 1 => try java.lang.Long.valueOf(Math.subtractExact(l, r))
            catch { case _: ArithmeticException =>
              java.lang.Double.valueOf(l.toDouble - r.toDouble) }
          case 2 => try java.lang.Long.valueOf(Math.multiplyExact(l, r))
            catch { case _: ArithmeticException =>
              java.lang.Double.valueOf(l.toDouble * r.toDouble) }
          case 3 =>
            if (r == 0L) null
            else if (l == Long.MinValue && r == -1L)
              java.lang.Double.valueOf(9.223372036854776e18)
            else java.lang.Long.valueOf(l / r)
          case _ =>
            if (r == 0L) null
            else if (r == -1L) java.lang.Long.valueOf(0L)
            else java.lang.Long.valueOf(l % r)
        }
      case _ =>
        val l = dbl(a); val r = dbl(b)
        op match {
          case 0 => java.lang.Double.valueOf(l + r)
          case 1 => java.lang.Double.valueOf(l - r)
          case 2 => java.lang.Double.valueOf(l * r)
          case 3 => if (r == 0.0) null else java.lang.Double.valueOf(l / r)
          case _ =>
            val li = truncToI64(l); val ri = truncToI64(r)
            if (ri == 0L) null
            else java.lang.Double.valueOf((li % ri).toDouble)
        }
    }
  }

  /** Unary minus with numeric coercion; -(i64 min) promotes to real
    * (probed). */
  def negate(a0: Any): Any = numCoerce(a0) match {
    case null => null
    case l: java.lang.Long =>
      if (l.longValue == Long.MinValue)
        java.lang.Double.valueOf(9.223372036854776e18)
      else java.lang.Long.valueOf(-l.longValue)
    case d: java.lang.Double => java.lang.Double.valueOf(-d.doubleValue)
    case _ => null
  }

  /** Operand coercion for bitwise ops: numeric coercion then truncation
    * (probed '6x' & 3 → 2, 5.7 & 3 → 1). */
  def toI64(a: Any): java.lang.Long = numCoerce(a) match {
    case null => null
    case l: java.lang.Long => l
    case d: java.lang.Double => java.lang.Long.valueOf(truncToI64(d.doubleValue))
    case _ => java.lang.Long.valueOf(0L)
  }

  /** SQLite shifts: count ≥ 64 saturates (0, or -1 for >> of a negative);
    * a NEGATIVE count shifts the other way (probed 5>>-1 → 10). */
  def shift(left: Boolean, a: Any, b: Any): Any = {
    val x = toI64(a); val n0 = toI64(b)
    if (x == null || n0 == null) return null
    var v = x.longValue
    var n = n0.longValue
    var l = left
    if (n < 0) { l = !l; n = if (n == Long.MinValue) 64 else -n }
    if (n >= 64) java.lang.Long.valueOf(
      if (l) 0L else if (v < 0) -1L else 0L)
    else java.lang.Long.valueOf(if (l) v << n else v >> n)
  }

  // ---------- truth ----------------------------------------------------------

  /** SQLite's WHERE/boolean coercion: numeric ≠ 0; text through numeric
    * coercion (probed NOT 'abc' → 1, 1 AND '1y' → 1). */
  def truth(a: Any): Any = norm(a) match {
    case null => null
    case b: java.lang.Boolean => b
    case other => numCoerce(other) match {
      case null => null
      case l: java.lang.Long => java.lang.Boolean.valueOf(l.longValue != 0L)
      case d: java.lang.Double =>
        java.lang.Boolean.valueOf(d.doubleValue != 0.0)
      case _ => java.lang.Boolean.FALSE
    }
  }

  // ---------- comparison ------------------------------------------------------

  /** Exact integer-vs-real comparison (SQLite sqlite3IntFloatCompare:
    * no precision loss above 2^53). */
  private def cmpLongDouble(l: Long, d: Double): Int = {
    if (d.isNaN) return 1 // unreachable after norm
    if (d < -9.223372036854776e18) return 1
    if (d >= 9.223372036854776e18) return -1
    val di = d.toLong
    if (l < di) -1
    else if (l > di) 1
    else {
      val frac = d - di.toDouble
      if (frac > 0) -1 else if (frac < 0) 1 else 0
    }
  }

  private def cmpNum(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) =>
      java.lang.Long.compare(x.longValue, y.longValue)
    case (x: java.lang.Long, y: java.lang.Double) =>
      cmpLongDouble(x.longValue, y.doubleValue)
    case (x: java.lang.Double, y: java.lang.Long) =>
      -cmpLongDouble(y.longValue, x.doubleValue)
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case _ => 0
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return Integer.signum(d)
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  /** SQLite's NOCASE folds ASCII A-Z only (ADVICE r14: full Unicode
    * folding made 'Ä' = 'ä' COLLATE NOCASE compare equal where SQLite
    * says unequal). */
  private def foldAsciiLower(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0; var ascii = true
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 'A' && str.charAt(i) <= 'Z') ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val sb = new java.lang.StringBuilder(str.length)
      var j = 0
      while (j < str.length) {
        val c = str.charAt(j)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** Collation vocabulary for [[cmp]]: "BINARY" | "NOCASE" | "RTRIM". */
  def cmpText(a: UTF8String, b: UTF8String, collation: String): Int =
    collation match {
      case "NOCASE" => foldAsciiLower(a).binaryCompare(foldAsciiLower(b))
      case "RTRIM" => a.trimRight().binaryCompare(b.trimRight())
      case _ => a.binaryCompare(b)
    }

  /** Affinity codes for [[cmp]]: 0 none, 1 numeric (INTEGER/REAL/
    * NUMERIC), 2 text, 3 blob. */
  final val AffNone = 0
  final val AffNum = 1
  final val AffText = 2
  final val AffBlob = 3

  private def applyNumAffinity(v: Any): Any = v match {
    case s: UTF8String => wholeNum(s.toString).getOrElse(s)
    case other => other
  }

  private def applyTextAffinity(v: Any): Any = v match {
    case _: java.lang.Long | _: java.lang.Double =>
      UTF8String.fromString(renderText(v))
    case other => other
  }

  /** SQLite's full comparison: affinity conversion (one side numeric &
    * other non-numeric affinity → NUMERIC applied; one side text & other
    * no affinity → TEXT applied), then storage-class ordering numeric <
    * text < blob (probed: 1 < '0' → 1, i = '5.0' → 1, s = 5 → 0).
    * Returns the sign, operands non-null. */
  def cmp(a0: Any, b0: Any, laff: Int, raff: Int, collation: String): Int = {
    var a = norm(a0); var b = norm(b0)
    val lNum = laff == AffNum
    val rNum = raff == AffNum
    if (lNum && !rNum) b = applyNumAffinity(b)
    else if (rNum && !lNum) a = applyNumAffinity(a)
    else if (!lNum && !rNum) {
      if (laff == AffText && raff == AffNone) b = applyTextAffinity(b)
      else if (raff == AffText && laff == AffNone) a = applyTextAffinity(a)
    }
    val ca = storageClass(a); val cb = storageClass(b)
    if (ca != cb) Integer.compare(ca, cb)
    else ca match {
      case 0 => cmpNum(a, b)
      case 1 => cmpText(a.asInstanceOf[UTF8String],
        b.asInstanceOf[UTF8String], collation)
      case _ => cmpBytes(a.asInstanceOf[Array[Byte]],
        b.asInstanceOf[Array[Byte]])
    }
  }

  // ---------- LIKE / GLOB ------------------------------------------------------

  /** SQLite LIKE: ASCII-only case folding unless case_sensitive_like,
    * `%`/`_` wildcards, optional escape, NO default escape character
    * (backslash is literal). Operands coerce to text through rendering
    * (probed 15 LIKE '1%' → 1); a blob operand never matches (probed). */
  def like(str0: Any, pat0: Any, escape: Option[Char],
           caseSensitive: Boolean): Any = {
    val sN = norm(str0); val pN = norm(pat0)
    if (sN == null || pN == null) return null
    if (sN.isInstanceOf[Array[Byte]] || pN.isInstanceOf[Array[Byte]])
      return java.lang.Boolean.FALSE
    val s = renderText(sN); val p = renderText(pN)
    java.lang.Boolean.valueOf(likeMatch(s, 0, p, 0, escape, caseSensitive))
  }

  private def foldAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def likeMatch(s: String, si0: Int, p: String, pi0: Int,
                        esc: Option[Char], cs: Boolean): Boolean = {
    var si = si0; var pi = pi0
    while (pi < p.length) {
      val pc = p.charAt(pi)
      if (esc.contains(pc) && pi + 1 < p.length) {
        // escaped literal char
        if (si >= s.length) return false
        val lit = p.charAt(pi + 1)
        val a = if (cs) s.charAt(si) else foldAscii(s.charAt(si))
        val b = if (cs) lit else foldAscii(lit)
        if (a != b) return false
        si += 1; pi += 2
      } else if (pc == '%') {
        while (pi < p.length && p.charAt(pi) == '%') pi += 1
        if (pi >= p.length) return true
        var k = si
        while (k <= s.length) {
          if (likeMatch(s, k, p, pi, esc, cs)) return true
          k += 1
        }
        return false
      } else if (pc == '_') {
        if (si >= s.length) return false
        si += 1; pi += 1
      } else {
        if (si >= s.length) return false
        val a = if (cs) s.charAt(si) else foldAscii(s.charAt(si))
        val b = if (cs) pc else foldAscii(pc)
        if (a != b) return false
        si += 1; pi += 1
      }
    }
    si == s.length
  }

  /** SQLite GLOB: case-sensitive `*` `?` `[set]` (with `!` negation and
    * ranges), operands rendered to text (probed 12 GLOB '1*' → 1). */
  def glob(str0: Any, pat0: Any): Any = {
    val sN = norm(str0); val pN = norm(pat0)
    if (sN == null || pN == null) return null
    if (sN.isInstanceOf[Array[Byte]] || pN.isInstanceOf[Array[Byte]])
      return java.lang.Boolean.FALSE
    val s = renderText(sN); val p = renderText(pN)
    java.lang.Boolean.valueOf(globMatch(s, 0, p, 0))
  }

  private def globMatch(s: String, si0: Int, p: String, pi0: Int): Boolean = {
    var si = si0; var pi = pi0
    while (pi < p.length) {
      p.charAt(pi) match {
        case '*' =>
          while (pi < p.length && p.charAt(pi) == '*') pi += 1
          if (pi >= p.length) return true
          var k = si
          while (k <= s.length) {
            if (globMatch(s, k, p, pi)) return true
            k += 1
          }
          return false
        case '?' =>
          if (si >= s.length) return false
          si += 1; pi += 1
        case '[' =>
          if (si >= s.length) return false
          val c = s.charAt(si)
          var j = pi + 1
          var neg = false
          // negation is '^' (unix glob); '!' is a literal member (probed
          // 'adc' GLOB 'a[!b]c' → 0)
          if (j < p.length && p.charAt(j) == '^') { neg = true; j += 1 }
          var matched = false
          var first = true
          // ']' as the first set member is a literal member (glob rule)
          while (j < p.length && (first || p.charAt(j) != ']')) {
            if (j + 2 < p.length && p.charAt(j + 1) == '-' &&
              p.charAt(j + 2) != ']') {
              if (c >= p.charAt(j) && c <= p.charAt(j + 2)) matched = true
              j += 3
            } else {
              if (p.charAt(j) == c) matched = true
              j += 1
            }
            first = false
          }
          if (j >= p.length) return false // unterminated set: no match
          if (matched == neg) return false
          si += 1; pi = j + 1
        case pc =>
          if (si >= s.length || s.charAt(si) != pc) return false
          si += 1; pi += 1
      }
    }
    si == s.length
  }
}
