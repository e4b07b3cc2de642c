package graft.engine

import java.time.LocalDate

import org.apache.spark.sql.graft.SessionFunctions
import org.apache.spark.sql.{Column, SparkSession, functions => F}

/** SQLite core scalar functions for the engine's QUERY surface — the
  * date/time family and the misc scalars the Spark dialect lacks or names
  * differently. The reference hands its users the whole SQLite function
  * set through the delegated handle (`db/src/db.rs:278`); these keep the
  * most-used slice working after a switch. Registered ONLY on the
  * engine's private session (user analytics sessions are untouched), via
  * [[SessionFunctions]] because the functions are variadic.
  *
  * Semantics probed live on SQLite 3.40 (SqliteFunctionsSpec):
  *  - time values: `YYYY-MM-DD[ HH:MM[:SS[.SSS]]]`, `HH:MM[:SS[.SSS]]`
  *    (date defaults to 2000-01-01), julian day numbers, and epoch
  *    seconds behind the `unixepoch` modifier;
  *  - SQLite validates FORMAT, not calendar validity: `date('2024-02-30')`
  *    echoes verbatim, while any day-granular arithmetic normalizes it
  *    (`+0 days` → 2024-03-01). Month/year arithmetic adds FIELDS and
  *    keeps the day (2024-01-31 +1 month → 2024-02-31 → renders
  *    2024-03-02 only after a day-granular pass);
  *  - an unknown `%` code makes strftime return NULL;
  *  - `'now'` / `'localtime'` / `'utc'` are REJECTED loudly: wall-clock
  *    and host-zone reads would break statement-log replay determinism
  *    (same rule as the execute-path guard for random()/now()).
  *
  * The date/time family evaluates as per-arity Scala UDFs — this is the
  * OLTP query surface (statement-sized rows), where exact SQLite
  * semantics beat whole-stage codegen; the analytics path never sees
  * these functions. The misc scalars compose public column expressions. */
object SqliteFunctions {

  /** Every function name resolvable on the OLTP SQL surface — the SQLite
    * 3.40.1 oracle's builtin set that this engine implements (most of the
    * list) or deliberately delegates to a parity-verified Spark builtin
    * (coalesce/ifnull/nullif/printf — battery-pinned). A name outside
    * this set answers SQLite's `no such function:` error instead of
    * silently leaking a Spark builtin's behavior (VERDICT r14 #6:
    * `concat('a',1,NULL)` resolved to Spark's NULL-propagating concat
    * where the 3.40 oracle says `no such function: concat`; same for
    * unhex/octet_length and the rest of Spark's registry). The json1
    * scalar family and both json aggregates are implemented
    * ([[SqliteJson]]); json_each/json_tree (table-valued) are not —
    * those two names error as `no such function`, a documented gap. */
  val known: Set[String] = Set(
    // date/time family
    "date", "time", "datetime", "julianday", "unixepoch", "strftime",
    // misc scalars + operators' function forms
    "iif", "unicode", "char", "typeof", "glob", "like",
    "format", "printf", "coalesce", "ifnull", "nullif",
    "likely", "unlikely", "likelihood", "sqlite_version",
    "random", "randomblob",
    "last_insert_rowid", "changes", "total_changes",
    // aggregates (min/max are the arity-overloaded scalar/agg pair)
    "count", "sum", "avg", "total", "min", "max", "group_concat",
    // window functions
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
    "ntile", "lag", "lead", "first_value", "last_value", "nth_value",
    // json aggregates (the scalar family joins via SqliteJson.arities)
    "json_group_array", "json_group_object",
    // Spark's parser desugars BETWEEN into this marker
    "between") ++ SqliteScalar.arities.keySet ++ SqliteJson.arities.keySet

  /** Deliberate rejection (determinism), distinct from a parse miss. */
  final class NonDeterministicTime(what: String) extends RuntimeException(
    s"non-deterministic time value '$what' is not allowed " +
      "(statement-log replication requires deterministic SQL)")

  // y/m normalized by month-carry; d may be calendar-invalid on purpose
  private final case class T(y: Int, m: Int, d: Int, ms: Long)

  private val dateRe = """^(\d{4})-(\d{2})-(\d{2})$""".r
  private val dateTimeRe =
    """^(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?$""".r
  private val timeRe = """^(\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?$""".r
  private val numRe = """^[+-]?\d+(?:\.\d+)?$""".r

  private def msOf(h: String, mi: String, se: String, fr: String): Option[Long] = {
    val hh = h.toInt; val mm = mi.toInt
    val ss = if (se == null) 0 else se.toInt
    if (hh > 23 || mm > 59 || ss > 59) return None
    val frac = if (fr == null) 0L
    else math.round(("0." + fr).toDouble * 1000)
    Some(hh * 3600000L + mm * 60000L + ss * 1000L + frac)
  }

  private def checkYmd(y: Int, m: Int, d: Int): Boolean =
    m >= 1 && m <= 12 && d >= 1 && d <= 31

  private def parse(v: String): Option[T] = v.trim match {
    case dateRe(y, m, d) =>
      Some(T(y.toInt, m.toInt, d.toInt, 0L)).filter(t => checkYmd(t.y, t.m, t.d))
    case dateTimeRe(y, m, d, h, mi, se, fr) =>
      for (ms <- msOf(h, mi, se, fr)
           if checkYmd(y.toInt, m.toInt, d.toInt))
        yield T(y.toInt, m.toInt, d.toInt, ms)
    case timeRe(h, mi, se, fr) =>
      msOf(h, mi, se, fr).map(T(2000, 1, 1, _))
    case n if numRe.pattern.matcher(n).matches() =>
      Some(fromEpochMs(math.round((n.toDouble - 2440587.5) * 86400000.0)))
    // SQLite parses time strings case-insensitively: date('NOW') is
    // 'now' — reject it the same way (determinism guard).
    case s if s.equalsIgnoreCase("now") => throw new NonDeterministicTime("now")
    case _ => None
  }

  /** Normalizing conversion: field overflow (2024-02-30) resolves exactly
    * like LocalDate day-arithmetic, which matches SQLite's julian pass. */
  private def epochMs(t: T): Long =
    LocalDate.of(t.y, t.m, 1).plusDays(t.d - 1L).toEpochDay * 86400000L + t.ms

  private def fromEpochMs(ms: Long): T = {
    val day = math.floorDiv(ms, 86400000L)
    val ld = LocalDate.ofEpochDay(day)
    T(ld.getYear, ld.getMonthValue, ld.getDayOfMonth,
      math.floorMod(ms, 86400000L))
  }

  private val modRe =
    """^([+-]?)(\d+(?:\.\d+)?)\s+(day|days|hour|hours|minute|minutes|second|seconds|month|months|year|years)$""".r

  private def applyMod(t: T, mod0: String): Option[T] = {
    val mod = mod0.trim.toLowerCase
    mod match {
      case "now" | "localtime" | "utc" => throw new NonDeterministicTime(mod)
      case "start of day" => Some(t.copy(ms = 0L))
      case "start of month" => Some(t.copy(d = 1, ms = 0L))
      case "start of year" => Some(t.copy(m = 1, d = 1, ms = 0L))
      case m0 if m0.startsWith("weekday ") =>
        m0.stripPrefix("weekday ").trim.toIntOption.filter(n =>
          n >= 0 && n <= 6).map { n =>
          val base = fromEpochMs(epochMs(t))
          val dow = math.floorMod(
            LocalDate.of(base.y, base.m, base.d).toEpochDay + 4, 7) // 0=Sun
          val add = math.floorMod(n - dow, 7)
          fromEpochMs(epochMs(base) + add * 86400000L)
        }
      case modRe(sign, num, unit) =>
        val v = num.toDouble * (if (sign == "-") -1 else 1)
        unit.stripSuffix("s") match {
          case "day" => Some(fromEpochMs(epochMs(t) +
            math.round(v * 86400000.0)))
          case "hour" => Some(fromEpochMs(epochMs(t) +
            math.round(v * 3600000.0)))
          case "minute" => Some(fromEpochMs(epochMs(t) +
            math.round(v * 60000.0)))
          case "second" => Some(fromEpochMs(epochMs(t) +
            math.round(v * 1000.0)))
          case "month" =>
            val total = t.y * 12L + (t.m - 1) + v.toLong
            Some(t.copy(y = math.floorDiv(total, 12L).toInt,
              m = math.floorMod(total, 12L).toInt + 1))
          case "year" => Some(t.copy(y = t.y + v.toInt))
        }
      case _ => None
    }
  }

  /** (value, modifiers…) → the field state; `unixepoch` is honored as the
    * first modifier on a numeric value (SQLite's rule). */
  private def resolve(args: Seq[String]): Option[T] = {
    if (args.isEmpty || args.exists(_ == null)) return None
    val v = args.head
    var mods = args.tail
    var t: Option[T] =
      if (mods.headOption.exists(_.trim.equalsIgnoreCase("unixepoch")) &&
        numRe.pattern.matcher(v.trim).matches()) {
        mods = mods.tail
        Some(fromEpochMs(math.round(v.trim.toDouble * 1000.0)))
      } else parse(v)
    // each modifier applies on the CURRENT raw fields, then the result
    // normalizes (probed: '+1 month','+1 month' on 01-31 → 04-02, while
    // 'start of month' on the raw 02-30 gives 02-01, not 03-01)
    mods.foreach { m =>
      t = t.flatMap(applyMod(_, m)).map(x => fromEpochMs(epochMs(x)))
    }
    t
  }

  private def renderDate(t: T): String = f"${t.y}%04d-${t.m}%02d-${t.d}%02d"
  private def renderTime(t: T): String = {
    val s = t.ms / 1000
    f"${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d"
  }

  private def strf(fmt: String, t: T): String = {
    // field codes (%Y %m %d %H %M %S %f) read the RAW fields — probed:
    // strftime('%d','2024-02-30') = '30'; calendar codes (%j %w %W %s %J)
    // need the julian pass
    val n = t
    lazy val ld = {
      val x = fromEpochMs(epochMs(t)); LocalDate.of(x.y, x.m, x.d)
    }
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%' || i + 1 >= fmt.length) { sb.append(c); i += 1 }
      else {
        fmt.charAt(i + 1) match {
          case '%' => sb.append('%')
          case 'Y' => sb.append(f"${n.y}%04d")
          case 'm' => sb.append(f"${n.m}%02d")
          case 'd' => sb.append(f"${n.d}%02d")
          case 'H' => sb.append(f"${n.ms / 3600000}%02d")
          case 'M' => sb.append(f"${n.ms / 60000 % 60}%02d")
          case 'S' => sb.append(f"${n.ms / 1000 % 60}%02d")
          case 'f' => sb.append(f"${n.ms / 1000 % 60}%02d." +
            f"${n.ms % 1000}%03d")
          case 'j' => sb.append(f"${ld.getDayOfYear}%03d")
          case 'w' => sb.append(math.floorMod(ld.toEpochDay + 4, 7).toString)
          case 'W' =>
            val wday = math.floorMod(ld.toEpochDay + 4, 7) // 0=Sun
            val yday = ld.getDayOfYear - 1
            sb.append(f"${(yday + 7 - (if (wday == 0) 6 else wday - 1)) / 7}%02d")
          case 's' => sb.append((epochMs(t) / 1000).toString)
          case 'J' =>
            val jd = BigDecimal(epochMs(t)) / 86400000 + BigDecimal("2440587.5")
            sb.append(jd.underlying.stripTrailingZeros.toPlainString)
          case _ => return null // SQLite: unknown code nulls the result
        }
        i += 2
      }
    }
    sb.toString
  }

  def register(session: SparkSession, csLike: () => Boolean = () => false)
      : Unit = {
    def varargs[R: scala.reflect.runtime.universe.TypeTag](
        name: String, maxMods: Int)(f: Seq[String] => R): Unit = {
      def at(k: Int) = k match {
        case 1 => F.udf((a: String) => f(Seq(a)))
        case 2 => F.udf((a: String, b: String) => f(Seq(a, b)))
        case 3 => F.udf((a: String, b: String, c: String) => f(Seq(a, b, c)))
        case 4 => F.udf((a: String, b: String, c: String, d: String) =>
          f(Seq(a, b, c, d)))
        case 5 => F.udf((a: String, b: String, c: String, d: String,
                         e: String) => f(Seq(a, b, c, d, e)))
        case _ => F.udf((a: String, b: String, c: String, d: String,
                         e: String, g: String) => f(Seq(a, b, c, d, e, g)))
      }
      SessionFunctions.registerStrVarargs(session, name,
        (1 to maxMods).map(k => k -> at(k)).toMap)
    }
    varargs("date", 5)(a => resolve(a).map(renderDate).orNull)
    varargs("time", 5)(a => resolve(a).map(renderTime).orNull)
    varargs("datetime", 5)(a =>
      resolve(a).map(t => renderDate(t) + " " + renderTime(t)).orNull)
    varargs("julianday", 5)(a =>
      resolve(a).map(t => epochMs(t) / 86400000.0 + 2440587.5))
    varargs("unixepoch", 5)(a =>
      resolve(a).map(t => math.floorDiv(epochMs(t), 1000L)))
    varargs("strftime", 6) {
      case fmt +: rest if fmt != null && rest.nonEmpty =>
        resolve(rest).map(strf(fmt, _)).orNull
      case _ => null: String
    }
    // misc scalars — iif's condition takes SQLite truth coercion
    // (probed IIF(2.5,'a','b') → 'a')
    SessionFunctions.registerExpr(session, "iif", { es =>
      require(es.size == 3, "wrong number of arguments to function iif()")
      org.apache.spark.sql.catalyst.expressions.If(
        SqliteTruth(es(0)), es(1), es(2))
    })
    SessionFunctions.register(session, "unicode", { cols =>
      require(cols.size == 1, "wrong number of arguments to function unicode()")
      F.when(F.length(cols.head) === 0, F.lit(null))
        .otherwise(F.ascii(cols.head))
    })
    SessionFunctions.register(session, "char", { cols =>
      if (cols.isEmpty) F.lit("")
      else F.concat(cols.map(c => F.chr(c.cast("long"))): _*)
    })
    // SQLite's min/max are arity-overloaded: one argument is the
    // aggregate, two-plus is the SCALAR least/greatest (NULL if any arg
    // is NULL — unlike Spark's null-skipping least/greatest, probed).
    // These shadow builtins, so the builders emit CONCRETE catalyst nodes
    // (a by-name Column op would resolve back here and never terminate);
    // the arity-1 branch IS the builtin aggregate, so the engine's many
    // internal min()/max() calls and window uses keep exact semantics.
    import org.apache.spark.sql.catalyst.expressions.{Greatest, If, IsNull, Least, Literal, Or}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min, Sum}
    import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Expression}
    import org.apache.spark.sql.types.DoubleType
    def minmax(name: String, agg: Expression => Expression,
               pick: Seq[Expression] => Expression): Unit =
      SessionFunctions.registerExpr(session, name, { es =>
        require(es.nonEmpty, s"wrong number of arguments to function $name()")
        if (es.size == 1) agg(es.head)
        else if (es.forall(_.isInstanceOf[Literal])) {
          // all-literal scalar form: SQLite storage-class ordering
          // (probed min(3,'2') → 3: numeric sorts before text) with full
          // dynamic typing, like SqliteRewrite's literal folding
          val vals = es.map(e => SqliteValue.norm(
            e.asInstanceOf[Literal].value))
          if (vals.contains(null)) Literal.create(null)
          else {
            val wantMin = name == "min"
            SqliteRewrite.dynLit(vals.reduceLeft { (a, b) =>
              val c = SqliteValue.cmp(a, b, SqliteValue.AffNone,
                SqliteValue.AffNone, "BINARY")
              if ((c <= 0) == wantMin) a else b
            })
          }
        }
        else If(es.map(IsNull).reduce(Or), Literal.create(null), pick(es))
      })
    minmax("min", e => Min(e).toAggregateExpression(), Least(_))
    minmax("max", e => Max(e).toAggregateExpression(), Greatest(_))
    // total(): SQLite's sum variant — 0.0 on empty/all-NULL input, REAL
    SessionFunctions.registerExpr(session, "total", { es =>
      require(es.size == 1, "wrong number of arguments to function total()")
      Coalesce(Seq(Sum(Cast(es.head, DoubleType)).toAggregateExpression(),
        Literal(0.0)))
    })
    // typeof() speaks SQLite's storage-class vocabulary (Spark's builtin
    // would answer `bigint`/`string`); glob()/like() are the function
    // forms of the operators — SQLite argument order is (pattern, string
    // [, escape]), probed. The builders shadow Spark builtins on the
    // PRIVATE session only.
    SessionFunctions.registerExpr(session, "typeof", { es =>
      require(es.size == 1, "wrong number of arguments to function typeof()")
      SqliteTypeof(es.head)
    })
    SessionFunctions.registerExpr(session, "glob", { es =>
      require(es.size == 2, "wrong number of arguments to function glob()")
      SqliteGlob(es(1), es.head)
    })
    SessionFunctions.registerExpr(session, "like", { es =>
      require(es.size == 2 || es.size == 3,
        "wrong number of arguments to function like()")
      val esc = if (es.size == 3) es(2) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _)
            if s.numChars == 1 => Some(s.toString.charAt(0))
        case _ => throw new IllegalArgumentException(
          "ESCAPE expression must be a single character")
      } else None
      SqliteLike(es(1), es.head, esc, csLike())
    })
    // core scalar family with SQLite value semantics (ASCII-only case
    // folding, text numeric coercion, SQLite substr index rules, the
    // SQLITE_ENABLE_MATH_FUNCTIONS family, …) — see SqliteScalar for the
    // per-function contracts
    SqliteScalar.arities.keys.foreach { name =>
      SessionFunctions.registerExpr(session, name,
        es => SqliteScalar.build(name, es))
    }
    // the json1 scalar family (SqliteJson, semantics probed on 3.40.1)
    SqliteJson.arities.keys.foreach { name =>
      SessionFunctions.registerExpr(session, name,
        es => SqliteJson.build(name, es))
    }
    // json aggregates: per-element json_quote rendering over the arrival
    // order, composed from collect_list — a struct wrapper keeps NULL
    // elements (CollectList drops bare NULLs; json_group_array('[1,
    // null]') keeps them, probed). Empty group → '[]' / '{}' for free
    // (ArrayJoin of the empty array is ''). SQLite's NULL-label output
    // for json_group_object is its own invalid-JSON quirk (`:4`) — here
    // a NULL label renders as the json text `null`, documented.
    locally {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
      import org.apache.spark.sql.catalyst.expressions.{ArrayJoin, ArrayTransform, Concat, CreateNamedStruct, LambdaFunction, Literal, UnresolvedNamedLambdaVariable}
      import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
      def quoted(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        SqliteJson("json_quote", Seq(e))
      SessionFunctions.registerExpr(session, "json_group_array", { es =>
        require(es.size == 1,
          "wrong number of arguments to function json_group_array()")
        val x = UnresolvedNamedLambdaVariable(Seq("__jga"))
        val arr = CollectList(
          CreateNamedStruct(Seq(Literal("a"), es.head)))
          .toAggregateExpression()
        Concat(Seq(Literal("["),
          ArrayJoin(ArrayTransform(arr,
            LambdaFunction(
              quoted(UnresolvedExtractValue(x, Literal("a"))), Seq(x))),
            Literal(","), None),
          Literal("]")))
      })
      SessionFunctions.registerExpr(session, "json_group_object", { es =>
        require(es.size == 2,
          "wrong number of arguments to function json_group_object()")
        val x = UnresolvedNamedLambdaVariable(Seq("__jgo"))
        val arr = CollectList(CreateNamedStruct(Seq(
          Literal("k"), es.head, Literal("v"), es(1))))
          .toAggregateExpression()
        Concat(Seq(Literal("{"),
          ArrayJoin(ArrayTransform(arr,
            LambdaFunction(Concat(Seq(
              quoted(UnresolvedExtractValue(x, Literal("k"))),
              Literal(":"),
              quoted(UnresolvedExtractValue(x, Literal("v"))))), Seq(x))),
            Literal(","), None),
          Literal("}")))
      })
    }
    // format() is SQLite ≥3.38's preferred name for printf() (probed on
    // the 3.40.1 oracle); both resolve to the C-style formatter
    SessionFunctions.registerExpr(session, "format", { es =>
      require(es.nonEmpty, "wrong number of arguments to function format()")
      org.apache.spark.sql.catalyst.expressions.FormatString(es: _*)
    })
    // planner hints: SQLite evaluates these to their first argument
    // unchanged (probed likelihood(7,0.5) → 7)
    SessionFunctions.registerExpr(session, "likely", { es =>
      require(es.size == 1, "wrong number of arguments to function likely()")
      es.head
    })
    SessionFunctions.registerExpr(session, "unlikely", { es =>
      require(es.size == 1,
        "wrong number of arguments to function unlikely()")
      es.head
    })
    SessionFunctions.registerExpr(session, "likelihood", { es =>
      require(es.size == 2,
        "wrong number of arguments to function likelihood()")
      val ok = es(1) match {
        case Literal(d: Double, DoubleType) => d >= 0.0 && d <= 1.0
        case Literal(dec: org.apache.spark.sql.types.Decimal, _) =>
          dec.toDouble >= 0.0 && dec.toDouble <= 1.0
        case _ => false
      }
      require(ok, "second argument to likelihood() must be a " +
        "constant between 0.0 and 1.0")
      es.head
    })
    // the version this engine's SQLite-parity surface is probed against
    // (the differential oracle is SQLite 3.40.1)
    SessionFunctions.registerExpr(session, "sqlite_version", { es =>
      require(es.isEmpty,
        "wrong number of arguments to function sqlite_version()")
      Literal("3.40.1")
    })
    // random()/randomblob() answer SQLite's value domains (full-range i64;
    // N-byte blob, N<1 → 1 byte — probed). The QUERY path only: execute
    // batches keep rejecting them loudly (statement-log determinism).
    SessionFunctions.register(session, "random", { cols =>
      require(cols.isEmpty, "wrong number of arguments to function random()")
      F.udf(() => java.util.concurrent.ThreadLocalRandom.current().nextLong())
        .asNondeterministic()()
    })
    SessionFunctions.register(session, "randomblob", { cols =>
      require(cols.size == 1,
        "wrong number of arguments to function randomblob()")
      F.udf((n: java.lang.Long) => {
        val len = math.max(1L, if (n == null) 1L else n.longValue).toInt
        val b = new Array[Byte](len)
        java.util.concurrent.ThreadLocalRandom.current().nextBytes(b)
        b
      }).asNondeterministic()(cols.head.cast("long"))
    })
  }

  /** Connection-state functions on the SELECT surface (VERDICT r14 #1:
    * `last_insert_rowid()`, `changes()`, `total_changes()` are what ORMs
    * poll; the execute envelope already carries the same registers). The
    * builder runs at analysis time, so each statement observes the value
    * as of its own prepare — SQLite's behavior for a fresh statement. */
  def registerConnState(session: SparkSession, lastRowId: () => Long,
                        changes: () => Long, totalChanges: () => Long)
      : Unit = {
    def zeroArg(name: String, v: () => Long): Unit =
      SessionFunctions.registerExpr(session, name, { es =>
        require(es.isEmpty, s"wrong number of arguments to function $name()")
        org.apache.spark.sql.catalyst.expressions.Literal(v())
      })
    zeroArg("last_insert_rowid", lastRowId)
    zeroArg("changes", changes)
    zeroArg("total_changes", totalChanges)
  }
}
