package graft.tools

import scala.util.Random

/** Seeded random SQL generator for differential testing against DuckDB
  * (VERDICT r10 next-round #1).
  *
  * Every generated query is a single SQL string valid — and semantically
  * identical — in BOTH Spark 4 (ANSI) and DuckDB, over the driver testdata
  * views. Ten rounds of green on the 163 declared oracle rows say nothing
  * about the query the next user writes; this generator samples the space
  * those rows come from: projections, predicates, FK joins (INNER/LEFT/
  * RIGHT/FULL, up to 3-way), aggregation, HAVING, DISTINCT, set
  * operations, window functions (rank family, frames, NTILE/NTH_VALUE),
  * CTEs, scalar/IN/EXISTS subqueries, CASE, string/date/timestamp
  * functions, ROLLUP/CUBE/GROUPING SETS, ORDER+LIMIT+OFFSET. Grammar v2
  * (r12) extends the domain past TPC-H to the LLM-pipeline tables:
  * documents (string-heavy text), events_x (raw timestamps, JSON-derived
  * props_k), emb_x (float32 embedding elements exactified to BIGINT) —
  * see [[graft.Fuzz.registerFuzzViews]] / check_fuzz.py for the pinned
  * twin view definitions.
  *
  * Cross-engine determinism is guaranteed by construction, not hope:
  *
  *  - **Integer-exact numeric domain.** Double columns only enter via
  *    `CAST(FLOOR(col * 100 + 0.5) AS BIGINT)` — the multiply/add/floor
  *    are IEEE-754 ops both engines evaluate bit-identically, and
  *    everything downstream is 64-bit integer arithmetic. No decimal
  *    casts (engines disagree on double→decimal rounding), no double
  *    aggregation (order-dependent), no ROUND (documented half-up vs
  *    binary divergence — see .claude/skills/verify).
  *  - **Bounded magnitudes.** Every expression tracks a coarse max-|value|
  *    bound; sums reduce their argument mod a prime when the bound times
  *    the row count could overflow int64 (DuckDB silently widens SUM to
  *    HUGEINT; Spark ANSI would throw).
  *  - **`||`, never `concat()`**: DuckDB's concat() ignores NULLs, `||`
  *    null-propagates in both engines.
  *  - **greatest/least only on non-nullable operands** (NULL handling
  *    differs across engines).
  *  - **Explicit NULLS FIRST/LAST on every ORDER BY key** (Spark defaults
  *    NULLS FIRST for ASC, DuckDB NULLS LAST).
  *  - **LIMIT only under a total order**: ORDER BY every output ordinal —
  *    any remaining ties are bit-identical rows, so the cut multiset is
  *    deterministic.
  *  - **Output columns are only BIGINT / STRING / DATE** — the three type
  *    classes with identical canonical renderings host-side.
  *
  * The reference delegates its whole SQL surface to SQLite and tests it
  * with fixed golden statements (`/root/reference/db/src/db.rs:328-827`);
  * this is that philosophy applied at generator scale to the Spark
  * analytics surface.
  */
object SqlFuzz {

  sealed trait Ty
  case object TInt extends Ty
  case object TStr extends Ty
  case object TDate extends Ty

  /** A rendered SQL expression with its type class, a coarse upper bound
    * on |value| for numeric overflow control, and nullability. */
  final case class Ex(sql: String, ty: Ty, mag: Double, nullable: Boolean)

  /** isCents: double column entering through the exactifying FLOOR cast.
    * isTs: raw timestamp column (date atoms CAST it to DATE; int atoms may
    * EXTRACT(HOUR/MINUTE) — both UTC-deterministic in both engines).
    * lits: equality-plausible literals; frags: LIKE fragments. */
  final case class Col(name: String, ty: Ty, isCents: Boolean = false,
                       mag: Double = 1e6, lits: Seq[String] = Nil,
                       frags: Seq[String] = Nil, isTs: Boolean = false)

  /** uniqueKey: column set totally ordering the table (for windows). */
  final case class Tab(name: String, cols: Seq[Col], uniqueKey: Seq[String],
                       rows: Double)

  private val segs = Seq("FURNITURE", "AUTOMOBILE", "MACHINERY", "BUILDING",
    "HOUSEHOLD")
  private val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
    "5-LOW")
  private val types = Seq("ECONOMY", "LARGE", "STANDARD", "PROMO", "SMALL",
    "MEDIUM")
  private val regions =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  /** Table metadata mirrors Tables.canonicalTypes (the pinned testdata
    * schema); magnitudes are sf0.1 upper bounds (keys ~1.5e5, cents ~5e7).
    * o_orderdate / l_shipdate are NTZ timestamps — date atoms go through
    * CAST(col AS DATE), identical truncation in both engines. */
  val tables: Seq[Tab] = Seq(
    Tab("region", Seq(
      Col("r_regionkey", TInt, mag = 5, lits = Seq("0", "2", "4")),
      Col("r_name", TStr, lits = regions, frags = Seq("A", "E", "ASIA", "ICA"))),
      Seq("r_regionkey"), 5),
    Tab("nation", Seq(
      Col("n_nationkey", TInt, mag = 25, lits = Seq("1", "7", "13")),
      Col("n_name", TStr, lits = Seq("NATION_0", "NATION_7", "NATION_12"),
        frags = Seq("NATION", "_1", "2")),
      Col("n_regionkey", TInt, mag = 5, lits = Seq("0", "3"))),
      Seq("n_nationkey"), 25),
    Tab("customer", Seq(
      Col("c_custkey", TInt, mag = 2e4, lits = Seq("3", "42", "117")),
      Col("c_name", TStr, lits = Seq("Customer#000000003"),
        frags = Seq("Customer#", "00001", "7")),
      Col("c_nationkey", TInt, mag = 25, lits = Seq("2", "11", "19")),
      Col("c_acctbal", TInt, isCents = true, mag = 1e6,
        lits = Seq("0", "100000", "500000", "-10000")),
      Col("c_mktsegment", TStr, lits = segs, frags = Seq("URE", "MACH", "H"))),
      Seq("c_custkey"), 2e4),
    Tab("supplier", Seq(
      Col("s_suppkey", TInt, mag = 1500, lits = Seq("1", "5", "9")),
      Col("s_name", TStr, frags = Seq("Supplier", "#", "0")),
      Col("s_nationkey", TInt, mag = 25, lits = Seq("4", "21")),
      Col("s_acctbal", TInt, isCents = true, mag = 1e6,
        lits = Seq("100000", "300000"))),
      Seq("s_suppkey"), 1500),
    Tab("part", Seq(
      Col("p_partkey", TInt, mag = 3e4, lits = Seq("7", "55", "140")),
      Col("p_name", TStr, lits = Seq("cold widget", "large bolt"),
        frags = Seq("widget", "bolt", "small", "large", "cold", "o")),
      Col("p_brand", TStr, lits = Seq("Brand#5", "Brand#13", "Brand#23"),
        frags = Seq("Brand#", "1", "2")),
      Col("p_type", TStr, lits = types, frags = Seq("ECO", "PRO", "M")),
      Col("p_size", TInt, mag = 50, lits = Seq("1", "10", "24", "49")),
      Col("p_retailprice", TInt, isCents = true, mag = 1e5,
        lits = Seq("90000", "91500"))),
      Seq("p_partkey"), 3e4),
    Tab("orders", Seq(
      Col("o_orderkey", TInt, mag = 2e5, lits = Seq("5", "800", "1200")),
      Col("o_custkey", TInt, mag = 2e4, lits = Seq("3", "77")),
      Col("o_orderstatus", TStr, lits = Seq("F", "O", "P"),
        frags = Seq("F", "O", "P")),
      Col("o_totalprice", TInt, isCents = true, mag = 6e7,
        lits = Seq("10000000", "25000000", "40000000")),
      Col("o_orderdate", TDate, mag = 0,
        lits = Seq("1996-03-15", "1998-01-01", "2000-06-30")),
      Col("o_orderpriority", TStr, lits = prios,
        frags = Seq("URGENT", "LOW", "MEDIUM", "2-"))),
      Seq("o_orderkey"), 2e5),
    Tab("lineitem", Seq(
      Col("l_orderkey", TInt, mag = 2e5, lits = Seq("5", "800")),
      Col("l_partkey", TInt, mag = 3e4, lits = Seq("7", "55")),
      Col("l_suppkey", TInt, mag = 1500, lits = Seq("1", "9")),
      Col("l_linenumber", TInt, mag = 7, lits = Seq("0", "1", "3", "6")),
      Col("l_quantity", TInt, isCents = true, mag = 5e3,
        lits = Seq("100", "2000", "4500")),
      Col("l_extendedprice", TInt, isCents = true, mag = 1.2e7,
        lits = Seq("1000000", "5000000")),
      Col("l_discount", TInt, isCents = true, mag = 10,
        lits = Seq("0", "5", "8", "10")),
      Col("l_tax", TInt, isCents = true, mag = 10, lits = Seq("0", "4")),
      Col("l_returnflag", TStr, lits = Seq("A", "N", "R"),
        frags = Seq("A", "N", "R")),
      Col("l_linestatus", TStr, lits = Seq("F", "O"), frags = Seq("F", "O")),
      Col("l_shipdate", TDate, mag = 0,
        lits = Seq("1997-06-15", "1999-09-01", "2001-01-01"))),
      Seq("l_orderkey", "l_linenumber"), 2e6),
    // ---- extension tables (grammar v2): the LLM-pipeline side of the
    // testdata — string-heavy text, raw timestamps, JSON-derived and
    // embedding-derived integer columns. events_x / emb_x are fuzz-only
    // views registered by BOTH harnesses (graft.Fuzz and check_fuzz.py)
    // with dialect-specific but semantically pinned projections: the JSON
    // k field as BIGINT, and float32 embedding elements exactified via
    // CAST(FLOOR(CAST(e AS DOUBLE) * 1e6 + 0.5) AS BIGINT) — float→double
    // is exact, the multiply/add/floor are bit-identical IEEE-754 ops.
    Tab("documents", Seq(
      Col("doc_id", TInt, mag = 5e3, lits = Seq("3", "42", "117")),
      Col("text", TStr,
        frags = Seq("agg", "join", "table", "value", "spark", "data", "row")),
      Col("lang", TStr, lits = Seq("en", "de", "es", "fr", "zh"),
        frags = Seq("e", "z")),
      Col("source", TStr, lits = Seq("src0", "src3", "src12", "src19"),
        frags = Seq("src", "1")),
      Col("n_chars", TInt, mag = 600, lits = Seq("100", "200", "400"))),
      Seq("doc_id"), 5e3),
    Tab("events_x", Seq(
      Col("event_id", TInt, mag = 1e5, lits = Seq("5", "800", "4242")),
      Col("ts", TDate, mag = 0, isTs = true,
        lits = Seq("2024-01-05", "2024-01-15", "2024-01-25")),
      Col("user_id", TInt, mag = 1500, lits = Seq("3", "77", "120")),
      Col("event_type", TStr,
        lits = Seq("click", "error", "purchase", "signup", "view"),
        frags = Seq("c", "up", "view", "r")),
      Col("value", TInt, isCents = true, mag = 6e4,
        lits = Seq("500", "10000", "25000")),
      Col("props_k", TInt, mag = 100, lits = Seq("29", "69", "89"))),
      Seq("event_id"), 1e5),
    Tab("emb_x", Seq(
      Col("vec_id", TInt, mag = 2e3, lits = Seq("1", "17", "99")),
      Col("label", TInt, mag = 9, lits = Seq("0", "3", "7")),
      Col("dim", TInt, mag = 64, lits = Seq("64")),
      Col("e1", TInt, mag = 4e5), Col("e2", TInt, mag = 4e5),
      Col("e3", TInt, mag = 4e5), Col("e4", TInt, mag = 4e5)),
      Seq("vec_id"), 2e3))

  private val byName: Map[String, Tab] = tables.map(t => t.name -> t).toMap

  /** (childTable, childCol, parentTable, parentCol) — the FK join graph. */
  val fks: Seq[(String, String, String, String)] = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    // extension side: each embedding row describes exactly one document
    ("emb_x", "vec_id", "documents", "doc_id"))

  /** One table occurrence in a FROM clause. */
  final case class Rel(alias: String, tab: Tab, nullable: Boolean)

  def gen(seed: Long): String = new Gen(new Random(seed)).top()

  // =====================================================================

  private final class Gen(r: Random) {
    private def pick[A](xs: Seq[A]): A = xs(r.nextInt(xs.size))
    private def chance(p: Double): Boolean = r.nextDouble() < p
    private def int(lo: Int, hi: Int): Int = lo + r.nextInt(hi - lo + 1)

    def top(): String = r.nextInt(10) match {
      case 0 | 1     => plainQuery()
      case 2 | 3 | 4 => aggQuery()
      case 5         => setOpQuery()
      case 6         => windowQuery()
      case 7         => cteQuery()
      case 8         => plainQuery()
      case _         => aggQuery()
    }

    // ------------------------------------------------------- FROM clause

    /** A base table plus 0–2 FK joins (INNER or LEFT). Returns the scope
      * and the rendered FROM text. Join fan-out is n:1 along every FK
      * edge, so result cardinality never exceeds the base table's. */
    private def fromClause(maxJoins: Int): (Vector[Rel], String) = {
      val base = pick(tables)
      var scope = Vector(Rel("t0", base, nullable = false))
      val sb = new StringBuilder(s"${base.name} t0")
      var n = 0
      val joins = if (maxJoins == 0) 0 else r.nextInt(maxJoins + 1)
      while (n < joins) {
        val candidates = for {
          rel <- scope
          (c, cc, p, pc) <- fks if c == rel.tab.name
        } yield (rel, cc, byName(p), pc)
        if (candidates.isEmpty) n = joins
        else {
          val (child, childCol, parent, parentCol) = pick(candidates)
          val a = s"t${scope.size}"
          // RIGHT/FULL preserve the parent side: FK integrity makes INNER
          // and LEFT agree on matches, so the outer kinds add exactly the
          // parent rows with no children — and null-stripe every column of
          // the previously-joined side (scope-wide nullability flip).
          val kind = r.nextInt(10) match {
            case 0 | 1 | 2 => "LEFT JOIN"
            case 3         => "RIGHT JOIN"
            case 4         => "FULL JOIN"
            case _         => "JOIN"
          }
          val extra =
            if (chance(0.2)) {
              // depth 1: Spark rejects subquery predicates in join ON
              val pred = boolExpr(
                Vector(Rel(a, parent, nullable = false)), 1)
              s" AND ${pred.sql}"
            } else ""
          sb.append(s" $kind ${parent.name} $a ON " +
            s"${child.alias}.$childCol = $a.$parentCol$extra")
          if (kind == "RIGHT JOIN" || kind == "FULL JOIN")
            scope = scope.map(rel => rel.copy(nullable = true))
          val parentNullable = kind match {
            case "LEFT JOIN" => true
            case "FULL JOIN" => true
            case _           => child.nullable
          }
          scope :+= Rel(a, parent, nullable = parentNullable)
          n += 1
        }
      }
      (scope, sb.toString)
    }

    // ------------------------------------------------------- expressions

    /** Integer-domain atom: an int column, an exactified cents column, or
      * a literal. */
    private def intAtom(scope: Vector[Rel]): Ex = {
      val cols = for {
        rel <- scope; c <- rel.tab.cols if c.ty == TInt
      } yield (rel, c)
      if (cols.isEmpty || chance(0.12)) {
        val v = int(-50, 500)
        Ex(v.toString, TInt, math.abs(v).max(1).toDouble, nullable = false)
      } else {
        val (rel, c) = pick(cols)
        if (c.isCents)
          Ex(s"CAST(FLOOR(${rel.alias}.${c.name} * 100 + 0.5) AS BIGINT)",
            TInt, c.mag, rel.nullable)
        else Ex(s"${rel.alias}.${c.name}", TInt, c.mag, rel.nullable)
      }
    }

    private def strAtom(scope: Vector[Rel]): Ex = {
      val cols = for {
        rel <- scope; c <- rel.tab.cols if c.ty == TStr
      } yield (rel, c)
      if (cols.isEmpty || chance(0.1))
        Ex(s"'${pick(segs ++ types ++ regions)}'", TStr, 0, nullable = false)
      else {
        val (rel, c) = pick(cols)
        Ex(s"${rel.alias}.${c.name}", TStr, 0, rel.nullable)
      }
    }

    private def dateAtom(scope: Vector[Rel]): Option[Ex] = {
      val cols = for {
        rel <- scope; c <- rel.tab.cols if c.ty == TDate
      } yield (rel, c)
      if (cols.isEmpty) None
      else {
        val (rel, c) = pick(cols)
        Some(Ex(s"CAST(${rel.alias}.${c.name} AS DATE)", TDate, 0,
          rel.nullable))
      }
    }

    private def dateLit(): String =
      // two eras: the TPC-H date range and the events.ts range (2024-01)
      if (chance(0.3)) s"DATE '2024-01-${f"${int(1, 28)}%02d"}'"
      else
        s"DATE '${int(1995, 2001)}-${f"${int(1, 12)}%02d"}-${f"${int(1, 28)}%02d"}'"

    /** Integer expression, depth-bounded, magnitude-tracked. */
    private def intExpr(scope: Vector[Rel], depth: Int): Ex = {
      if (depth >= 2 || chance(0.35)) return intAtom(scope)
      r.nextInt(10) match {
        case 0 =>
          val a = intExpr(scope, depth + 1); val b = intExpr(scope, depth + 1)
          Ex(s"(${a.sql} + ${b.sql})", TInt, a.mag + b.mag,
            a.nullable || b.nullable)
        case 1 =>
          val a = intExpr(scope, depth + 1); val b = intExpr(scope, depth + 1)
          Ex(s"(${a.sql} - ${b.sql})", TInt, a.mag + b.mag,
            a.nullable || b.nullable)
        case 2 =>
          val a = intExpr(scope, depth + 1); val k = int(2, 9)
          Ex(s"(${a.sql} * $k)", TInt, a.mag * k, a.nullable)
        case 3 =>
          val a = intExpr(scope, depth + 1); val k = pick(Seq(7, 97, 1009))
          Ex(s"(${a.sql} % $k)", TInt, k.toDouble, a.nullable)
        case 4 =>
          val a = intExpr(scope, depth + 1)
          Ex(s"abs(${a.sql})", TInt, a.mag, a.nullable)
        case 5 =>
          val b = boolExpr(scope, depth + 1)
          val x = intExpr(scope, depth + 1); val y = intExpr(scope, depth + 1)
          Ex(s"(CASE WHEN ${b.sql} THEN ${x.sql} ELSE ${y.sql} END)", TInt,
            x.mag.max(y.mag), x.nullable || y.nullable)
        case 6 =>
          // raw-timestamp columns additionally expose HOUR/MINUTE — both
          // engines evaluate them on the naive NTZ value under UTC
          val tsCols = for {
            rel <- scope; c <- rel.tab.cols if c.isTs
          } yield (rel, c)
          if (tsCols.nonEmpty && chance(0.4)) {
            val (rel, c) = pick(tsCols)
            val f = pick(Seq("HOUR", "MINUTE"))
            Ex(s"CAST(EXTRACT($f FROM ${rel.alias}.${c.name}) AS BIGINT)",
              TInt, 60, rel.nullable)
          } else dateAtom(scope) match {
            case Some(d) =>
              val f = pick(Seq("YEAR", "MONTH", "DAY"))
              Ex(s"CAST(EXTRACT($f FROM ${d.sql}) AS BIGINT)", TInt, 2030,
                d.nullable)
            case None => intAtom(scope)
          }
        case 7 =>
          val s = strExpr(scope, depth + 1)
          Ex(s"length(${s.sql})", TInt, 1000, s.nullable)
        case 8 =>
          // instr(str, substr): 1-based find, 0 when absent — same
          // contract in Spark and DuckDB
          val s = strExpr(scope, depth + 1)
          val frag = pick(Seq("a", "e", "1", "#", "ta", "ur"))
          Ex(s"instr(${s.sql}, '$frag')", TInt, 1000, s.nullable)
        case _ =>
          val a = intExpr(scope, depth + 1); val b = intExpr(scope, depth + 1)
          if (a.nullable || b.nullable) { // greatest/least: non-null only
            val lit = int(0, 100)
            Ex(s"coalesce(${a.sql}, $lit)", TInt, a.mag.max(lit),
              nullable = false)
          } else {
            val f = pick(Seq("greatest", "least"))
            Ex(s"$f(${a.sql}, ${b.sql})", TInt, a.mag.max(b.mag),
              nullable = false)
          }
      }
    }

    private def strExpr(scope: Vector[Rel], depth: Int): Ex = {
      if (depth >= 2 || chance(0.4)) return strAtom(scope)
      r.nextInt(9) match {
        case 0 =>
          val a = strExpr(scope, depth + 1); val b = strExpr(scope, depth + 1)
          Ex(s"(${a.sql} || ${b.sql})", TStr, 0, a.nullable || b.nullable)
        case 1 =>
          val a = strExpr(scope, depth + 1)
          Ex(s"${pick(Seq("upper", "lower", "trim"))}(${a.sql})", TStr, 0,
            a.nullable)
        case 2 =>
          val a = strExpr(scope, depth + 1)
          Ex(s"substr(${a.sql}, ${int(1, 4)}, ${int(1, 8)})", TStr, 0,
            a.nullable)
        case 3 =>
          val a = strExpr(scope, depth + 1)
          val from = pick(Seq("a", "e", "o", "1", "#"))
          val to = pick(Seq("X", "", "zz"))
          Ex(s"replace(${a.sql}, '$from', '$to')", TStr, 0, a.nullable)
        case 4 =>
          val b = boolExpr(scope, depth + 1)
          val x = strExpr(scope, depth + 1); val y = strExpr(scope, depth + 1)
          Ex(s"(CASE WHEN ${b.sql} THEN ${x.sql} ELSE ${y.sql} END)", TStr, 0,
            x.nullable || y.nullable)
        case 5 =>
          val a = strExpr(scope, depth + 1)
          Ex(s"${pick(Seq("left", "right"))}(${a.sql}, ${int(1, 5)})", TStr,
            0, a.nullable)
        case 6 =>
          val a = strExpr(scope, depth + 1)
          Ex(s"reverse(${a.sql})", TStr, 0, a.nullable)
        case 7 =>
          // ' ' delimiter splits the word-salad documents.text; part index
          // past the end is '' in both engines. Non-nullable input only:
          // DuckDB 1.0 split_part(NULL, ...) yields '' where Spark
          // null-propagates (triaged r12, seed 30559).
          val a0 = strExpr(scope, depth + 1)
          val a = if (a0.nullable)
            Ex(s"coalesce(${a0.sql}, '~')", TStr, 0, nullable = false)
          else a0
          Ex(s"split_part(${a.sql}, ' ', ${int(1, 4)})", TStr, 0,
            nullable = false)
        case _ =>
          val a = strExpr(scope, depth + 1)
          Ex(s"coalesce(${a.sql}, '~')", TStr, 0, nullable = false)
      }
    }

    /** Boolean predicate. depth also bounds subquery nesting. */
    private def boolExpr(scope: Vector[Rel], depth: Int): Ex = {
      def leaf(): Ex = r.nextInt(10) match {
        case 0 | 1 =>
          val a = intExpr(scope, depth + 1)
          val lit = (r.nextDouble() * a.mag * (if (chance(0.3)) -0.3 else 1))
            .toLong
          Ex(s"(${a.sql} ${pick(Seq("=", "<>", "<", "<=", ">", ">="))} $lit)",
            TInt, 0, a.nullable)
        case 2 =>
          val a = intExpr(scope, depth + 1); val b = intExpr(scope, depth + 1)
          Ex(s"(${a.sql} ${pick(Seq("<", "<=", ">", "="))} ${b.sql})", TInt,
            0, a.nullable || b.nullable)
        case 3 =>
          // column = literal from its own pool (plausible selectivity)
          val cols = for {
            rel <- scope; c <- rel.tab.cols
            if c.lits.nonEmpty && (c.ty == TStr || c.ty == TInt)
          } yield (rel, c)
          if (cols.isEmpty) return leaf()
          val (rel, c) = pick(cols)
          val lit =
            if (c.ty == TStr) s"'${pick(c.lits)}'"
            else if (c.isCents) pick(c.lits)
            else pick(c.lits)
          val lhs =
            if (c.isCents)
              s"CAST(FLOOR(${rel.alias}.${c.name} * 100 + 0.5) AS BIGINT)"
            else s"${rel.alias}.${c.name}"
          val op =
            if (c.ty == TStr) pick(Seq("=", "<>"))
            else pick(Seq("=", "<", ">", "<=", ">="))
          Ex(s"($lhs $op $lit)", TInt, 0, rel.nullable)
        case 4 =>
          val cols = for {
            rel <- scope; c <- rel.tab.cols if c.frags.nonEmpty
          } yield (rel, c)
          if (cols.isEmpty) return leaf()
          val (rel, c) = pick(cols)
          val f = pick(c.frags)
          val pat = r.nextInt(3) match {
            case 0 => s"%$f%"
            case 1 => s"$f%"
            case _ => s"%$f"
          }
          val not = if (chance(0.2)) "NOT " else ""
          Ex(s"(${rel.alias}.${c.name} $not" + s"LIKE '$pat')", TInt, 0,
            rel.nullable)
        case 5 =>
          // !isTs: DuckDB 1.0 unsoundly folds `CAST(ts AS DATE) IN (d1,d2)`
          // into a point IN on the raw timestamp (matches nothing for
          // intra-day values; Spark answers correctly — triaged r12, seeds
          // 30212/30240). The oracle can't score the shape, so don't
          // generate it; =/</BETWEEN on the cast stay covered.
          val cols = for {
            rel <- scope; c <- rel.tab.cols if c.lits.size >= 2 && !c.isTs
          } yield (rel, c)
          if (cols.isEmpty) return leaf()
          val (rel, c) = pick(cols)
          val n = int(2, math.min(4, c.lits.size))
          val picked = r.shuffle(c.lits).take(n)
          val list =
            if (c.ty == TStr) picked.map(v => s"'$v'").mkString(", ")
            else picked.mkString(", ")
          val lhs =
            if (c.isCents)
              s"CAST(FLOOR(${rel.alias}.${c.name} * 100 + 0.5) AS BIGINT)"
            else if (c.ty == TDate) s"CAST(${rel.alias}.${c.name} AS DATE)"
            else s"${rel.alias}.${c.name}"
          val listR =
            if (c.ty == TDate) picked.map(v => s"DATE '$v'").mkString(", ")
            else list
          Ex(s"($lhs IN ($listR))", TInt, 0, rel.nullable)
        case 6 =>
          dateAtom(scope) match {
            case Some(d) =>
              Ex(s"(${d.sql} ${pick(Seq("<", "<=", ">", ">="))} ${dateLit()})",
                TInt, 0, d.nullable)
            case None => leaf()
          }
        case 7 =>
          val a = intExpr(scope, depth + 1)
          val lo = (r.nextDouble() * a.mag * 0.5).toLong
          val hi = lo + (r.nextDouble() * a.mag * 0.5).toLong + 1
          Ex(s"(${a.sql} BETWEEN $lo AND $hi)", TInt, 0, a.nullable)
        case 8 =>
          val e = if (chance(0.5)) intExpr(scope, depth + 1)
          else strExpr(scope, depth + 1)
          Ex(s"(${e.sql} IS ${if (chance(0.5)) "" else "NOT "}NULL)", TInt, 0,
            nullable = false)
        case _ if depth == 0 => subqueryPred(scope)
        case _ =>
          val a = intExpr(scope, depth + 1)
          Ex(s"(${a.sql} > 0)", TInt, 0, a.nullable)
      }
      val l = leaf()
      if (depth >= 2 || chance(0.45)) l
      else {
        val rgt = boolExpr(scope, depth + 1)
        val op = pick(Seq("AND", "OR"))
        val neg = if (chance(0.12)) "NOT " else ""
        Ex(s"$neg(${l.sql} $op ${rgt.sql})", TInt, 0,
          l.nullable || rgt.nullable)
      }
    }

    /** IN / NOT IN / EXISTS / scalar-compare subquery predicates along the
      * FK graph (so they sometimes match). */
    private def subqueryPred(scope: Vector[Rel]): Ex = {
      val inEdges = for {
        rel <- scope; (c, cc, p, pc) <- fks if c == rel.tab.name
      } yield (rel, cc, byName(p), pc)
      val exEdges = for {
        rel <- scope; (c, cc, p, pc) <- fks if p == rel.tab.name
      } yield (rel, pc, byName(c), cc)
      r.nextInt(3) match {
        case 0 if inEdges.nonEmpty =>
          val (rel, cc, parent, pc) = pick(inEdges)
          val sub = Vector(Rel("s0", parent, nullable = false))
          val pred = boolExpr(sub, 1)
          val not = if (chance(0.25)) "NOT " else ""
          Ex(s"(${rel.alias}.$cc ${not}IN " +
            s"(SELECT s0.$pc FROM ${parent.name} s0 WHERE ${pred.sql}))",
            TInt, 0, rel.nullable)
        case 1 if exEdges.nonEmpty =>
          val (rel, pc, child, cc) = pick(exEdges)
          val sub = Vector(Rel("s0", child, nullable = false))
          val pred = boolExpr(sub, 1)
          val not = if (chance(0.25)) "NOT " else ""
          Ex(s"(${not}EXISTS (SELECT 1 FROM ${child.name} s0 " +
            s"WHERE s0.$cc = ${rel.alias}.$pc AND ${pred.sql}))", TInt, 0,
            nullable = false)
        case _ =>
          val t2 = pick(tables)
          val sub = Vector(Rel("s0", t2, nullable = false))
          val inner = reduced(intExpr(sub, 1))
          val agg = pick(Seq("MIN", "MAX"))
          val outer = intExpr(scope, 1)
          val pred =
            if (chance(0.5)) "" else s" WHERE ${boolExpr(sub, 1).sql}"
          Ex(s"(${outer.sql} ${pick(Seq("<", ">", "<="))} " +
            s"(SELECT $agg(${inner.sql}) FROM ${t2.name} s0$pred))", TInt, 0,
            outer.nullable)
      }
    }

    /** Reduce an integer expression mod a prime when its magnitude could
      * overflow int64 under SUM (DuckDB widens to HUGEINT, Spark throws). */
    private def reduced(e: Ex): Ex =
      if (e.mag > 1e9) Ex(s"(${e.sql} % 100003)", TInt, 100003, e.nullable)
      else e

    // --------------------------------------------------------- aggregates

    private def aggExpr(scope: Vector[Rel], depth: Int): Ex =
      r.nextInt(8) match {
        case 0 => Ex("COUNT(*)", TInt, 1e7, nullable = false)
        case 1 =>
          val e = intExpr(scope, depth)
          Ex(s"COUNT(${e.sql})", TInt, 1e7, nullable = false)
        case 2 =>
          val e = intExpr(scope, depth)
          Ex(s"COUNT(DISTINCT ${e.sql})", TInt, 1e7, nullable = false)
        case 3 | 4 =>
          val e = reduced(intExpr(scope, depth))
          Ex(s"SUM(${e.sql})", TInt, e.mag * 1e7, nullable = true)
        case 5 =>
          val e = intExpr(scope, depth)
          Ex(s"${pick(Seq("MIN", "MAX"))}(${e.sql})", TInt, e.mag,
            nullable = true)
        case 6 =>
          val s = strExpr(scope, depth)
          Ex(s"${pick(Seq("MIN", "MAX"))}(${s.sql})", TStr, 0,
            nullable = true)
        case _ =>
          val e = reduced(intExpr(scope, depth))
          val f = boolExpr(scope, 2)
          Ex(s"SUM(${e.sql}) FILTER (WHERE ${f.sql})", TInt, e.mag * 1e7,
            nullable = true)
      }

    /** Low-cardinality grouping key. */
    private def groupKey(scope: Vector[Rel]): Ex = r.nextInt(5) match {
      case 0 =>
        val e = intExpr(scope, 2)
        Ex(s"(${e.sql} % ${pick(Seq(3, 5, 11))})", TInt, 11, e.nullable)
      case 1 =>
        val s = strAtom(scope)
        Ex(s"substr(${s.sql}, 1, ${int(1, 3)})", TStr, 0, s.nullable)
      case 2 =>
        val tsCols = for {
          rel <- scope; c <- rel.tab.cols if c.isTs
        } yield (rel, c)
        if (tsCols.nonEmpty && chance(0.5)) {
          // hour-of-day bucketing — the natural events-analytics key
          val (rel, c) = pick(tsCols)
          Ex(s"CAST(EXTRACT(${pick(Seq("HOUR", "MINUTE", "DAY"))} FROM " +
            s"${rel.alias}.${c.name}) AS BIGINT)", TInt, 60, rel.nullable)
        } else dateAtom(scope) match {
          case Some(d) =>
            Ex(s"CAST(EXTRACT(YEAR FROM ${d.sql}) AS BIGINT)", TInt, 2030,
              d.nullable)
          case None => groupKey(scope)
        }
      case 3 =>
        val lowCard = for {
          rel <- scope; c <- rel.tab.cols
          if c.ty == TStr && c.lits.nonEmpty && c.lits.size <= 6
        } yield (rel, c)
        if (lowCard.isEmpty) groupKey(scope)
        else {
          val (rel, c) = pick(lowCard)
          Ex(s"${rel.alias}.${c.name}", TStr, 0, rel.nullable)
        }
      case _ =>
        val b = boolExpr(scope, 1)
        Ex(s"(CASE WHEN ${b.sql} THEN 'hi' ELSE 'lo' END)", TStr, 0,
          nullable = false)
    }

    // ------------------------------------------------------ query shapes

    /** Non-nullable-domain output expression for select lists. */
    private def outExpr(scope: Vector[Rel]): Ex = r.nextInt(6) match {
      case 0 | 1 => intExpr(scope, 0)
      case 2 | 3 => strExpr(scope, 0)
      case 4     => dateAtom(scope).getOrElse(intExpr(scope, 0))
      case _ =>
        val b = boolExpr(scope, 1)
        Ex(s"(CASE WHEN ${b.sql} THEN 1 ELSE 0 END)", TInt, 1, nullable = false)
    }

    private def orderLimit(nCols: Int): String =
      if (!chance(0.35)) ""
      else {
        val keys = (1 to nCols).map { i =>
          if (chance(0.3)) s"$i DESC NULLS LAST" else s"$i ASC NULLS FIRST"
        }
        // OFFSET stays deterministic for the same reason LIMIT does: the
        // ORDER BY covers every output ordinal, so the skipped prefix is a
        // fixed multiset in both engines
        val off = if (chance(0.25)) s" OFFSET ${int(1, 20)}" else ""
        s" ORDER BY ${keys.mkString(", ")} LIMIT ${int(1, 50)}$off"
      }

    def plainQuery(): String = {
      val (scope, from) = fromClause(3)
      val distinct = if (chance(0.2)) "DISTINCT " else ""
      val n = int(1, 4)
      val items = (0 until n).map(i => s"${outExpr(scope).sql} AS c$i")
      val where =
        if (chance(0.85)) s" WHERE ${boolExpr(scope, 0).sql}" else ""
      s"SELECT $distinct${items.mkString(", ")} FROM $from$where" +
        orderLimit(n)
    }

    def aggQuery(): String = {
      val (scope, from) = fromClause(3)
      val nK = int(1, 2)
      val nA = int(1, 3)
      val keys = (0 until nK).map(i => (groupKey(scope), s"c$i"))
      val aggs = (0 until nA).map(i => (aggExpr(scope, 1), s"c${nK + i}"))
      val items = (keys ++ aggs).map { case (e, a) => s"${e.sql} AS $a" }
      val where =
        if (chance(0.7)) s" WHERE ${boolExpr(scope, 0).sql}" else ""
      val rollup = chance(0.2)
      val groupBy =
        if (rollup) {
          val ks = keys.map(_._1.sql).mkString(", ")
          r.nextInt(3) match {
            case 0 => s" GROUP BY ROLLUP($ks)"
            case 1 => s" GROUP BY CUBE($ks)"
            case _ =>
              // explicit grouping sets: every prefix plus the grand total —
              // same lattice shape both engines agree on (the empty-input
              // () divergence is the pinned dialect class)
              val sets = (nK to 0 by -1).map(k =>
                "(" + keys.take(k).map(_._1.sql).mkString(", ") + ")")
              s" GROUP BY GROUPING SETS (${sets.mkString(", ")})"
          }
        } else s" GROUP BY ${(1 to nK).mkString(", ")}"
      val having =
        if (!rollup && chance(0.3)) {
          val a = aggExpr(scope, 1)
          if (a.ty == TInt) {
            val lit = (r.nextDouble() * a.mag.min(1e6)).toLong
            s" HAVING ${a.sql} ${pick(Seq(">", "<", ">="))} $lit"
          } else ""
        } else ""
      s"SELECT ${items.mkString(", ")} FROM $from$where$groupBy$having" +
        orderLimit(nK + nA)
    }

    def setOpQuery(): String = {
      val t = pick(tables)
      val scope = Vector(Rel("t0", t, nullable = false))
      val n = int(1, 3)
      val items = (0 until n).map(i => s"${outExpr(scope).sql} AS c$i")
      val sel = s"SELECT ${items.mkString(", ")} FROM ${t.name} t0 WHERE "
      val p1 = boolExpr(scope, 0).sql
      val p2 = boolExpr(scope, 0).sql
      val op = pick(Seq("UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
        "EXCEPT", "EXCEPT ALL"))
      s"($sel$p1) $op ($sel$p2)"
    }

    def windowQuery(): String = {
      val t = pick(tables.filter(_.rows <= 3e5)) // bounded partitions
      val scope = Vector(Rel("t0", t, nullable = false))
      val uk = t.uniqueKey.map(k => s"t0.$k").mkString(", ")
      val g = groupKey(scope)
      val e = reduced(intExpr(scope, 1))
      val winFns = Seq(
        s"ROW_NUMBER() OVER (PARTITION BY ${g.sql} ORDER BY $uk)",
        s"RANK() OVER (PARTITION BY ${g.sql} ORDER BY ${e.sql} ASC NULLS FIRST)",
        s"DENSE_RANK() OVER (PARTITION BY ${g.sql} ORDER BY ${e.sql} DESC NULLS LAST)",
        s"SUM(${e.sql}) OVER (PARTITION BY ${g.sql})",
        s"COUNT(*) OVER (PARTITION BY ${g.sql})",
        s"MIN(${e.sql}) OVER (PARTITION BY ${g.sql})",
        s"SUM(${e.sql}) OVER (PARTITION BY ${g.sql} ORDER BY $uk " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        s"LAG(${e.sql}, 1) OVER (PARTITION BY ${g.sql} ORDER BY $uk)",
        s"LEAD(${e.sql}, 1) OVER (PARTITION BY ${g.sql} ORDER BY $uk)",
        s"NTILE(${int(2, 7)}) OVER (PARTITION BY ${g.sql} ORDER BY $uk)",
        // nth/first/last: explicit full frame — the default frame ends at
        // CURRENT ROW, where engines can disagree on nth beyond the frame
        s"NTH_VALUE(${e.sql}, ${int(1, 3)}) OVER (PARTITION BY ${g.sql} " +
          s"ORDER BY $uk ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "UNBOUNDED FOLLOWING)",
        s"FIRST_VALUE(${e.sql}) OVER (PARTITION BY ${g.sql} ORDER BY $uk)",
        s"LAST_VALUE(${e.sql}) OVER (PARTITION BY ${g.sql} ORDER BY $uk " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)")
      val picked = r.shuffle(winFns).take(int(1, 3))
      val keyCols = t.uniqueKey.zipWithIndex
        .map { case (k, i) => s"t0.$k AS c$i" }
      val items = keyCols ++ picked.zipWithIndex.map { case (w, i) =>
        s"$w AS c${keyCols.size + i}"
      }
      val where =
        if (chance(0.6)) s" WHERE ${boolExpr(scope, 0).sql}" else ""
      s"SELECT ${items.mkString(", ")} FROM ${t.name} t0$where" +
        orderLimit(items.size)
    }

    def cteQuery(): String = {
      // WITH w AS (agg over base) SELECT over w [with predicates/exprs]
      val t = pick(tables)
      val scope = Vector(Rel("t0", t, nullable = false))
      val key = groupKey(scope)
      val agg1 = aggExpr(scope, 1)
      val agg2 = Ex("COUNT(*)", TInt, 1e7, nullable = false)
      val where =
        if (chance(0.6)) s" WHERE ${boolExpr(scope, 0).sql}" else ""
      val cte = s"SELECT ${key.sql} AS k, ${agg1.sql} AS a, " +
        s"${agg2.sql} AS n FROM ${t.name} t0$where GROUP BY 1"
      val wTab = Tab("w0", Seq(
        Col("k", key.ty, mag = if (key.ty == TInt) 2030 else 0),
        Col("a", agg1.ty, mag = 1e15),
        Col("n", TInt, mag = 1e7)), Seq("k"), 100)
      val ws = Vector(Rel("w0", wTab, nullable = false))
      val pred =
        if (chance(0.7)) s" WHERE ${boolExpr(ws, 1).sql}" else ""
      val items = (0 until int(1, 3))
        .map(i => s"${outExpr(ws).sql} AS c$i")
      s"WITH w0 AS ($cte) SELECT ${items.mkString(", ")} FROM w0 w0$pred"
    }
  }
}
