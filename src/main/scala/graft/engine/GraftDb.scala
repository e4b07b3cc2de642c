package graft.engine

import graft.command._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** The engine database: dust's capability contract re-expressed on Spark.
  *
  * Semantics mirrored from the reference (file:line into /root/reference):
  *  - open file/memory, close-once (`db/src/db.rs:77-117`)
  *  - FK toggle (`db/src/db.rs:120-140`)
  *  - execute batch: skip empty, per-statement error capture, continue past
  *    errors without tx, stop+rollback with tx (`db/src/db.rs:154-209`)
  *  - connection-level last_insert_rowid (`db/src/db.rs:192-197`)
  *  - query batch: row-major envelope, empty-result shape
  *    (`db/src/db.rs:223-290`)
  *  - durable ordered statement journal + snapshot — the functional analog
  *    of dust's Raft statement log (`DOC/DESIGN.md:49,54-55`): recovery =
  *    load snapshot manifest, replay journal suffix. Only deterministic SQL
  *    is journaled (`README.md:30-33`), enforced by a guard.
  *
  * Execution model: table state lives as versioned row snapshots (parquet
  * in file mode); every expression — VALUES literals, SET clauses, WHERE
  * predicates, full SELECTs — evaluates through Catalyst over temp views in
  * a private cloned SparkSession. Writes serialize behind one lock, exactly
  * like the reference's global store mutex (`http/src/service.rs:31`).
  *
  * Scale note: this envelope is the OLTP-parity surface (the reference
  * serializes every write and runs 10-200 ops/s, `README.md:27`); the
  * 100 TB analytics surface is SparkEntry/graft.ext, which never touches
  * this path. At scale the mutation strategy here generalizes to
  * partition-scoped copy-on-write rewrites; at dust's contract scale a
  * full-snapshot rewrite per commit is faithful and simpler.
  */
final class GraftDb private (parent: SparkSession, root: Option[Path]) {

  private val session = parent.newSession()
  session.conf.set("spark.sql.session.timeZone", "UTC")

  private final class TableState(
      val d: TableDef,
      val createSql: String,
      var rows: Vector[(Long, IndexedSeq[Any])],
      var nextRowId: Long) {
    def copyState = new TableState(d, createSql, rows, nextRowId)
  }

  private type Tables = mutable.LinkedHashMap[String, TableState]
  private var tables: Tables = mutable.LinkedHashMap.empty
  private var fkEnabled = false
  private var lastRowId = 0L
  private var appliedBatch = 0L
  private var closed = false
  private val lock = new Object

  // ---------- public API (the store seam, reference store/src/lib.rs:7-28) --

  def close(): Either[String, Unit] = lock.synchronized {
    if (closed) Left("db connection is already closed")
    else { closed = true; Right(()) }
  }

  def enableFkConstraints(flag: Boolean): Unit =
    lock.synchronized { fkEnabled = flag }
  def fkConstraints(): Boolean = lock.synchronized { fkEnabled }

  def execute(req: Request): Either[String, Seq[Response]] = lock.synchronized {
    if (closed) return Left("db connection is already closed")
    // Guard the RAW statement text, before parameter binding — bound Text
    // data must never trip the determinism check (a document containing
    // "now(" is legitimate data, not a function call).
    req.statements.filter(_.sql.trim.nonEmpty).foreach { s =>
      nonDeterministic(s.sql).foreach(f => return Left(
        s"non-deterministic function $f is not allowed in an execute batch " +
          "(statement-log replication requires deterministic SQL)"))
    }
    val bound = req.statements.map(s => SqlText.bind(s.sql, s.parameters))
    journalAppend(req.transaction, bound)
    val work: Tables = if (req.transaction) snapshot() else tables
    val results = Seq.newBuilder[Response]
    var rolledBack = false
    val it = bound.iterator
    while (it.hasNext && !rolledBack) {
      val sql = it.next()
      if (sql.trim.nonEmpty) {
        executeOne(work, sql) match {
          case Left(err) =>
            results += Response(error = err)
            if (req.transaction) rolledBack = true
          case Right(affected) =>
            results += Response(lastRowId, affected)
        }
      }
    }
    if (req.transaction && !rolledBack) tables = work
    if (!req.transaction || !rolledBack) persist()
    Right(results.result())
  }

  def query(req: Request): Either[String, Seq[RowsResult]] = lock.synchronized {
    if (closed) return Left("db connection is already closed")
    val out = Seq.newBuilder[RowsResult]
    req.statements.foreach { s =>
      val sql = SqlText.bind(s.sql, s.parameters)
      if (sql.trim.nonEmpty) {
        if (sql.trim.toUpperCase.startsWith("PRAGMA FOREIGN_KEYS") &&
          !sql.contains("=")) {
          // PRAGMA read: one row, SQLite reports 0/1 (db/src/db.rs:133-140)
          out += RowsResult(Seq("foreign_keys"), Seq("integer"),
            Seq(Seq(Value.Integer(if (fkEnabled) 1 else 0))))
        } else if (isRowReturning(sql)) {
          runSelect(sql) match {
            case Right(r) => out += r
            case Left(err) => return Left(err)
          }
        } else {
          // the reference's _query prepares+steps any statement — DDL/DML
          // executes and yields the empty envelope (db/src/db.rs:764-768)
          executeOne(tables, sql) match {
            case Right(_) => persist(); out += RowsResult(Nil, Nil, Nil)
            case Left(err) => return Left(err)
          }
        }
      }
    }
    Right(out.result())
  }

  def executeStringStmt(sql: String): Either[String, Seq[Response]] =
    execute(Request(transaction = false, Seq(Statement(sql))))
  def queryStringStmt(sql: String): Either[String, Seq[RowsResult]] =
    query(Request(transaction = false, Seq(Statement(sql))))

  // ---------- statement execution -----------------------------------------

  private def firstWord(sql: String): String =
    sql.trim.takeWhile(c => Character.isLetter(c)).toUpperCase

  private def isRowReturning(sql: String): Boolean =
    Set("SELECT", "VALUES", "WITH", "EXPLAIN", "SHOW").contains(firstWord(sql)) ||
      sql.trim.toUpperCase.startsWith("PRAGMA FOREIGN_KEYS") &&
        !sql.contains("=")

  // Word-boundary matches only (substring matching flagged identifiers like
  // `brand(` via `rand(`); literals are stripped first so quoted data can
  // never match.
  private val nonDetRe =
    """(?i)\b(random|randomblob|rand|uuid|now)\s*\(|\b(current_timestamp|current_date|current_time)\b""".r

  private def nonDeterministic(sql: String): Option[String] = {
    val noLiterals = sql.replaceAll("'(?:[^']|'')*'", "''")
    nonDetRe.findFirstMatchIn(noLiterals).map { m =>
      Option(m.group(1)).getOrElse(m.group(2)).toLowerCase
    }
  }

  /** Execute one mutating statement against `work`. Returns rows_affected;
    * updates connection-level lastRowId on successful INSERT. */
  private def executeOne(work: Tables, sql0: String): Either[String, Long] = {
    val sql = SqlText.fixQuotedIdents(sql0)
    val kw = firstWord(sql)
    try kw match {
      case "CREATE" => doCreate(work, sql0)
      case "DROP" => doDrop(work, sql)
      case "INSERT" => doInsert(work, sql)
      case "UPDATE" => doUpdate(work, sql)
      case "DELETE" => doDelete(work, sql)
      case "PRAGMA" => doPragma(sql)
      case "SELECT" | "VALUES" | "WITH" =>
        Left("Execute returned results - did you mean to call query?")
      case _ => Left(s"unsupported statement: ${sql.trim.take(40)}")
    } catch {
      case e: Exception => Left(friendlyError(e))
    }
  }

  private def friendlyError(e: Exception): String = {
    val m = Option(e.getMessage).getOrElse(e.toString)
    val noSuch = "TABLE_OR_VIEW_NOT_FOUND|Table or view not found".r
    if (noSuch.findFirstIn(m).isDefined) {
      val name = "`([^`]+)`".r.findFirstMatchIn(m).map(_.group(1)).getOrElse("?")
      s"no such table: $name"
    } else m.linesIterator.take(2).mkString(" ").trim
  }

  private def doPragma(sql: String): Either[String, Long] = {
    val u = sql.toUpperCase.replaceAll("\\s+", "")
    if (u.contains("FOREIGN_KEYS=ON")) { fkEnabled = true; Right(0) }
    else if (u.contains("FOREIGN_KEYS=OFF")) { fkEnabled = false; Right(0) }
    else Right(0)
  }

  private val ctasRe =
    """(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?["`]?([A-Za-z_][A-Za-z0-9_]*)["`]?\s+AS\s+((?:SELECT|WITH)\s.+?)\s*;?\s*$""".r

  private def doCreate(work: Tables, sql: String): Either[String, Long] =
    Ddl.parseCreate(sql) match {
      case Some(Ddl.Create(ine, td)) =>
        val key = td.name.toLowerCase
        if (work.contains(key)) {
          if (ine) Right(0) else Left(s"table ${td.name} already exists")
        } else {
          work(key) = new TableState(td, sql, Vector.empty, 1L)
          Right(0)
        }
      case None => sql match {
        case ctasRe(ine, name, select) => doCreateAs(work, ine != null, name, select)
        case _ => Left(s"near \"CREATE\": syntax error")
      }
    }

  /** CREATE TABLE ... AS SELECT (SQLite surface): schema inferred from the
    * result, column affinities from the Spark types. */
  private def doCreateAs(work: Tables, ine: Boolean, name: String,
                         select: String): Either[String, Long] = {
    val key = name.toLowerCase
    if (work.contains(key))
      return if (ine) Right(0) else Left(s"table $name already exists")
    registerViews(work)
    val df = session.sql(SqlText.fixQuotedIdents(select))
    val cols = df.schema.fields.map { f =>
      val aff = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType | BooleanType =>
          Affinity.Integer
        case DoubleType | FloatType | _: DecimalType => Affinity.Real
        case BinaryType => Affinity.Blob
        case _ => Affinity.Text
      }
      ColDef(f.name, aff, notNull = false, pk = false, unique = false, ref = None)
    }.toSeq
    val td = TableDef(name, cols)
    val casts = cols.zipWithIndex.map { case (c, i) =>
      s"CAST(`${df.columns(i).replace("`", "``")}` AS ${sparkTypeName(c)})"
    }
    val rows = df.selectExpr(casts: _*).collect().toVector
      .zipWithIndex.map { case (r, i) =>
        ((i + 1).toLong, (0 until r.length).map(r.get).toIndexedSeq)
      }
    val createSql = "CREATE TABLE " + name + " (" +
      cols.map(c => s"${c.name} ${c.affinity match {
        case Affinity.Integer => "INTEGER"
        case Affinity.Real | Affinity.Numeric => "REAL"
        case Affinity.Blob => "BLOB"
        case _ => "TEXT"
      }}").mkString(", ") + ")"
    work(key) = new TableState(td, createSql, rows, rows.size + 1L)
    Right(0)
  }

  private def doDrop(work: Tables, sql: String): Either[String, Long] =
    Ddl.parseDrop(sql) match {
      case Some(Ddl.Drop(ie, name)) =>
        val key = name.toLowerCase
        if (work.remove(key).isEmpty && !ie) Left(s"no such table: $name")
        else Right(0)
      case None => Left("near \"DROP\": syntax error")
    }

  private val insertRe =
    """(?is)^\s*INSERT\s+INTO\s+[`"]?([A-Za-z_][A-Za-z0-9_]*)[`"]?\s*(?:\(([^)]*)\))?\s*VALUES\s*(.+?)\s*;?\s*$""".r
  private val insertSelRe =
    """(?is)^\s*INSERT\s+INTO\s+[`"]?([A-Za-z_][A-Za-z0-9_]*)[`"]?\s*(?:\(([^)]*)\))?\s*((?:SELECT|WITH)\s.+?)\s*;?\s*$""".r

  private def doInsert(work: Tables, sql: String): Either[String, Long] =
    sql match {
      case insertRe(tname, colList, tail) =>
        insertRows(work, tname, colList, Left(tail))
      case insertSelRe(tname, colList, select) =>
        insertRows(work, tname, colList, Right(select))
      case _ => Left("near \"INSERT\": syntax error")
    }

  /** Shared INSERT pipeline: `source` is either a VALUES tail or a SELECT
    * text; both evaluate through Catalyst and cast to column affinities. */
  private def insertRows(work: Tables, tname: String, colList: String,
                         source: Either[String, String]): Either[String, Long] = {
        val ts = work.getOrElse(tname.toLowerCase,
          return Left(s"no such table: $tname"))
        val td = ts.d
        val targetCols: Seq[Int] =
          if (colList == null || colList.trim.isEmpty) td.cols.indices
          else {
            val names = colList.split(",").map(_.trim
              .stripPrefix("\"").stripSuffix("\"")
              .stripPrefix("`").stripSuffix("`"))
            val idx = names.map(td.colIndex)
            idx.zip(names).find(_._1 < 0) match {
              case Some((_, bad)) =>
                return Left(s"table $tname has no column named $bad")
              case None => idx.toSeq
            }
          }
        val raw = source match {
          case Left(tail) =>
            val tuples = SqlText.splitTopLevel(tail).map(_.trim).filter(_.nonEmpty)
            val arity = SqlText.splitTopLevel(
              tuples.head.stripPrefix("(").stripSuffix(")")).size
            if (arity != targetCols.size)
              return Left(s"table $tname has ${td.cols.size} columns but $arity values were supplied")
            val alias = (1 to arity).map(i => s"c$i").mkString(",")
            session.sql(
              s"SELECT * FROM (VALUES ${tuples.mkString(",")}) AS __v($alias)")
          case Right(select) =>
            registerViews(work)
            val df = session.sql(SqlText.fixQuotedIdents(select))
            if (df.columns.length != targetCols.size)
              return Left(s"table $tname has ${td.cols.size} columns but ${df.columns.length} values were supplied")
            df.toDF((1 to df.columns.length).map(i => s"c$i"): _*)
        }
        val casts = targetCols.zipWithIndex.map { case (ci, i) =>
          s"CAST(c${i + 1} AS ${sparkTypeName(td.cols(ci))}) AS c${i + 1}"
        }
        val df = raw.selectExpr(casts: _*)
        val incoming = df.collect().toIndexedSeq
        // Build candidate full rows + rowids.
        var nextId = ts.nextRowId
        var lastId = lastRowId
        val rowidIdx = td.rowidAlias.map(c => td.colIndex(c.name)).getOrElse(-1)
        val candidates = incoming.map { r =>
          val full = Array.fill[Any](td.cols.size)(null)
          targetCols.zipWithIndex.foreach { case (ci, i) => full(ci) = r.get(i) }
          val rid =
            if (rowidIdx >= 0 && full(rowidIdx) != null)
              full(rowidIdx).asInstanceOf[Long]
            else { val v = nextId; v }
          if (rowidIdx >= 0) full(rowidIdx) = rid
          nextId = math.max(nextId, rid + 1)
          lastId = rid
          (rid, full.toIndexedSeq)
        }
        validate(work, td, ts.rows ++ candidates, candidates.map(_._2))
          .map { _ =>
            ts.rows ++= candidates
            ts.nextRowId = nextId
            lastRowId = lastId
            candidates.size.toLong
          }
  }

  private val updateRe =
    """(?is)^\s*UPDATE\s+[`"]?([A-Za-z_][A-Za-z0-9_]*)[`"]?\s+SET\s+(.+?)\s*;?\s*$""".r

  private def doUpdate(work: Tables, sql: String): Either[String, Long] =
    sql match {
      case updateRe(tname, rest) =>
        val ts = work.getOrElse(tname.toLowerCase,
          return Left(s"no such table: $tname"))
        val td = ts.d
        val wIdx = SqlText.findKeyword(rest, "WHERE")
        val (setText, whereText) =
          if (wIdx >= 0) (rest.take(wIdx), rest.substring(wIdx + 5))
          else (rest, "")
        val sets = SqlText.splitTopLevel(setText).map { a =>
          val eq = a.indexOf('=')
          if (eq < 0) return Left("near \"SET\": syntax error")
          val c = a.take(eq).trim.stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("`").stripSuffix("`")
          if (td.colIndex(c) < 0) return Left(s"no such column: $c")
          c -> a.substring(eq + 1).trim
        }.toMap
        registerViews(work)
        val cond = if (whereText.trim.isEmpty) "true" else s"(${whereText.trim})"
        val proj = td.cols.map { c =>
          val newExpr = sets.collectFirst {
            case (sc, e) if sc.equalsIgnoreCase(c.name) => e
          }
          val e = newExpr match {
            case Some(x) => s"CASE WHEN $cond THEN CAST(($x) AS ${sparkTypeName(c)}) ELSE `${c.name}` END"
            case None => s"`${c.name}`"
          }
          s"$e AS `${c.name}`"
        }.mkString(", ")
        val df = session.sql(
          s"SELECT `__rowid`, $proj FROM ${ridView(td.name)}")
        val newRows = df.collect().toVector.map { r =>
          (r.getLong(0), (1 until r.length).map(r.get).toIndexedSeq)
        }.sortBy(_._1)
        val affected = session.sql(
          s"SELECT COUNT(*) FROM ${ridView(td.name)} WHERE $cond").head.getLong(0)
        val changed = newRows.filterNot(ts.rows.contains)
        validate(work, td, newRows, changed.map(_._2), excludeSelf = true)
          .map { _ => ts.rows = newRows; affected }
      case _ => Left("near \"UPDATE\": syntax error")
    }

  private val deleteRe =
    """(?is)^\s*DELETE\s+FROM\s+[`"]?([A-Za-z_][A-Za-z0-9_]*)[`"]?\s*(?:WHERE\s+(.+?))?\s*;?\s*$""".r

  private def doDelete(work: Tables, sql: String): Either[String, Long] =
    sql match {
      case deleteRe(tname, whereText) =>
        val ts = work.getOrElse(tname.toLowerCase,
          return Left(s"no such table: $tname"))
        registerViews(work)
        val cond =
          if (whereText == null || whereText.trim.isEmpty) "true"
          else s"(${whereText.trim})"
        val doomed = session.sql(
          s"SELECT `__rowid` FROM ${ridView(ts.d.name)} WHERE $cond")
          .collect().map(_.getLong(0)).toSet
        val remaining = ts.rows.filterNot(r => doomed.contains(r._1))
        if (fkEnabled) {
          // children of this table must not reference removed parents;
          // resolve each ref's target column the same way validate() does
          // (named column, else the rowid alias) so REFERENCES parent(code)
          // is enforced on DELETE too.
          work.values.foreach { child =>
            child.d.cols.zipWithIndex.foreach { case (c, i) =>
              c.ref.foreach { case (rt, refColOpt) =>
                if (rt.equalsIgnoreCase(ts.d.name)) {
                  val refCol =
                    if (refColOpt.nonEmpty) refColOpt
                    else ts.d.rowidAlias.map(_.name).getOrElse("")
                  val pIdx = ts.d.colIndex(refCol)
                  if (pIdx >= 0) {
                    val remainingVals =
                      remaining.map(_._2(pIdx)).filter(_ != null).toSet
                    val dangling = child.rows.exists { case (rid, vals) =>
                      vals(i) != null && !remainingVals.contains(vals(i)) &&
                        (child.d.name != ts.d.name || !doomed.contains(rid))
                    }
                    if (dangling) return Left("FOREIGN KEY constraint failed")
                  }
                }
              }
            }
          }
        }
        ts.rows = remaining
        Right(doomed.size.toLong)
      case _ => Left("near \"DELETE\": syntax error")
    }

  /** Constraint checks with SQLite's exact error strings
    * (`db/src/db.rs:373,762`): NOT NULL → UNIQUE → FOREIGN KEY. */
  private def validate(
      work: Tables, td: TableDef,
      allRows: Vector[(Long, IndexedSeq[Any])],
      newRows: Seq[IndexedSeq[Any]],
      excludeSelf: Boolean = false): Either[String, Unit] = {
    td.cols.zipWithIndex.foreach { case (c, i) =>
      if (c.notNull && !c.isRowidAlias)
        newRows.foreach { r =>
          if (r(i) == null)
            return Left(s"NOT NULL constraint failed: ${td.name}.${c.name}")
        }
    }
    td.cols.zipWithIndex.foreach { case (c, i) =>
      if (c.pk || c.unique) {
        val seen = mutable.HashSet[Any]()
        allRows.foreach { case (_, r) =>
          val v = r(i)
          if (v != null && !seen.add(v))
            return Left(s"UNIQUE constraint failed: ${td.name}.${c.name}")
        }
      }
    }
    if (fkEnabled) {
      td.cols.zipWithIndex.foreach { case (c, i) =>
        c.ref.foreach { case (refTable, refColOpt) =>
          val parent = work.get(refTable.toLowerCase)
            .getOrElse(return Left("FOREIGN KEY constraint failed"))
          val refCol =
            if (refColOpt.nonEmpty) refColOpt
            else parent.d.rowidAlias.map(_.name).getOrElse("")
          val pIdx = parent.d.colIndex(refCol)
          if (pIdx < 0) return Left("FOREIGN KEY constraint failed")
          val parentRows =
            if (parent.d.name.equalsIgnoreCase(td.name)) allRows else parent.rows
          val parentVals = parentRows.map(_._2(pIdx)).filter(_ != null).toSet
          newRows.foreach { r =>
            if (r(i) != null && !parentVals.contains(r(i)))
              return Left("FOREIGN KEY constraint failed")
          }
        }
      }
    }
    Right(())
  }

  // ---------- query execution ---------------------------------------------

  private def runSelect(sql0: String): Either[String, RowsResult] =
    try {
      registerViews(tables)
      val sql = SqlText.aliasSelectList(SqlText.fixQuotedIdents(sql0))
      val df = session.sql(sql)
      Right(envelope(df))
    } catch { case e: Exception => Left(friendlyError(e)) }

  /** Build the Rows envelope. Empty results carry empty columns/types for
    * parity with the reference's first-row type sniffing
    * (`db/src/db.rs:427-432`). */
  private def envelope(df: DataFrame): RowsResult = {
    val collected = df.collect()
    if (collected.isEmpty) RowsResult(Nil, Nil, Nil)
    else {
      val cols = df.schema.fields.map(_.name).toSeq
      val tags = df.schema.fields.map(f => Affinity.tagOf(f.dataType)).toSeq
      val values = collected.toSeq.map { r =>
        (0 until r.length).map(i => toValue(r.get(i)))
      }
      RowsResult(cols, tags, values)
    }
  }

  private def toValue(a: Any): Value = a match {
    case null => Value.Null
    case v: Long => Value.Integer(v)
    case v: Int => Value.Integer(v.toLong)
    case v: Short => Value.Integer(v.toLong)
    case v: Byte => Value.Integer(v.toLong)
    case v: Boolean => Value.Integer(if (v) 1 else 0)
    case v: Double => Value.Real(v)
    case v: Float => Value.Real(v.toDouble)
    case v: java.math.BigDecimal => Value.Real(v.doubleValue)
    case v: BigDecimal => Value.Real(v.doubleValue)
    case v: String => Value.Text(v)
    case v: Array[Byte] => Value.Blob(v)
    case v => Value.Text(v.toString)
  }

  // ---------- views & types ------------------------------------------------

  private def sparkTypeName(c: ColDef): String = c.sparkType match {
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE"
    case BinaryType => "BINARY"
    case _ => "STRING"
  }

  private def ridView(name: String): String = s"__rid_$name"

  private def registerViews(work: Tables): Unit = {
    work.values.foreach { ts =>
      val td = ts.d
      val ridSchema = StructType(
        StructField("__rowid", LongType, nullable = false) +: td.schema.fields)
      val rows = ts.rows.map { case (rid, vals) =>
        Row.fromSeq(rid +: vals)
      }.asJava
      val df = session.createDataFrame(rows, ridSchema)
      df.createOrReplaceTempView(ridView(td.name))
      df.drop("__rowid").createOrReplaceTempView(td.name)
    }
  }

  private def snapshot(): Tables = {
    val m = mutable.LinkedHashMap.empty[String, TableState]
    tables.foreach { case (k, v) => m(k) = v.copyState }
    m
  }

  // ---------- durability: journal + snapshot manifest ----------------------
  // The statement journal is the functional analog of dust's Raft log
  // (DOC/DESIGN.md:49): an ordered, durable record of committed batches.
  // The manifest is the snapshot/log-truncation point (DOC/DESIGN.md:54-55).

  private var journalSeq = 0L

  private def journalAppend(tx: Boolean, stmts: Seq[String]): Unit =
    root.foreach { r =>
      journalSeq += 1
      val line = s"""{"id":$journalSeq,"transaction":$tx,"statements":[""" +
        stmts.map(s => "\"" + Json.escape(s) + "\"").mkString(",") + "]}\n"
      Files.write(r.resolve("journal.jsonl"), line.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

  private def persist(): Unit = root.foreach { r =>
    appliedBatch = journalSeq
    val sb = new StringBuilder
    sb.append(s"""{"appliedBatch":$appliedBatch,"lastRowId":$lastRowId,"fk":$fkEnabled,"tables":[""")
    sb.append(tables.values.map { ts =>
      val rowsJson = ts.rows.map { case (rid, vals) =>
        val cells = vals.zip(ts.d.cols).map {
          case (null, _) => "null"
          case (v: Long, _) => v.toString
          case (v: Double, _) => Json.real(v)
          case (v: String, _) => "\"" + Json.escape(v) + "\""
          case (v: Array[Byte], _) =>
            "\"" + java.util.Base64.getEncoder.encodeToString(v) + "\""
          case (v, _) => "\"" + Json.escape(v.toString) + "\""
        }
        s"""[$rid,${cells.mkString("[", ",", "]")}]"""
      }.mkString("[", ",", "]")
      s"""{"createSql":"${Json.escape(ts.createSql)}","nextRowId":${ts.nextRowId},"rows":$rowsJson}"""
    }.mkString(","))
    sb.append("]}")
    val tmp = r.resolve("manifest.json.tmp")
    Files.write(tmp, sb.toString.getBytes("UTF-8"))
    Files.move(tmp, r.resolve("manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def load(): Unit = root.foreach { r =>
    val mf = r.resolve("manifest.json")
    if (Files.exists(mf)) {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = om.readTree(Files.readString(mf))
      appliedBatch = n.path("appliedBatch").asLong(0)
      journalSeq = appliedBatch
      lastRowId = n.path("lastRowId").asLong(0)
      fkEnabled = n.path("fk").asBoolean(false)
      n.path("tables").forEach { t =>
        Ddl.parseCreate(t.path("createSql").asText()).foreach { c =>
          val td = c.table
          val rows = Vector.newBuilder[(Long, IndexedSeq[Any])]
          t.path("rows").forEach { rr =>
            val rid = rr.get(0).asLong
            val vals = td.cols.zipWithIndex.map { case (cd, i) =>
              val v = rr.get(1).get(i)
              if (v == null || v.isNull) null
              else cd.sparkType match {
                case LongType => v.asLong: Any
                case DoubleType => v.asDouble: Any
                case BinaryType => java.util.Base64.getDecoder.decode(v.asText): Any
                case _ => v.asText: Any
              }
            }.toIndexedSeq
            rows += rid -> vals
          }
          tables(td.name.toLowerCase) =
            new TableState(td, t.path("createSql").asText(), rows.result(),
              t.path("nextRowId").asLong(1))
        }
      }
    }
    // crash recovery: replay journal entries after the manifest point
    val jf = r.resolve("journal.jsonl")
    if (Files.exists(jf)) {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val it = Files.readAllLines(jf).iterator()
      var torn = false
      while (it.hasNext && !torn) {
        val line = it.next()
        if (line.trim.nonEmpty) {
          // A crash mid-append leaves a torn trailing line; the manifest is
          // still intact, so stop replay there instead of failing open().
          try {
            val n = om.readTree(line)
            val id = n.path("id").asLong(0)
            if (id > appliedBatch) {
              journalSeq = math.max(journalSeq, id) - 1 // re-append below
              val stmts = Seq.newBuilder[Statement]
              n.path("statements").forEach(s => stmts += Statement(s.asText))
              val _ = executeReplay(n.path("transaction").asBoolean(false),
                stmts.result())
            }
          } catch { case _: Exception => torn = true }
        }
      }
    }
  }

  private def executeReplay(tx: Boolean, stmts: Seq[Statement]): Unit = {
    journalSeq += 1
    val work: Tables = if (tx) snapshot() else tables
    var failed = false
    stmts.foreach { s =>
      if (!failed && s.sql.trim.nonEmpty)
        executeOne(work, s.sql) match {
          case Left(_) => if (tx) failed = true
          case Right(_) =>
        }
    }
    if (tx && !failed) tables = work
    persist()
  }
}

object GraftDb {
  /** Open/create a file-backed database rooted at `path` (a directory).
    * Mirrors `DB::open` including its error string when the location is
    * unusable (`db/src/db.rs:345-347`). */
  def open(spark: SparkSession, path: String): Either[String, GraftDb] = {
    val p = Paths.get(path).toAbsolutePath
    try {
      if (p.getParent != null && !Files.exists(p.getParent))
        return Left(s"unable to open database file: $path")
      Files.createDirectories(p)
      val db = new GraftDb(spark, Some(p))
      db.load()
      Right(db)
    } catch {
      case _: Exception => Left(s"unable to open database file: $path")
    }
  }

  def openWithDsn(spark: SparkSession, path: String, dsn: String): Either[String, GraftDb] =
    if (dsn.contains("mode=memory")) Right(openInMemory(spark))
    else open(spark, path)

  /** In-memory database (the reference's default mode, DOC/DESIGN.md:52). */
  def openInMemory(spark: SparkSession): GraftDb = new GraftDb(spark, None)
}
