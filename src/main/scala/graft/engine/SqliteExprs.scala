package graft.engine

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.CollationFactory
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import SqliteValue.SqliteEvalError

/** Catalyst expressions carrying SQLite's expression semantics on the
  * engine's OLTP path (the reference delegates this layer to SQLite
  * itself, `db/src/db.rs:278`). All are CodegenFallback: they evaluate
  * statement-sized row counts on the engine's private session — the
  * analytics path never sees them. Runtime semantics live in
  * [[SqliteValue]]; [[SqliteRewrite]] substitutes these into parsed
  * plans before analysis.
  *
  * Static-vs-dynamic typing: SQLite types VALUES, Spark types COLUMNS.
  * Each expression declares the Spark type SQLite would produce for its
  * children's STATIC types; the residue (a text column whose cell would
  * stay integer under SQLite, e.g. '2'+1 per-row) is documented in
  * SURVEY §3 and covered by rewrite-time literal folding for the
  * all-literal shapes live probes use.
  */
object SqliteExprs {

  private[engine] def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => true
    case _ => false
  }

  private[engine] def isNumericDt(dt: DataType): Boolean =
    isIntegral(dt) || dt == DoubleType || dt == FloatType ||
      dt.isInstanceOf[DecimalType]

  /** Coerce a dynamic SQLite value onto the expression's declared Spark
    * type. A long-declared slot receiving a real (integer overflow that
    * SQLite would promote) fails loudly with SQLite's own error text
    * rather than wrap silently.
    *
    * Pinned divergence (ADVICE r14): SQLite promotes overflowing i64
    * column arithmetic to REAL and succeeds (`big + 1` → 9.22…e18);
    * this engine's static typing declares LongType for integer-column
    * arithmetic, so the runtime overflow has no REAL slot to land in —
    * it errors with `integer overflow` instead. Literal arithmetic is
    * unaffected (rewrite-time folding is fully dynamic and DOES promote,
    * matching SQLite). The loud error beats a silent wrap; the fuzz
    * grammar's value pools stay well inside i64 so campaigns never trip
    * it accidentally. */
  private[engine] def fit(dt: DataType, v: Any): Any = v match {
    case null => null
    case l: java.lang.Long if dt == LongType => l
    case l: java.lang.Long if dt == DoubleType =>
      java.lang.Double.valueOf(l.doubleValue)
    case d: java.lang.Double if dt == DoubleType => d
    case _: java.lang.Double if dt == LongType =>
      throw new SqliteEvalError("integer overflow")
    case s: UTF8String if dt.isInstanceOf[StringType] => s
    case b: Array[Byte] if dt == BinaryType => b
    case b: java.lang.Boolean if dt == BooleanType => b
    case other => other
  }

  /** SQLite affinity of an operand for comparison purposes: columns carry
    * their declared affinity, CASTs carry the target's, everything else
    * (literals, computed expressions) has none — SQLite's rule, probed:
    * `(1+1) = '2'` → 0 but `CAST(1 AS INTEGER) = '1'` → 1. */
  private def affOfType(dt: DataType): Int = dt match {
    case t if isNumericDt(t) => SqliteValue.AffNum
    case _: StringType => SqliteValue.AffText
    case BinaryType => SqliteValue.AffBlob
    case _ => SqliteValue.AffNone
  }

  private[engine] def affOf(e: Expression): Int = e match {
    // column references: declared affinity. Physical planning binds the
    // refs inside CodegenFallback expressions, so BOTH shapes appear
    case _: Attribute => affOfType(e.dataType)
    case _: BoundReference => affOfType(e.dataType)
    case _: SqliteCastInt | _: SqliteCastReal | _: SqliteCastNumeric =>
      SqliteValue.AffNum
    case _: SqliteCastText => SqliteValue.AffText
    case _: SqliteCastBlob => SqliteValue.AffBlob
    case m: SqliteAffLit => m.aff
    case a: Alias => affOf(a.child)
    case _ => SqliteValue.AffNone
  }

  /** Text-comparison collation from the operands' Spark string types
    * (the engine maps COLLATE NOCASE/RTRIM onto collated StringTypes);
    * SQLite prefers the left operand's collation. */
  private[engine] def collationOf(l: Expression, r: Expression): String = {
    def of(dt: DataType): Option[String] = dt match {
      case st: StringType =>
        val n = CollationFactory.fetchCollation(st.collationId).collationName
        if (n.contains("LCASE")) Some("NOCASE")
        else if (n.contains("RTRIM")) Some("RTRIM")
        else None
      case _ => None
    }
    of(l.dataType).orElse(of(r.dataType)).getOrElse("BINARY")
  }
}

import SqliteExprs._

/** `+ - * / %` with SQLite semantics (op codes as [[SqliteValue.arith]]).
  * Declared type: integer while all children are statically integral,
  * real otherwise (text children coerce per-value; declared real). */
case class SqliteArith(op: Int, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (isIntegral(left.dataType) && isIntegral(right.dataType)) LongType
    else DoubleType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    fit(dataType, SqliteValue.arith(op, left.eval(input), right.eval(input)))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteArith =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sqlite_arith"
}

/** Unary minus with numeric coercion (probed -'5.5' → -5.5). */
case class SqliteNegate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (isIntegral(child.dataType)) LongType else DoubleType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    fit(dataType, SqliteValue.negate(child.eval(input)))
  override protected def withNewChildInternal(c: Expression): SqliteNegate =
    copy(child = c)
  override def prettyName: String = "sqlite_negate"
}

case class SqliteCastInt(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.castInt(child.eval(input))
  override protected def withNewChildInternal(c: Expression): SqliteCastInt =
    copy(child = c)
  override def prettyName: String = "sqlite_cast_int"
}

case class SqliteCastReal(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.castReal(child.eval(input))
  override protected def withNewChildInternal(c: Expression): SqliteCastReal =
    copy(child = c)
  override def prettyName: String = "sqlite_cast_real"
}

/** CAST AS NUMERIC: declared from the child's static type (integer stays
  * integer, real stays real — probed CAST(12.0 AS NUMERIC) → 12.0); text
  * children declare real (the lossless-integer refinement folds for
  * literals). */
case class SqliteCastNumeric(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (isIntegral(child.dataType)) LongType else DoubleType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    fit(dataType, SqliteValue.castNumeric(child.eval(input)))
  override protected def withNewChildInternal(c: Expression): SqliteCastNumeric =
    copy(child = c)
  override def prettyName: String = "sqlite_cast_numeric"
}

case class SqliteCastText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.castText(child.eval(input))
  override protected def withNewChildInternal(c: Expression): SqliteCastText =
    copy(child = c)
  override def prettyName: String = "sqlite_cast_text"
}

case class SqliteCastBlob(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.castBlob(child.eval(input))
  override protected def withNewChildInternal(c: Expression): SqliteCastBlob =
    copy(child = c)
  override def prettyName: String = "sqlite_cast_blob"
}

/** SQLite LIKE (ASCII case folding unless PRAGMA case_sensitive_like,
  * no default escape). `escape` is None unless the statement wrote
  * ESCAPE explicitly. */
case class SqliteLike(left: Expression, right: Expression,
                      escape: Option[Char], caseSensitive: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.like(left.eval(input), right.eval(input), escape,
      caseSensitive)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteLike =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sqlite_like"
}

/** SQLite GLOB (case-sensitive, `* ? [set]`). left = string, right =
  * pattern (the `glob(pattern, string)` FUNCTION swaps at build site). */
case class SqliteGlob(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.glob(left.eval(input), right.eval(input))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteGlob =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sqlite_glob"
}

/** SQLite truth coercion for WHERE/AND/OR/NOT/CASE contexts (probed
  * NOT 'abc' → 1). Identity on an already-boolean child. */
case class SqliteTruth(child: Expression)
    extends UnaryExpression with CodegenFallback with Predicate {
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.truth(child.eval(input))
  override protected def withNewChildInternal(c: Expression): SqliteTruth =
    copy(child = c)
  override def prettyName: String = "sqlite_truth"
}

/** typeof() with SQLite storage-class vocabulary. Exact under the
  * engine's statically-typed columns: class from the declared type,
  * 'null' per-value. */
case class SqliteTypeof(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val tag = SqliteValue.norm(child.eval(input)) match {
      case null => "null"
      case _: java.lang.Long => "integer"
      case _: java.lang.Double => "real"
      case _: UTF8String => "text"
      case _: Array[Byte] => "blob"
      case _ => "text"
    }
    UTF8String.fromString(tag)
  }
  override protected def withNewChildInternal(c: Expression): SqliteTypeof =
    copy(child = c)
  override def prettyName: String = "typeof"
}

/** Comparison with SQLite affinity conversion + storage-class ordering,
  * substituted where one side is a literal (the shape where Spark's
  * ANSI coercion diverges: `i = 'abc'` must be 0, not a cast error).
  * op: 0 `=`, 1 `<`, 2 `<=`, 3 `>`, 4 `>=`. */
case class SqliteCmpLit(left: Expression, right: Expression, op: Int)
    extends BinaryExpression with CodegenFallback with Predicate {
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input)
    if (l == null || r == null) return null
    val c = SqliteValue.cmp(l, r, affOf(left), affOf(right),
      collationOf(left, right))
    java.lang.Boolean.valueOf(op match {
      case 0 => c == 0
      case 1 => c < 0
      case 2 => c <= 0
      case 3 => c > 0
      case _ => c >= 0
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteCmpLit =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sqlite_cmp"
}

/** A folded literal that REMEMBERS the affinity of the expression it
  * came from — `CAST(1 AS INTEGER) = '1'` is 1 in SQLite because the
  * cast's INTEGER affinity converts the text side, even though the cast
  * itself folds to a plain value. Never foldable: the optimizer must not
  * strip the marker out from under [[SqliteCmpLit]]'s affinity probe. */
case class SqliteAffLit(child: Expression, aff: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def withNewChildInternal(c: Expression): SqliteAffLit =
    copy(child = c)
  override def prettyName: String = "sqlite_afflit"
}

/** `& |` with int64 coercion (op 0 and, 1 or). */
case class SqliteBit(op: Int, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = SqliteValue.toI64(left.eval(input))
    val r = SqliteValue.toI64(right.eval(input))
    if (l == null || r == null) null
    else java.lang.Long.valueOf(
      if (op == 0) l.longValue & r.longValue else l.longValue | r.longValue)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteBit =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sqlite_bit"
}

case class SqliteBitNot(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = SqliteValue.toI64(child.eval(input))
    if (v == null) null else java.lang.Long.valueOf(~v.longValue)
  }
  override protected def withNewChildInternal(c: Expression): SqliteBitNot =
    copy(child = c)
  override def prettyName: String = "sqlite_bitnot"
}

/** `<< >>` with SQLite's saturation and negative-count reversal. */
case class SqliteShift(leftShift: Boolean, left: Expression,
                       right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SqliteValue.shift(leftShift, left.eval(input), right.eval(input))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqliteShift =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sqlite_shift"
}
