#!/usr/bin/env python3
"""Generate the SQLite expression-semantics golden battery.

Runs every probe against the REAL SQLite (python's bundled library,
same oracle as check_oltp.py) and writes
src/test/resources/sqlite_expr_golden.tsv for SqliteExprSpec, which
replays the same statements through GraftDb and compares values
bit-exactly (doubles by bit pattern).

Line format (tab-separated, %-encoded fields):
  S <sql>                      setup statement (executed on both sides)
  Q <sql> <ncols> <cells...>   query: expected cells row-major
  E <sql> <error>              query expected to FAIL with this message
Cells: N | I:<long> | R:<16-hex doubleToLongBits> | T:<%enc> | B:<hex>
"""
import sqlite3, struct, sys, os
from urllib.parse import quote

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/sqlite_expr_golden.tsv")

SETUP = [
    "CREATE TABLE t(i INTEGER, r REAL, s TEXT, b BLOB)",
    "INSERT INTO t VALUES (5, 2.5, 'abc', X'4142')",
    "INSERT INTO t VALUES (-3, -0.5, 'Hello World', X'00FF')",
    "INSERT INTO t VALUES (NULL, NULL, NULL, NULL)",
    "INSERT INTO t VALUES (7, 1e20, '42', X'31')",
    "INSERT INTO t VALUES (0, 0.0, '', X'')",
    "CREATE TABLE nums(x INTEGER)",
    "INSERT INTO nums VALUES (1),(2),(3),(NULL),(2)",
    "CREATE TABLE txt(w TEXT)",
    "INSERT INTO txt VALUES ('Apple'),('banana'),('Cherry'),('apple'),(NULL),('zz_top'),('10% off')",
    "CREATE TABLE ipk(id INTEGER PRIMARY KEY, v TEXT)",
    "INSERT INTO ipk VALUES (10,'a'),(20,'b'),(30,'c')",
    "CREATE TABLE del(v TEXT)",
    "INSERT INTO del VALUES ('p'),('q'),('r'),('s')",
    "DELETE FROM del WHERE rowid = 2",
    "UPDATE del SET v='X' WHERE rowid = 3",
    "CREATE TABLE wr(a INTEGER PRIMARY KEY, b TEXT) WITHOUT ROWID",
    "INSERT INTO wr VALUES (1,'x')",
    "CREATE TABLE tcol(id INTEGER PRIMARY KEY, s TEXT COLLATE NOCASE, r TEXT COLLATE RTRIM)",
    "INSERT INTO tcol VALUES (1,'Apple','pad  '),(2,'apple','pad'),(3,'BANANA','x '),(4,'ba_na','y')",
]

SCALAR = [
    # ---- division / modulo ----
    "SELECT 7/2", "SELECT -7/2", "SELECT 7.0/2", "SELECT 7/2.0",
    "SELECT 1/0", "SELECT 1.0/0", "SELECT 1%0", "SELECT 1.5%0",
    "SELECT 7%2", "SELECT -7%3", "SELECT 7%-3", "SELECT 7.5%2",
    "SELECT 7.5%2.5", "SELECT 0/5", "SELECT -9223372036854775808/-1",
    # ---- arithmetic text/blob coercion ----
    "SELECT '12abc'+1", "SELECT 'abc'+1", "SELECT '1.5x'*2",
    "SELECT '  12'+0", "SELECT '12e2abc'+0", "SELECT '0x10'+0",
    "SELECT '-3garb'+0", "SELECT '+5'+0", "SELECT '.5'+0",
    "SELECT '1e'+0", "SELECT '1.'+0", "SELECT '9223372036854775808'+0",
    "SELECT X'3132'+1", "SELECT 2+3*4", "SELECT (1+2)*3",
    "SELECT 1+NULL", "SELECT NULL*3", "SELECT ''+1", "SELECT ' '+1",
    # ---- i64 / overflow promotion ----
    "SELECT 9223372036854775807 + 1", "SELECT -9223372036854775808 - 1",
    "SELECT 9223372036854775807 * 2", "SELECT -(-9223372036854775808)",
    "SELECT 2147483647 + 1", "SELECT -2147483648 - 1",
    "SELECT abs(-2147483648)", "SELECT -2147483648 * -1",
    # ---- unary ----
    "SELECT -'5'", "SELECT -'abc'", "SELECT -'5.5'", "SELECT +'abc'",
    "SELECT -NULL", "SELECT -X'3135'",
    # ---- CAST ----
    "SELECT CAST('12abc' AS INTEGER)", "SELECT CAST('abc' AS INTEGER)",
    "SELECT CAST('12.9' AS INTEGER)", "SELECT CAST(-12.9 AS INTEGER)",
    "SELECT CAST(12.9 AS INTEGER)", "SELECT CAST('12.9xy' AS REAL)",
    "SELECT CAST('1e3' AS INTEGER)", "SELECT CAST('1e3' AS REAL)",
    "SELECT CAST(3.0 AS TEXT)", "SELECT CAST(3 AS TEXT)",
    "SELECT CAST(1e20 AS TEXT)", "SELECT CAST(1e20 AS INTEGER)",
    "SELECT CAST(-1e20 AS INTEGER)",
    "SELECT CAST('9223372036854775807' AS INTEGER)",
    "SELECT CAST('9223372036854775808' AS INTEGER)",
    "SELECT CAST('-9223372036854775809' AS INTEGER)",
    "SELECT CAST(NULL AS INTEGER)", "SELECT CAST('12abc' AS NUMERIC)",
    "SELECT CAST('12.5abc' AS NUMERIC)", "SELECT CAST('12.0' AS NUMERIC)",
    "SELECT CAST('1.23' AS NUMERIC)", "SELECT CAST(12.0 AS NUMERIC)",
    "SELECT CAST(12.5 AS NUMERIC)", "SELECT CAST('0x1A' AS INTEGER)",
    "SELECT CAST('' AS INTEGER)", "SELECT CAST('-' AS INTEGER)",
    "SELECT CAST('+12' AS INTEGER)", "SELECT CAST(' 12 ' AS INTEGER)",
    "SELECT CAST(X'414243' AS TEXT)", "SELECT CAST('ab' AS BLOB)",
    "SELECT CAST(12 AS BLOB)", "SELECT CAST(2.5 AS BLOB)",
    "SELECT CAST(0.1 AS TEXT)", "SELECT CAST(1.0/3 AS TEXT)",
    "SELECT CAST(2.5e-5 AS TEXT)", "SELECT CAST(1e15 AS TEXT)",
    "SELECT CAST(1e14 AS TEXT)", "SELECT CAST(123456789012345.0 AS TEXT)",
    "SELECT CAST(1234567890123456.0 AS TEXT)",
    "SELECT CAST(0.000012345 AS TEXT)", "SELECT CAST(1.5e308 AS TEXT)",
    "SELECT CAST(100.0 AS TEXT)", "SELECT CAST(1e-4 AS TEXT)",
    "SELECT CAST(1e-5 AS TEXT)", "SELECT CAST(3.14159265358979 AS TEXT)",
    "SELECT CAST(-0.0 AS TEXT)", "SELECT CAST(1e308*10 AS TEXT)",
    "SELECT CAST(123.456 AS TEXT)", "SELECT CAST(1e-10 AS TEXT)",
    "SELECT CAST(-123.456 AS TEXT)", "SELECT CAST(1e308*-10 AS TEXT)",
    # ---- LIKE ----
    "SELECT 'ABC' LIKE 'a%'", "SELECT 'abc' LIKE 'ABC'",
    "SELECT 'abc' LIKE 'a_c'", "SELECT 5 LIKE 5", "SELECT 15 LIKE '1%'",
    "SELECT NULL LIKE 'a'", "SELECT 'a' LIKE NULL",
    "SELECT 'a%b' LIKE 'ax%b' ESCAPE 'x'",
    "SELECT 'ab' LIKE 'ax%b' ESCAPE 'x'",
    "SELECT 'AxB' LIKE 'a%b' ESCAPE 'q'",
    "SELECT 'a_c' LIKE 'aq_c' ESCAPE 'q'",
    "SELECT 'abc' LIKE 'aq_c' ESCAPE 'q'",
    "SELECT 'C:\\dir' LIKE 'C:\\%'",
    "SELECT '50%' LIKE '50!%' ESCAPE '!'",
    "SELECT '50x' LIKE '50!%' ESCAPE '!'",
    "SELECT '' LIKE ''", "SELECT 'a' LIKE ''", "SELECT '' LIKE '%'",
    "SELECT 'a' || char(92)", "SELECT length('a\\b')",
    "SELECT 'a\\b' = 'a\\b'", "SELECT replace('a\\b', char(92), '/')",
    "SELECT 'abc' LIKE '%%%'", "SELECT 2.5 LIKE '2._'",
    "SELECT X'41' LIKE 'A'", "SELECT 'A' LIKE X'41'",
    "SELECT like('a%', 'ABC')", "SELECT like('a_c', 'abc')",
    "SELECT like('a!_c', 'a_c', '!')",
    # ---- GLOB ----
    "SELECT 'abc' GLOB 'a*'", "SELECT 'ABC' GLOB 'a*'",
    "SELECT 'abc' GLOB 'a?c'", "SELECT 'abc' GLOB 'a[bc]c'",
    "SELECT 'adc' GLOB 'a[!b]c'", "SELECT 'a-c' GLOB 'a[-b]c'",
    "SELECT 'abc' GLOB 'a[b-d]c'", "SELECT 12 GLOB '1*'",
    "SELECT glob('a*','abc')", "SELECT 'a.c' GLOB 'a.c'",
    "SELECT 'axc' GLOB 'a.c'", "SELECT 'abc' GLOB '*'",
    "SELECT '' GLOB '*'", "SELECT 'x' GLOB '[a-z]'",
    "SELECT 'X' GLOB '[a-z]'", "SELECT ']' GLOB '[]]'",
    "SELECT 'a' GLOB '[!]'", "SELECT NULL GLOB 'a'",
    "SELECT 'a*b' GLOB 'a*b'", "SELECT 'adc' GLOB 'a[^b]c'",
    "SELECT 'abc' GLOB 'a[^b]c'", "SELECT 'a!c' GLOB 'a[!b]c'",
    "SELECT 'a^c' GLOB 'a[^b]c'", "SELECT '^' GLOB '[a^]'",
    # ---- typeof ----
    "SELECT typeof(1)", "SELECT typeof(1.0)", "SELECT typeof('a')",
    "SELECT typeof(NULL)", "SELECT typeof(X'41')",
    "SELECT typeof(1+1.0)", "SELECT typeof('1'+1)", "SELECT typeof(7/2)",
    "SELECT typeof(7.0/2)", "SELECT typeof(1/0)",
    "SELECT typeof(CAST('12.0' AS NUMERIC))", "SELECT typeof(-'5')",
    "SELECT typeof('a' LIKE 'b')",
    # ---- comparisons: storage-class ordering & affinity ----
    "SELECT 1 < '0'", "SELECT '1' = 1", "SELECT 1 = '1'",
    "SELECT X'41' > 'z'", "SELECT 2 < 'abc'", "SELECT NULL = NULL",
    "SELECT 5 = 5.0", "SELECT '5' = '5.0'", "SELECT (1+1) = '2'",
    "SELECT CAST(1 AS INTEGER) = '1'", "SELECT 1 IN ('1')",
    "SELECT 1 IN (1, 2)", "SELECT 3 IN (1, 2)", "SELECT NULL IN (1, 2)",
    "SELECT 1 IN (2, NULL)", "SELECT 2 BETWEEN 1 AND '3'",
    "SELECT 'b' BETWEEN 'a' AND 'c'", "SELECT 1 != '1'",
    "SELECT X'00' > 'zzz'", "SELECT '' < 0", "SELECT '' = 0",
    "SELECT X'' = ''", "SELECT 9223372036854775807 > 9.2233720368547e18",
    "SELECT 9007199254740993 = 9007199254740992.0",
    "SELECT 9007199254740993 > 9007199254740992.0",
    # ---- truth coercion ----
    "SELECT NOT 5", "SELECT NOT 0", "SELECT NOT NULL",
    "SELECT NOT 'abc'", "SELECT NOT '1x'", "SELECT 1 AND 'abc'",
    "SELECT 1 AND '1y'", "SELECT 0 OR 2.5", "SELECT 0.0 OR ''",
    "SELECT NOT 0.5", "SELECT NULL OR 1", "SELECT NULL AND 0",
    # ---- CASE / NULLIF / IIF ----
    "SELECT CASE WHEN 'abc' THEN 1 ELSE 2 END",
    "SELECT CASE WHEN '1x' THEN 1 ELSE 2 END",
    "SELECT CASE 5 WHEN '5' THEN 'y' ELSE 'n' END",
    "SELECT NULLIF(1, '1')", "SELECT NULLIF(1, 1)", "SELECT NULLIF('a','b')",
    "SELECT IIF(2.5, 'a', 'b')", "SELECT IIF(0, 'a', 'b')",
    # ---- bitwise / shifts ----
    "SELECT 5 & 3", "SELECT 5 | 3", "SELECT ~5", "SELECT ~'6x'",
    "SELECT '6x' & 3", "SELECT 5.7 & 3", "SELECT NULL & 1",
    "SELECT 1 << 3", "SELECT 1 << 63", "SELECT 1 << 64",
    "SELECT 1 << 100", "SELECT -8 >> 1", "SELECT 8 >> 100",
    "SELECT -8 >> 100", "SELECT 5 >> -1", "SELECT 1 << -1",
    # ---- || concatenation ----
    "SELECT 1 || 'a'", "SELECT 1.0 || 'a'", "SELECT NULL || 'a'",
    "SELECT 1e20 || ''", "SELECT 2.5 || 3",
    # ---- scalar functions ----
    "SELECT abs(-5)", "SELECT abs(5.5)", "SELECT abs('abc')",
    "SELECT abs('-12.5x')", "SELECT abs(NULL)", "SELECT abs(X'3135')",
    "SELECT sign(-5)", "SELECT sign(0)", "SELECT sign('3x')",
    "SELECT sign('abc')", "SELECT sign('3')", "SELECT sign(' -4 ')",
    "SELECT sign(2.5)", "SELECT sign(NULL)",
    "SELECT round(2.5)", "SELECT round(-2.5)", "SELECT round(2.5,0)",
    "SELECT round('2.567',2)", "SELECT round(123,-1)",
    "SELECT round(0.15,1)", "SELECT round(NULL)", "SELECT round('abc')",
    "SELECT round(2.675, 2)", "SELECT round(1e300)", "SELECT round(42)",
    "SELECT round(0.1499999999999999, 1)", "SELECT round(1.0/3, 5)",
    "SELECT round(-0.15, 1)", "SELECT round(9.995, 2)",
    "SELECT round(123.456, 1)", "SELECT round(2.5, 10)",
    "SELECT length(123)", "SELECT length(1.50)", "SELECT length(NULL)",
    "SELECT length(X'414243')", "SELECT length('')",
    "SELECT length('héllo')", "SELECT length(1e20)",
    "SELECT upper(5)", "SELECT lower('AbC')", "SELECT upper('äbc')",
    "SELECT lower('ÄBC')", "SELECT upper(NULL)", "SELECT upper(2.5)",
    "SELECT hex('AB')", "SELECT hex(X'1f')", "SELECT hex(255)",
    "SELECT hex(NULL)", "SELECT hex(2.5)", "SELECT hex('')",
    "SELECT quote('a''b')", "SELECT quote(5)", "SELECT quote(2.5)",
    "SELECT quote(NULL)", "SELECT quote(X'1F')", "SELECT quote(1e20)",
    "SELECT quote('')",
    "SELECT substr('abcdef',2,3)", "SELECT substr('abcdef',-2)",
    "SELECT substr(12345,2,2)", "SELECT substr('abc',0,2)",
    "SELECT substr('abc',2)", "SELECT substr('abcdef',2,-2)",
    "SELECT substr('abc',-5,3)", "SELECT substr('abc',0)",
    "SELECT substr('abcdef',-4,-2)", "SELECT substr('abc',1,0)",
    "SELECT substr('abc',5)", "SELECT substr('abc',NULL)",
    "SELECT substr(X'414243',2)", "SELECT substr(X'414243',1,2)",
    "SELECT substring('abcdef',2,3)", "SELECT substr('héllo',2,2)",
    "SELECT instr('abcabc','bc')", "SELECT instr('abc','x')",
    "SELECT instr(NULL,'a')", "SELECT instr(12345,34)",
    "SELECT instr('abc','')", "SELECT instr(X'414243',X'42')",
    "SELECT instr('héllo','l')",
    "SELECT replace('aXbXc','X','-')", "SELECT replace(123,'2','9')",
    "SELECT replace('abc','','z')", "SELECT replace('abc','b',NULL)",
    "SELECT replace('aaa','aa','b')",
    "SELECT trim('  a  ')", "SELECT ltrim('xxaxx','x')",
    "SELECT rtrim('xxaxx','x')", "SELECT trim('xay','xy')",
    "SELECT trim('abca','abc')", "SELECT ltrim('  a')",
    "SELECT rtrim('a  ')", "SELECT trim(123, '13')", "SELECT trim(NULL)",
    "SELECT zeroblob(3)", "SELECT length(zeroblob(5))",
    "SELECT zeroblob(0)", "SELECT zeroblob(-1)",
    "SELECT unicode('abc')", "SELECT char(65,66)",
    "SELECT min(3,'2')", "SELECT max(3,'2')", "SELECT min(2,3.5)",
    "SELECT max('a',X'00')", "SELECT min(1,NULL)", "SELECT max(4,2,9,1)",
    "SELECT coalesce(NULL,2)", "SELECT ifnull(NULL,'x')",
]

# LIKE under PRAGMA case_sensitive_like (section re-runs with setup)
CS_LIKE = [
    "SELECT 'ABC' LIKE 'a%'", "SELECT 'abc' LIKE 'abc'",
    "SELECT 'Abc' LIKE 'a_c'", "SELECT like('a%','ABC')",
]

TABLE = [
    # typeof over columns
    "SELECT typeof(i), typeof(r), typeof(s), typeof(b) FROM t WHERE i = 5",
    "SELECT typeof(i) FROM t WHERE i IS NULL",
    # arithmetic over columns (numeric columns: static typing exact)
    "SELECT i+1, i-1, i*2, i/2, i%3 FROM t WHERE i IS NOT NULL ORDER BY i",
    "SELECT r/2, r*2 FROM t WHERE r IS NOT NULL ORDER BY r",
    "SELECT i/0, r/0.0, i%0 FROM t WHERE i = 5",
    "SELECT -i, -r FROM t WHERE i = -3",
    # comparisons: affinity per column
    "SELECT count(*) FROM t WHERE i = '5'",
    "SELECT count(*) FROM t WHERE i = '5.0'",
    "SELECT count(*) FROM t WHERE i = 'abc'",
    "SELECT count(*) FROM t WHERE i < 'abc'",
    "SELECT count(*) FROM t WHERE s = 5",
    "SELECT count(*) FROM t WHERE s > 5",
    "SELECT count(*) FROM t WHERE r = '2.5'",
    "SELECT count(*) FROM t WHERE i IN ('5','7')",
    "SELECT count(*) FROM t WHERE b = X'4142'",
    "SELECT count(*) FROM t WHERE b > 'zzz'",
    "SELECT count(*) FROM t WHERE s < X'00'",
    "SELECT count(*) FROM t WHERE i BETWEEN '1' AND '9'",
    "SELECT count(*) FROM t WHERE s BETWEEN 'a' AND 'z'",
    # truth coercion in WHERE
    "SELECT count(*) FROM t WHERE i", "SELECT count(*) FROM t WHERE s",
    "SELECT count(*) FROM t WHERE r", "SELECT count(*) FROM t WHERE 'abc'",
    "SELECT count(*) FROM t WHERE '1x'",
    "SELECT count(*) FROM nums WHERE x AND x-1",
    # LIKE/GLOB over columns
    "SELECT count(*) FROM txt WHERE w LIKE 'a%'",
    "SELECT count(*) FROM txt WHERE w LIKE '%P%'",
    "SELECT count(*) FROM txt WHERE w NOT LIKE 'a%'",
    "SELECT count(*) FROM txt WHERE w GLOB 'a*'",
    "SELECT count(*) FROM txt WHERE w GLOB '[Ab]*'",
    "SELECT count(*) FROM txt WHERE w LIKE '10!%%' ESCAPE '!'",
    "SELECT count(*) FROM txt WHERE w LIKE 'zz_t%'",
    "SELECT w FROM txt WHERE w LIKE 'apple'",
    # group_concat
    "SELECT group_concat(x) FROM nums",
    "SELECT group_concat(x, '-') FROM nums",
    "SELECT group_concat(DISTINCT x) FROM nums",
    "SELECT group_concat(x) FROM nums WHERE x IS NULL",
    "SELECT group_concat(w) FROM txt",
    "SELECT group_concat(r) FROM t WHERE r IS NOT NULL",
    "SELECT x % 2 AS g, group_concat(x) FROM nums WHERE x IS NOT NULL GROUP BY x % 2 ORDER BY g",
    # aggregates with coercion
    "SELECT sum(x), avg(x), total(x), count(x), min(x), max(x) FROM nums",
    "SELECT typeof(sum(x)), typeof(avg(x)), typeof(total(x)) FROM nums",
    # scalar functions over columns
    "SELECT upper(s), lower(s) FROM t WHERE i = -3",
    "SELECT length(s), length(b) FROM t WHERE i = 5",
    "SELECT hex(b), quote(b), quote(s) FROM t WHERE i = 5",
    "SELECT substr(s, 2, 3), instr(s, 'l') FROM t WHERE i = -3",
    "SELECT replace(s, 'l', 'L') FROM t WHERE i = -3",
    "SELECT abs(i), abs(r), sign(i) FROM t WHERE i = -3",
    "SELECT round(r, 0) FROM t WHERE i = 5",
    "SELECT i || s, s || '!' FROM t WHERE i = 5",
    "SELECT CAST(s AS INTEGER), CAST(s AS REAL), CAST(i AS TEXT), CAST(r AS TEXT) FROM t WHERE i = 7",
    "SELECT CAST(b AS TEXT), CAST(s AS BLOB) FROM t WHERE i = 5",
    # HAVING truth coercion
    "SELECT x, count(*) FROM nums WHERE x IS NOT NULL GROUP BY x HAVING count(*)-1 ORDER BY x",
    # UPDATE/DELETE rows_affected through SQLite semantics
    "SELECT count(*) FROM t WHERE i+1 = 6",
    "SELECT count(*) FROM t WHERE NOT i",
    # LIKE/GLOB vs column collation (LIKE uses its OWN ASCII folding,
    # GLOB stays case-sensitive, = uses the column collation)
    "SELECT id FROM tcol WHERE s = 'APPLE' ORDER BY id",
    "SELECT id FROM tcol WHERE s LIKE 'apple' ORDER BY id",
    "SELECT id FROM tcol WHERE s LIKE 'a%' ORDER BY id",
    "SELECT id FROM tcol WHERE s GLOB 'a*' ORDER BY id",
    "SELECT id FROM tcol WHERE s GLOB 'apple' ORDER BY id",
    "SELECT id FROM tcol WHERE s LIKE 'ba!_na' ESCAPE '!' ORDER BY id",
    "SELECT id FROM tcol WHERE r = 'pad' ORDER BY id",
    "SELECT id FROM tcol WHERE r LIKE 'pad' ORDER BY id",
    "SELECT id FROM tcol WHERE r LIKE 'pad%' ORDER BY id",
    "SELECT id FROM tcol WHERE r GLOB 'pad' ORDER BY id",
    "SELECT count(*) FROM tcol WHERE s < 'apple'",
    "SELECT count(*) FROM tcol WHERE s BETWEEN 'A' AND 'azzz'",
    # rowid pseudo-column exposure
    "SELECT rowid FROM nums ORDER BY rowid",
    "SELECT rowid, x FROM nums ORDER BY rowid",
    "SELECT _rowid_, oid FROM nums ORDER BY _rowid_",
    "SELECT * FROM nums WHERE rowid = 2",
    "SELECT rowid+1 FROM nums ORDER BY rowid",
    "SELECT max(rowid) FROM nums",
    "SELECT rowid AS r FROM nums ORDER BY r",
    "SELECT n.rowid FROM nums AS n ORDER BY n.rowid",
    "SELECT n.* FROM nums n WHERE n.rowid = 3",
    "SELECT rowid, v FROM ipk ORDER BY rowid",
    "SELECT * FROM ipk WHERE rowid = 20",
    "SELECT oid FROM ipk WHERE v = 'b'",
    "SELECT v FROM del ORDER BY rowid",
    "SELECT rowid, v FROM del ORDER BY rowid",
    "SELECT count(*) FROM nums WHERE rowid > 2",
    "SELECT x FROM nums WHERE rowid IN (1, 3) ORDER BY rowid",
]

ERRORS = [
    ("SELECT nosuchfn(1)", "no such function: nosuchfn"),
    ("SELECT 'a' REGEXP 'b'", "no such function: REGEXP"),
    ("SELECT abs(-9223372036854775808)", "integer overflow"),
]

TABLE_ERRORS = [
    ("SELECT rowid FROM wr", "no such column: rowid"),
]


def cell(v):
    if v is None:
        return "N"
    if isinstance(v, int):
        return "I:%d" % v
    if isinstance(v, float):
        return "R:" + struct.pack(">d", v).hex()
    if isinstance(v, bytes):
        return "B:" + v.hex()
    return "T:" + quote(str(v), safe="")


def main():
    conn = sqlite3.connect(":memory:")
    conn.text_factory = str
    lines = []

    def emit_q(sql):
        try:
            cur = conn.execute(sql)
            rows = cur.fetchall()
        except Exception as e:
            print("SKIP (sqlite error) %r -> %s" % (sql, e), file=sys.stderr)
            return
        ncols = len(cur.description) if cur.description else 0
        cells = [cell(v) for row in rows for v in row]
        lines.append("Q\t%s\t%d\t%s" % (quote(sql, safe=""), ncols,
                                        " ".join(cells)))

    for sql in SCALAR:
        emit_q(sql)
    for sql, err in ERRORS:
        lines.append("E\t%s\t%s" % (quote(sql, safe=""), quote(err, safe="")))

    conn.execute("PRAGMA case_sensitive_like=ON")
    lines.append("S\t" + quote("PRAGMA case_sensitive_like=ON", safe=""))
    for sql in CS_LIKE:
        emit_q(sql)
    conn.execute("PRAGMA case_sensitive_like=OFF")
    lines.append("S\t" + quote("PRAGMA case_sensitive_like=OFF", safe=""))

    for sql in SETUP:
        conn.execute(sql)
        lines.append("S\t" + quote(sql, safe=""))
    for sql in TABLE:
        emit_q(sql)
    for sql, err in TABLE_ERRORS:
        lines.append("E\t%s\t%s" % (quote(sql, safe=""), quote(err, safe="")))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote %s (%d lines)" % (OUT, len(lines)))


if __name__ == "__main__":
    main()
