package graft.engine

import graft.SparkSpec
import graft.command._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based generalization of the reference's transaction goldens
  * (db.rs:689-826): a tx batch is all-or-nothing; a non-tx batch applies
  * exactly its successful prefix-independent statements. Generators run
  * under fixed seeds (no scalatest-scalacheck bridge in the offline cache).
  */
class TxPropertySpec extends SparkSpec {

  private def check[A](gen: Gen[A], trials: Int = 25)(prop: A => Boolean): Unit =
    (1 to trials).foreach { i =>
      val sample = gen(Gen.Parameters.default, Seed(i.toLong)).get
      assert(prop(sample), s"failed for seed $i: $sample")
    }

  private def freshDb: GraftDb = {
    val db = GraftDb.openInMemory(spark)
    db.executeStringStmt(
      "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, v TEXT)")
    db
  }

  private def ids(db: GraftDb): Seq[Long] =
    db.queryStringStmt("SELECT id FROM t ORDER BY id").toOption.get.head
      .values.map(_.head.asInstanceOf[Value.Integer].v)

  // statements: id drawn from a small domain so collisions (UNIQUE
  // failures) actually happen
  private val stmtGen: Gen[Statement] = for {
    id <- Gen.choose(1, 8)
    v <- Gen.alphaStr.map(_.take(5))
  } yield Statement(s"INSERT INTO t(id, v) VALUES($id, '$v')")

  private def idOf(s: Statement): Long =
    "VALUES\\((\\d+)".r.findFirstMatchIn(s.sql).get.group(1).toLong

  private val batchGen: Gen[List[Statement]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, stmtGen))

  test("tx batch is atomic: post-state is pre-state or fully applied") {
    check(batchGen) { stmts =>
      val db = freshDb
      val before = ids(db)
      val res = db.execute(Request(transaction = true, stmts)).toOption.get
      val after = ids(db)
      val failed = res.exists(_.error.nonEmpty)
      if (failed) after == before
      else after.toSet == stmts.map(idOf(_)).toSet
    }
  }

  test("non-tx batch applies exactly the successful statements") {
    check(batchGen) { stmts =>
      val db = freshDb
      val res = db.execute(Request(transaction = false, stmts)).toOption.get
      val after = ids(db).toSet
      val expected = scala.collection.mutable.Set[Long]()
      stmts.zip(res).foreach { case (s, r) =>
        if (r.error.isEmpty)
          expected += idOf(s)
      }
      after == expected.toSet
    }
  }

  // conflict-policy properties over the same colliding-id generator: the
  // model is a Map[id -> v] (last write wins for REPLACE, first for IGNORE)
  private def rows(db: GraftDb): Map[Long, String] =
    db.queryStringStmt("SELECT id, v FROM t ORDER BY id").toOption.get.head
      .values.map(r => r.head.asInstanceOf[Value.Integer].v ->
        r(1).asInstanceOf[Value.Text].v).toMap

  private def vOf(s: Statement): String =
    "'([^']*)'".r.findFirstMatchIn(s.sql).get.group(1)

  test("INSERT OR REPLACE batch == last-write-wins map; never errors") {
    check(batchGen) { stmts =>
      val db = freshDb
      val rep = stmts.map(s => s.copy(sql =
        s.sql.replace("INSERT INTO", "INSERT OR REPLACE INTO")))
      val res = db.execute(Request(transaction = false, rep)).toOption.get
      val model = stmts.map(s => idOf(s) -> vOf(s)).toMap
      res.forall(_.error.isEmpty) && rows(db) == model
    }
  }

  test("INSERT OR IGNORE batch == first-write-wins map; never errors") {
    check(batchGen) { stmts =>
      val db = freshDb
      val ign = stmts.map(s => s.copy(sql =
        s.sql.replace("INSERT INTO", "INSERT OR IGNORE INTO")))
      val res = db.execute(Request(transaction = false, ign)).toOption.get
      val model = stmts.reverse.map(s => idOf(s) -> vOf(s)).toMap // first wins
      res.forall(_.error.isEmpty) && rows(db) == model
    }
  }

  test("upsert DO UPDATE batch == last-write-wins map; OR ABORT == plain") {
    check(batchGen) { stmts =>
      val db = freshDb
      val up = stmts.map(s => s.copy(sql =
        s.sql + " ON CONFLICT(id) DO UPDATE SET v=excluded.v"))
      val res = db.execute(Request(transaction = false, up)).toOption.get
      val model = stmts.map(s => idOf(s) -> vOf(s)).toMap
      val db2 = freshDb
      val ab = stmts.map(s => s.copy(sql =
        s.sql.replace("INSERT INTO", "INSERT OR ABORT INTO")))
      val resAb = db2.execute(Request(transaction = false, ab)).toOption.get
      val db3 = freshDb
      val resPlain = db3.execute(Request(transaction = false, stmts)).toOption.get
      res.forall(_.error.isEmpty) && rows(db) == model &&
        resAb.map(_.error) == resPlain.map(_.error) && rows(db2) == rows(db3)
    }
  }

  test("response count: tx truncates at first error, non-tx never does") {
    check(batchGen) { stmts =>
      val db1 = freshDb
      val tx = db1.execute(Request(transaction = true, stmts)).toOption.get
      val db2 = freshDb
      val ntx = db2.execute(Request(transaction = false, stmts)).toOption.get
      val firstErr = tx.indexWhere(_.error.nonEmpty)
      (ntx.size == stmts.size) &&
        (firstErr < 0 || tx.size == firstErr + 1)
    }
  }
}
