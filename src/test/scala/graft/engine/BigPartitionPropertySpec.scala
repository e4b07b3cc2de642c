package graft.engine

import graft.SparkSpec
import graft.command._

/** Differential property test for the partition-scoped bucketed store:
  * a disk-backed db whose table spills past a tiny cap (so every mutation
  * runs the bucketed UPDATE/DELETE/INSERT machinery, bucket size 50) must
  * stay value- AND order-identical to an in-memory db executing the same
  * statement sequence on the driver-side Mem path (the SQLite-parity
  * model), through interleaved checkpoints and a close/reopen recovery
  * (journal replay over bucketed mutations). Seeded: failures reproduce.
  */
class BigPartitionPropertySpec extends SparkSpec {

  private def ok(db: GraftDb, sql: String): Response = {
    val r = db.executeStringStmt(sql).fold(e => fail(e), identity).head
    assert(r.error.isEmpty, s"unexpected error for [$sql]: ${r.error}")
    r
  }

  private def dump(db: GraftDb): (Seq[Seq[Value]], Seq[Value]) = {
    val sorted = db.queryStringStmt("SELECT id, v, s FROM t ORDER BY id")
      .fold(e => fail(e), _.head.values)
    val natural = db.queryStringStmt("SELECT id FROM t")
      .fold(e => fail(e), _.head.values).map(_.head)
    (sorted, natural)
  }

  test("random mutation sequence: bucketed disk store ≡ Mem model (+recovery)") {
    sys.props("graft.bigPartRows") = "50"
    try {
      val rnd = new scala.util.Random(20260814L)
      val root = java.nio.file.Files.createTempDirectory("graft-bigprop-")
        .resolve("db").toString
      var disk = GraftDb.open(spark, root, 100).fold(e => fail(e), identity)
      val model = GraftDb.openInMemory(spark, 1000000)
      val ddl = "CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER, s TEXT)"
      val seed = "INSERT INTO t SELECT id + 1, (id + 1) * 3, " +
        "'r' || CAST(id AS STRING) FROM range(500)"
      Seq(disk, model).foreach { db => ok(db, ddl); ok(db, seed) }
      assert(disk.isSpilled("t"), "500 rows over cap 100 must spill")
      ok(disk, "UPDATE t SET v = v WHERE id = 1") // materialize buckets

      def randOp(): String = rnd.nextInt(6) match {
        case 0 => s"UPDATE t SET v = v + ${rnd.nextInt(9) + 1} " +
          s"WHERE id % ${rnd.nextInt(7) + 2} = ${rnd.nextInt(2)}"
        case 1 =>
          val a = rnd.nextInt(600) + 1
          s"UPDATE t SET s = upper(s) WHERE id BETWEEN $a AND ${a + rnd.nextInt(60)}"
        case 2 =>
          val a = rnd.nextInt(600) + 1
          s"DELETE FROM t WHERE id BETWEEN $a AND ${a + rnd.nextInt(25)}"
        case 3 => s"INSERT INTO t(v, s) VALUES (${rnd.nextInt(100)}, " +
          s"'n${rnd.nextInt(1000)}')"
        case 4 =>
          val id = rnd.nextInt(600) + 1
          s"INSERT INTO t VALUES ($id, ${rnd.nextInt(100)}, 'u$id') " +
            s"ON CONFLICT(id) DO UPDATE SET v = ${rnd.nextInt(100)}"
        case 5 => s"DELETE FROM t WHERE v % ${rnd.nextInt(11) + 2} = 0 " +
          s"AND id % 2 = ${rnd.nextInt(2)}"
      }

      // ops 31-34 run AFTER the last checkpoint (i=30), so they exist
      // only in the journal at close time — the reopen below must replay
      // them onto the recovered store (checkpointing last would truncate
      // the journal and reduce recovery to a snapshot load)
      (1 to 34).foreach { i =>
        val sql = randOp()
        val (rd, rm) = (ok(disk, sql), ok(model, sql))
        assert(rd.rowsAffected == rm.rowsAffected,
          s"op $i rows_affected diverged for [$sql]: " +
            s"disk=${rd.rowsAffected} model=${rm.rowsAffected}")
        if (i % 10 == 0 && i <= 30) {
          assert(disk.checkpoint().isRight)
          val (ds, dn) = dump(disk)
          val (ms, mn) = dump(model)
          assert(ds == ms, s"sorted content diverged after op $i [$sql]")
          assert(dn == mn, s"insertion order diverged after op $i [$sql]")
        }
      }
      // recovery: journal suffix past the last checkpoint replays the
      // bucketed mutations on a fresh instance
      val (preS, preN) = dump(disk)
      disk.close()
      disk = GraftDb.open(spark, root, 100).fold(e => fail(e), identity)
      val (postS, postN) = dump(disk)
      assert(postS == preS, "sorted content diverged across recovery")
      assert(postN == preN, "insertion order diverged across recovery")
      val (ms, mn) = dump(model)
      assert(postS == ms && postN == mn, "recovered db diverged from model")
      disk.close(); model.close()
    } finally sys.props -= "graft.bigPartRows"
  }
}
