package graft.ext

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Cluster-switchable stage materialization for the multi-stage pipelines
  * (dedup candidate generation, label propagation, PageRank edges, BPE
  * iteration, k-means assignment).
  *
  * Every iterative/reused intermediate in `ext/` goes through
  * [[materialize]] instead of calling `localCheckpoint()` directly, so ONE
  * knob (`-Dgraft.stageMaterialize=<mode>`) selects the right durability
  * story for the deployment:
  *
  *  - `local` (default; right for local[N] dev and the driver bench):
  *    `localCheckpoint()` — blocks pinned in executor storage memory,
  *    zero I/O, lineage cut. NOT fault-tolerant: losing an executor loses
  *    the stage (on local[N] the "executor" is the JVM, so this is moot).
  *  - `reliable` (the cluster default for real multi-executor runs):
  *    `checkpoint()` to the Spark checkpoint dir (HDFS/S3 in production —
  *    set `sc.setCheckpointDir`; a temp dir is provisioned if unset so the
  *    mode is runnable out of the box). Survives executor loss — a 100 TB
  *    dedup run does not restart from the scan because one of 1000
  *    executors died mid-PPJoin.
  *  - `table` : write the stage to a parquet table and read it back —
  *    the "bucketed intermediate table" strategy: the stage becomes a
  *    first-class columnar artifact (inspectable, reusable across jobs,
  *    prunable by downstream scans). Base dir: `graft.stageDir` sys prop,
  *    else a temp dir (deleted on JVM exit).
  *
  * All three modes are value-identical by construction (same rows, order
  * not guaranteed by any of them — no ext/ pipeline depends on stage
  * order); StageMaterializeSpec pins that on the x54/x75/x108 paths.
  *
  * Reference: dust delegates everything to single-node SQLite
  * (`/root/reference/db/src/db.rs`) and has no multi-stage distributed
  * pipelines, so there is no counterpart; this is the Spark-native
  * operability layer the 100 TB mandate requires.
  */
object Stages {

  /** Current strategy — read per call so tests can flip it at runtime. */
  def mode: String = sys.props.getOrElse("graft.stageMaterialize", "local")

  private val counter = new AtomicLong(0)

  @volatile private var tmpBase: Path = _
  private def tableBase(): Path = synchronized {
    sys.props.get("graft.stageDir") match {
      case Some(d) =>
        val p = java.nio.file.Paths.get(d)
        Files.createDirectories(p)
        p
      case None =>
        if (tmpBase == null) {
          tmpBase = Files.createTempDirectory("graft-stages-")
          val doomed = tmpBase
          Runtime.getRuntime.addShutdownHook(new Thread(() =>
            if (Files.exists(doomed)) {
              val s = Files.walk(doomed)
              try s.sorted(Comparator.reverseOrder[Path]())
                .forEach(p => Files.deleteIfExists(p))
              finally s.close()
            }))
        }
        tmpBase
    }
  }

  /** Materialize `df` under the session's configured strategy and return
    * the stage-cut frame. Eager in all modes (the stage computes once,
    * here, not lazily per downstream consumer). */
  def materialize(df: DataFrame): DataFrame = mode match {
    case "local" => df.localCheckpoint()
    case "reliable" =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          Files.createTempDirectory("graft-ckpt-").toString)
      df.checkpoint()
    case "table" =>
      val spark = df.sparkSession
      val out = tableBase().resolve(s"stage-${counter.incrementAndGet()}")
      df.write.mode("overwrite").parquet(out.toString)
      spark.read.parquet(out.toString)
    case other => throw new IllegalArgumentException(
      s"graft.stageMaterialize=$other (expected local | reliable | table)")
  }

  /** Import in pipeline files: `df.stageMaterialize` replaces the old
    * hard-coded `df.localCheckpoint()`. */
  implicit class StageOps(private val df: DataFrame) extends AnyVal {
    def stageMaterialize: DataFrame = materialize(df)
  }
}
