package graft.plans

import org.apache.spark.sql.DataFrame

/** Injectable lineage-cut for iterative queries (the dedup-cluster
  * fixpoint, the LS/SS rounds, the corpus-pipeline diamond).
  *
  * `localCheckpoint` materializes to EXECUTOR storage: fast, and fine on
  * local[32], but on a real cluster losing one executor mid-fixpoint
  * kills the job — the blocks are not replicated to reliable storage.
  * At 100 TB the iterative queries want reliable `checkpoint()` into a
  * fault-tolerant checkpoint dir (HDFS/object store). Which one runs is
  * a session conf, not a code path: set
  *
  *   spark.conf.set(Checkpoints.modeKey, "reliable")
  *   spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
  *
  * and every cut in the engine switches to the fault-tolerant form. The
  * default stays "local" so test/bench behavior is unchanged.
  */
object Checkpoints {
  /** Session conf key: "local" (default) or "reliable". */
  val modeKey = "graft.checkpoint.mode"

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (s.conf.get(modeKey, "local") == "reliable") {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$modeKey=reliable requires sparkContext.setCheckpointDir(...) " +
          "to point at fault-tolerant storage")
      df.checkpoint() // eager; blocks land in the checkpoint dir
    } else df.localCheckpoint()
  }
}
