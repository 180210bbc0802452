package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-severing materialization pins with a RELIABLE mode.
  *
  * The engine pins intermediates (RankOps' ranked rows, CurationRun's
  * survivor set, the dedup verdict's shingle/simhash tables) via
  * `localCheckpoint(true)`: materialize once, cut the lineage, store
  * the blocks on executors. That is the right default — no filesystem
  * round-trip — but the blocks DIE WITH AN EXECUTOR: lineage is
  * severed, so a lost block is unrecoverable and the job fails with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. At test scale irrelevant; on a
  * multi-hour 100 TB curation run executor loss is routine, and a pin
  * that is load-bearing for CORRECTNESS (RankOps) must not also be a
  * single point of job failure.
  *
  * So every corpus-scale pin in the long-running paths (RankOps,
  * CurationRun, packSequences, the dedup verdict family) routes
  * through [[pin]], which picks the mechanism per session:
  *
  *   - default: `localCheckpoint(true)` — fast, executor-resident;
  *   - `spark.graft.reliablePins=true` (plus an
  *     `sc.setCheckpointDir(...)` the caller owns): `checkpoint(true)`
  *     — the pin is files on the checkpoint FS (HDFS/S3 on a cluster),
  *     so losing every executor costs a re-read, never the job.
  *
  * The reliable mode trades one write+read of the pinned projection
  * per pin for fault tolerance — pins are NARROW by convention
  * (RankOps scaladoc), so the tax is proportional to the ranked
  * projection, not the corpus text. Checkpoint files live until the
  * RDD is GC'd (set `spark.cleaner.referenceTracking.cleanCheckpoints`
  * =true) or the caller clears the directory after the run.
  * [[DedupOps.releaseCheckpoint]] stays correct in both modes (block
  * unpersist is a no-op for file-backed pins). */
object Pins {

  /** Session conf: "true" routes [[pin]] through reliable file-backed
    * checkpoints. Requires `sparkContext.setCheckpointDir(...)`. */
  val ReliableConf = "spark.graft.reliablePins"

  /** Materialize `df` and sever its lineage — localCheckpoint by
    * default, reliable `checkpoint` when [[ReliableConf]] is set. */
  def pin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (java.lang.Boolean.parseBoolean(s.conf.get(ReliableConf, "false"))) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true needs sparkContext.setCheckpointDir(...)")
      // checkpoint runs the plan twice on an unpersisted frame (eager
      // count, then the checkpoint-write job recomputes — RDD
      // .checkpoint's scaladoc suggests persisting first). That advice
      // targets LONG lineages; the engine's pins sit one stage past a
      // shuffle, so the "recompute" is a local shuffle-file re-read —
      // measured CHEAPER at 10M than the persist alternative's full
      // cache write+read round-trip (PackScaleProbe: 22.8 s direct vs
      // 74-125 s with persist scaffolding). Deliberately unpersisted.
      df.checkpoint(true)
    } else df.localCheckpoint(true)
  }

  /** `.pin()` postfix form, so pin sites read like the
    * `.localCheckpoint(true)` calls they replace. */
  implicit final class Pinned(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Pins.pin(df)
  }
}
