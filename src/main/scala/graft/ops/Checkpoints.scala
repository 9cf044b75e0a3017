package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Checkpoint policy for iterative loops (VERDICT r8 #4).
  *
  * The iterative operators (the large-star/small-star component loop,
  * PageRank's power iterations, the kNN/Lloyd index builds) cut lineage
  * every round — without a cut, each round's plan nests the previous
  * round's ~6× and analysis stalls after a handful of rounds. The default
  * cut is `localCheckpoint`: blocks live in executor memory/disk, fast,
  * but NOT fault-tolerant — on a real cluster, losing an executor discards
  * its blocks and Spark CANNOT recompute them (the lineage was truncated),
  * killing the job. Fine on local[32]; at 100 TB a long component loop
  * should survive executor churn.
  *
  * The knob: set `spark.graft.checkpointDir` (session conf) or the
  * `SPARK_GRAFT_CHECKPOINT_DIR` env var to a cluster-visible path (HDFS/
  * object store) and every loop cut becomes a RELIABLE `checkpoint()` to
  * that directory — blocks are re-readable by any executor after loss,
  * the standard production setting for iterative Spark jobs. Results are
  * bit-identical through either path (Round9Spec asserts it): the cut
  * changes WHERE materialized rows live, never their values.
  *
  * Laziness is preserved: a lazy local cut maps to a lazy reliable
  * checkpoint (materialization still rides the first consumer's job).
  * Reliable checkpoint files accumulate under the configured directory
  * for the lifetime of the SparkContext (cleaned by
  * `spark.cleaner.referenceTracking.cleanCheckpoints` if enabled, or by
  * deleting the directory after the job — the operational convention).
  */
object Checkpoints {

  private val confKey = "spark.graft.checkpointDir"

  /** The configured reliable-checkpoint directory, if any: session conf
    * first (test/runtime override), env second (deployment).
    */
  private[graft] def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(confKey)
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      .filter(_.nonEmpty)

  // SparkContext.setCheckpointDir creates a fresh UUID subdir per call, so
  // remember what we last set per context instead of re-setting every cut.
  @volatile private var setFor: Option[(SparkContext, String)] = None

  // ADVICE r9 #2: lazy cuts persist MEMORY_AND_DISK until their first
  // consumer materializes, but nothing unpersisted them afterwards — a
  // long loop would accumulate a cached copy of every round's edge set,
  // at exactly the cluster scale the reliable knob targets. Track the
  // most recent lazily-persisted source per context and unpersist it when
  // the NEXT cut arrives (by then the loop has materialized the previous
  // round — the checkpoint files are the stable source, the cache is
  // dead weight). Worst case if two independent lazy loops interleave on
  // one context: an early unpersist costs one recompute into the
  // checkpoint job, never correctness.
  private val lazyPersisted =
    new java.util.concurrent.ConcurrentHashMap[SparkContext, DataFrame]()

  /** Drop (and unpersist) the tracked lazy cut for `sc`. Entries keyed by
    * STOPPED contexts are purged on every cut and every release (ADVICE
    * r10 #5: a stopped context's entry would otherwise pin the context and
    * its last lazy DataFrame for the JVM's life — visible in long test
    * JVMs and notebook servers that cycle sessions). Callable directly at
    * loop end; cut() also invokes the purge, so a cycled session's entry
    * disappears as soon as any successor session cuts.
    */
  def release(sc: SparkContext): Unit = {
    val prev = lazyPersisted.remove(sc)
    // ADVICE r11 #3: the isStopped check races a concurrent stop() — an
    // unpersist on a just-stopped context can throw, and a cleanup call
    // must never fail its caller. Best-effort, like purgeStopped.
    if (prev != null && !sc.isStopped) {
      try prev.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    purgeStopped()
  }

  private def purgeStopped(): Unit = {
    val it = lazyPersisted.keySet.iterator()
    while (it.hasNext) if (it.next().isStopped) it.remove()
    // the remembered checkpoint-dir context is one more stopped-context pin
    synchronized {
      setFor match {
        case Some((sc, _)) if sc.isStopped => setFor = None
        case _ => ()
      }
    }
  }

  /** Test seam: whether `sc` currently has a tracked lazy cut. */
  private[graft] def isTracked(sc: SparkContext): Boolean =
    lazyPersisted.containsKey(sc)

  /** Lineage cut: `localCheckpoint(eager)` by default, reliable
    * `checkpoint(eager)` into the configured directory when the knob is
    * set. See object Scaladoc for the executor-loss semantics of each.
    *
    * The reliable path persists BEFORE checkpointing: Spark's reliable
    * checkpoint writes its files in a SECOND job that re-runs the full
    * lineage unless the rows are already cached (documented
    * ReliableRDDCheckpointData behavior), which would double every loop
    * round's compute — the opposite of what the knob promises. With the
    * persist, the checkpoint job reads cached blocks; the cache is
    * dropped again once the eager materialization is done (the
    * checkpoint files are now the stable source, keeping the cache from
    * accumulating a copy per loop round). Lazy cuts keep the persist
    * until their first consumer materializes both it and the checkpoint
    * in one job.
    */
  def cut(df: DataFrame, eager: Boolean): DataFrame =
    reliableDir(df) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        purgeStopped()
        synchronized {
          if (!setFor.contains((sc, dir))) {
            sc.setCheckpointDir(dir)
            setFor = Some((sc, dir))
          }
        }
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = df.checkpoint(eager)
        // retire the previous round's lazy persist now that a newer cut
        // exists (see lazyPersisted above), then either drop this one too
        // (eager: the checkpoint is already materialized) or enroll it
        val prev = lazyPersisted.remove(sc)
        if (prev != null) prev.unpersist(blocking = false)
        if (eager) df.unpersist(blocking = false)
        else lazyPersisted.put(sc, df)
        out
      case None => df.localCheckpoint(eager)
    }

  /** Call-site sugar: `df.lineageCut(eager)` ≡ `Checkpoints.cut(df, eager)`. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def lineageCut(eager: Boolean): DataFrame = cut(df, eager)
  }
}
