package graft

import org.apache.spark.sql.Dataset

/** Lineage-truncation backend for the iterative kernels (label
  * propagation, PageRank fixed point, triangle orientation, recursive
  * CTE rounds): every loop must cut its plan per round or driver-side
  * analysis goes exponential, and each module historically did that with
  * eager `localCheckpoint()` — fast (executor-local blocks, no
  * replication) but NOT executor-loss-safe: a lost executor takes its
  * blocks and there is no lineage left to recompute them, so the job
  * dies (BASELINE.md fault-drill caveat through round 13).
  *
  * `GRAFT_RELIABLE_CKPT=1` (round-13 judge task #5) switches every call
  * site to reliable `Dataset.checkpoint()`: round state is materialized
  * to files under the checkpoint dir, which survive executor death, so
  * the scheduler re-reads instead of aborting — the mode a real cluster
  * runs iterative jobs in (there the dir must be shared storage:
  * HDFS/S3; here /tmp is shared across the local-cluster executor JVMs
  * on one box). FaultDrill drills dedup_cluster_components /
  * graph_pagerank under this flag (BASELINE.md §fault drills). The
  * default stays localCheckpoint: on the bench box the reliable path
  * adds a file round-trip per round for durability the single-JVM gate
  * cannot use.
  *
  * Returned ids are the persistent-RDD blocks the call created (empty in
  * reliable mode — checkpoint files are freed with the checkpoint dir,
  * not by block id); callers release superseded rounds' ids explicitly,
  * never via ContextCleaner GC (round-5 hygiene discipline).
  *
  * Disk growth in reliable mode (round-14 advisor, closed round 16):
  * checkpoint FILES are only freed by the ContextCleaner when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is set at
  * context creation. Every graft entrypoint (Verify, Bench, FaultDrill,
  * SparkTestBase) now sets it unconditionally — harmless outside reliable
  * mode, and in reliable mode superseded rounds' checkpoint trees are
  * GC-collected instead of living for the app lifetime. A reliable-mode
  * session whose context was built WITHOUT the conf (an embedding
  * application's own session) cannot be fixed post-hoc (the ContextCleaner
  * reads it at construction), so the first ckpt under such a context warns
  * once with the bound: disk grows by one round-state tree per loop round
  * until app exit.
  */
object Ckpt {
  val reliable: Boolean = sys.env.contains("GRAFT_RELIABLE_CKPT")
  private val warnedNoCleaner = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** One-slot checkpoint registry (r17): for query bodies whose plan
    * consumes one derived table TWICE (a stats aggregate joined back
    * against its own source — bm25, tf-idf), checkpointing the shared
    * table executes its expensive pass ONCE per invocation instead of once
    * per consumer. The slot pins the checkpointed Dataset and releases the
    * PREVIOUS invocation's blocks (the graph_pagerank final-state
    * discipline) — release must lag one invocation because the returned
    * plan still references the blocks when the query function returns.
    * The checkpoint itself is eager and runs inside the caller's timed
    * window; nothing is reused across invocations.
    */
  private val slots = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), (Dataset[_], Seq[Int])]()

  def slot[T](key: String, df: Dataset[T]): Dataset[T] = {
    val sc = df.sparkSession.sparkContext
    val (out, ids) = apply(df)
    Option(slots.put((sc, key), (out, ids))).foreach { case (_, oldIds) =>
      val live = sc.getPersistentRDDs
      oldIds.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    }
    out
  }

  def apply[T](df: Dataset[T]): (Dataset[T], Seq[Int]) = {
    val sc = df.sparkSession.sparkContext
    if (reliable) {
      this.synchronized {
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(s"${sys.props("java.io.tmpdir")}/graft_reliable_ckpt")
      }
      if (!sc.getConf.getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints",
          defaultValue = false) && warnedNoCleaner.compareAndSet(false, true))
        Console.err.println("[graft.Ckpt] GRAFT_RELIABLE_CKPT is on but this " +
          "SparkContext was built without spark.cleaner.referenceTracking." +
          "cleanCheckpoints=true: superseded checkpoint trees will accumulate " +
          "(one per loop round) until the application exits.")
      (df.checkpoint(), Seq.empty)
    } else {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.filterNot(before).toSeq)
    }
  }
}
