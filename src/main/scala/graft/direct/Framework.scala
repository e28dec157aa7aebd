package graft.direct

import org.apache.spark.sql.SparkSession

/** The reference's `cngi.direct` session surface
  * (`cngi/direct/framework.py:24-91`: `InitializeFramework` spins up a
  * dask LocalCluster + Client and stores it in a module global;
  * `GetFrameworkClient` returns it) — re-expressed for Spark. The
  * reference's knob set maps one-to-one:
  *
  *   - workers            → `master("local[n]")` locally (on a real
  *                          cluster: `spark.executor.instances`)
  *   - memory (per worker) → `spark.executor.memory` (cluster); in
  *                          local mode all workers share the driver
  *                          JVM, whose heap is fixed at launch — the
  *                          value is recorded but cannot resize a
  *                          running JVM, exactly like dask's
  *                          `memory_limit` with `processes=False`
  *   - processes/threads  → Spark local mode is always threads; the
  *                          processes=True analog is a real cluster
  *                          manager
  *
  * Like the reference, re-initializing closes the previous session
  * first, and `getFrameworkClient` returns the live one (or None).
  * Every extra conf pair is passed straight to the builder, so any
  * `spark.*` knob is reachable through the same call — and the graft
  * SQL function surface (`GraftExtensions`) is always installed.
  */
object Framework {

  @volatile private var active: Option[SparkSession] = None

  /** `InitializeFramework(workers, memory, ...)`
    * (`cngi/direct/framework.py:24-75`). Returns the session all
    * subsequent graft operators should run on.
    */
  def initializeFramework(workers: Int = 2, memory: String = "8g",
                          extraConf: Map[String, String] = Map.empty)
      : SparkSession = synchronized {
    active.foreach(_.stop())
    val b = SparkSession.builder()
      .master(s"local[$workers]")
      .appName("graft-direct")
      .config("spark.sql.shuffle.partitions", workers)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.memory", memory)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    active = Some(s)
    s
  }

  /** `GetFrameworkClient()` (`cngi/direct/framework.py:78-91`). */
  def getFrameworkClient: Option[SparkSession] = active

  /** Forget the tracked session WITHOUT stopping it. Test-only: lets a
    * suite assert the pristine "no client yet" contract regardless of
    * which suite touched the module global first in the shared JVM.
    */
  private[graft] def forgetForTest(): Unit = synchronized { active = None }
}
