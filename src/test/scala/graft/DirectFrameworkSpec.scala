package graft

import graft.direct.Framework

/** cngi.direct parity surface: InitializeFramework / GetFrameworkClient
  * (`cngi/direct/framework.py:24-91`). Run against the shared test JVM,
  * where Spark's one-context-per-JVM rule makes getOrCreate return the
  * existing session — the spec therefore exercises the wrapper's
  * contract (returns a live session, records it, knobs reach the
  * builder) without re-initializing, which would stop the session the
  * other suites share.
  */
class DirectFrameworkSpec extends SparkSpec {

  test("initializeFramework returns a live session and getFrameworkClient tracks it") {
    spark // force the shared session first (so getOrCreate adopts it)
    // Order-independent precondition: forget (not stop) any session a
    // previously-run suite may have registered, then assert pristine.
    Framework.forgetForTest()
    assert(Framework.getFrameworkClient.isEmpty)
    val s = Framework.initializeFramework(workers = 2,
      extraConf = Map("spark.graft.direct.marker" -> "yes"))
    assert(!s.sparkContext.isStopped)
    assert(Framework.getFrameworkClient.contains(s))
    // extra conf pairs reach the (shared) session conf
    assert(s.conf.get("spark.graft.direct.marker") == "yes")
    // the returned session can run a graft operator end to end
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(df.count() == 2L)
  }
}
