package graft

import graft.sources.IoOps

/** s3a smoke test (VERDICT r4 task 7a). The sandbox has no S3 endpoint
  * and no hadoop-aws jar, so the round-trip is cancelled unless the
  * environment provides one:
  *
  *   GRAFT_S3A_TEST=http://localhost:9000   # MinIO/localstack endpoint
  *   GRAFT_S3A_BUCKET=graft-test            # optional, default graft-test
  *   AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY
  *
  * `sbt test` reports it as canceled (yellow), never silently green —
  * the suite documents exactly what a real-cluster deployment must
  * verify: IoOps.writeVis/readVis work unchanged through `s3a://`
  * paths (cngi/dio/read_vis.py:70-179 is the reference's S3 branch;
  * ours is the same code path as local disk by design).
  */
class S3SmokeSpec extends SparkSpec {
  import spark.implicits._

  private val endpoint = sys.env.get("GRAFT_S3A_TEST")

  test("writeVis/readVis round-trip through s3a://") {
    assume(endpoint.isDefined,
      "no S3 endpoint: set GRAFT_S3A_TEST=<endpoint-url> (plus AWS creds) to run")
    assume(try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
           catch { case _: ClassNotFoundException => false },
      "hadoop-aws (S3AFileSystem) not on the classpath")
    val bucket = sys.env.getOrElse("GRAFT_S3A_BUCKET", "graft-test")
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.endpoint", endpoint.get)
    conf.set("fs.s3a.path.style.access", "true") // MinIO/localstack layout
    val path = s"s3a://$bucket/graft_s3_smoke.vis"
    val df = Seq((0, 0, 1, 1.5), (1, 0, 2, 2.5), (2, 1, 2, 3.5))
      .toDF("time", "antenna1", "antenna2", "amp")
    IoOps.writeVis(df, path, partitionBy = Seq("antenna1"))
    val back = IoOps.readVis(spark, path,
      partitionFilter = Map("antenna1" -> Seq(0)))
    assert(back.count() == 2)
    assert(IoOps.readVis(spark, path).count() == 3)
  }
}
