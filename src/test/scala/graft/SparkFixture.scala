package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared across every suite — session startup is ~5s
  * and specs are plan-construction-heavy, so per-suite sessions would
  * dominate test wall-clock. */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Sessions.quietBoundedWindowWarnings()
    s
  }
}

trait SparkFixture {
  lazy val spark: SparkSession = SharedSpark.spark
  val sfDir = "/root/testdata/sf0.001"
}

object SparkFixture {
  /** The sf1 (10× sf0.1) corpus path, generating it when absent —
    * the sandbox wipes generated corpora between sessions, and a spec
    * that merely `assume`d the directory silently lost its coverage
    * on every fresh checkout. Generation is deterministic
    * (tools/gen_sf1.py), ~20 s, marker-gated (_GRAFT_COMPLETE is the
    * generator's last write, so a killed run regenerates); memoized
    * per JVM so parallel suites pay it once. None = ungenerable here
    * (missing source corpus or python) — callers cancel with the
    * manual command. */
  lazy val ensureSf1Memo: Option[String] = {
    val dir = new java.io.File("testdata/sf1")
    val marker = new java.io.File(dir, "_GRAFT_COMPLETE")
    if (marker.exists()) Some(dir.getPath)
    else {
      val src = new java.io.File("/root/testdata/sf0.1")
      if (!src.isDirectory) None
      else {
        val rc = scala.util.Try(scala.sys.process.Process(
          Seq("python3", "tools/gen_sf1.py", src.getPath, dir.getPath, "10")).!)
          .getOrElse(-1)
        if (rc == 0 && marker.exists()) Some(dir.getPath) else None
      }
    }
  }
  def ensureSf1(): Option[String] = ensureSf1Memo
}
