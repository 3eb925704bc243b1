package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.sources.Tables

/** Dev tool: stage-by-stage wall attribution of q53's adjacency build
  * (the r13 target — 958 s of the 1331 s sf100 count wall). Each
  * variant is built from a FRESH plan (fresh shuffle ids — no
  * cross-variant shuffle reuse) and selected by argv so variants can
  * run in separate JVMs. */
object Profile53 {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile53] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1fs")
      r
    }
    // warmup scan + shuffle codegen
    Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag")).count().count()

    def asInt(c: org.apache.spark.sql.Column) = c.cast("int")
    def freshAdj() = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"),
        explode(expr("filter(parts, p -> p != src)")).as("dst"))
      .groupBy(asInt(col("src")).as("src"))
      .agg(array_distinct(collect_list(asInt(col("dst")))).as("nbrs"))
      .select(col("src").as("node"), col("nbrs"),
        size(col("nbrs")).cast("long").as("outdeg"))

    variant match {
      case "count" =>
        time("count only (no store)") { freshAdj().count() }
      case "persist" =>
        val a = freshAdj().persist()
        time("persist+count") { a.count() }
        time("re-read round") {
          a.select(explode(col("nbrs")).as("d"), col("outdeg"))
            .groupBy(col("d")).agg(sum(col("outdeg"))).count()
        }
      case "persist_ser" =>
        val a = freshAdj().persist(StorageLevel.MEMORY_AND_DISK_SER)
        time("persist(SER)+count") { a.count() }
      case "ckpt" =>
        val a = time("localCheckpoint") { freshAdj().localCheckpoint() }
        time("re-read round") {
          a.select(explode(col("nbrs")).as("d"), col("outdeg"))
            .groupBy(col("d")).agg(sum(col("outdeg"))).count()
        }
      case "nocompress" =>
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
        val a = freshAdj().persist()
        time("persist(nocompress)+count") { a.count() }
      case "selfjoin" =>
        // pairs via co-partitioned self-join (no collect_set), then the
        // same array adjacency agg
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), asInt(col("l_partkey")).as("pk"))
        val a = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
          .groupBy(col("src"))
          .agg(array_distinct(collect_list(col("dst"))).as("nbrs"))
          .select(col("src").as("node"), col("nbrs"),
            size(col("nbrs")).cast("long").as("outdeg"))
          .persist()
        time("selfjoin arrays persist") { a.count() }
      case "flat" =>
        // full flat build: self-join pairs -> codegen dedup ->
        // repartition(src) -> flat persist; node table; one flat round
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), asInt(col("l_partkey")).as("pk"))
        val edges = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
          .groupBy(col("src"), col("dst")).agg(count(lit(1)))
          .select(col("src"), col("dst"))
          .repartition(col("src"))
          .persist()
        time("flat edges persist") { edges.count() }
        val nodes = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("outdeg")).persist()
        time("node table") { nodes.count() }
        val state = nodes.withColumn("rank", lit(1000000L))
        time("one flat round") {
          edges.join(state.hint("SHUFFLE_HASH"), col("src") === col("node"))
            .select(col("dst"), expr("rank div outdeg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
            .count()
        }
        val round = edges.join(state.hint("SHUFFLE_HASH"), col("src") === col("node"))
          .select(col("dst"), expr("rank div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
        time("second flat round") { round.count() }
      case "hashthresh" =>
        // hypothesis: collect_set/collect_list (ObjectHashAggregate)
        // fall back to SORT-BASED aggregation at 128 distinct keys per
        // partition — both build aggs sort their full input today
        spark.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          (16 * 1024 * 1024).toString)
        val a = freshAdj().persist()
        time("persist(hashthresh)+count") { a.count() }
        time("re-read round") {
          a.select(explode(col("nbrs")).as("d"), col("outdeg"))
            .groupBy(col("d")).agg(sum(col("outdeg"))).count()
        }
    }
    spark.stop()
  }
}
