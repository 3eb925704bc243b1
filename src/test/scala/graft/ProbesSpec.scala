package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** The probe-cap contract (Probes.isProbe): capping must select a
  * deterministic PREFIX of the standard every-50th-id probe set — the
  * capped bench workload is a subset of the uncapped one, never a
  * different one — and the default (no cap) must be byte-identical to
  * the historical `id % 50 === 0` convention every committed record
  * was taken under. */
class ProbesSpec extends AnyFunSuite with SparkFixture {

  private def withCap[A](n: Long)(body: => A): A = {
    sys.props("spark.graft.probeCap") = n.toString
    try body finally sys.props.remove("spark.graft.probeCap")
  }

  test("uncapped isProbe matches the historical % 50 convention") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val viaHelper = emb.filter(Probes.isProbe(col("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val viaLiteral = emb.filter(col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(viaHelper.sameElements(viaLiteral))
    assert(viaHelper.nonEmpty)
  }

  test("cap selects exactly the first N probes by id (dense-id corpus)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = emb.filter(Probes.isProbe(col("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val capped = withCap(3) {
      emb.filter(Probes.isProbe(col("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).sorted
    }
    assert(capped.length === math.min(3, all.length))
    assert(capped.sameElements(all.take(capped.length)))
  }

  test("capped q45 results equal the uncapped results restricted to the capped probes") {
    val full = Ann.q45AnnIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val capped = withCap(2)(Ann.q45AnnIvf(spark, sfDir).collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val cappedProbes = capped.map(_._1).toSet
    assert(cappedProbes.size <= 2 && cappedProbes.nonEmpty)
    // same (probe, neighbor, rank) triples: the cap changes WHICH
    // probes run, never what any probe retrieves (the IVF index —
    // centroids, cells — is corpus-side and cap-independent)
    assert(capped.toSet === full.filter(t => cappedProbes(t._1)))
  }
}
