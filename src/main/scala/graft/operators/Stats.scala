package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Statistical analysis operators: metric correlation and A/B
  * experiment readout — the reference's dashboards chart metric
  * series side by side (dash_app.py trend panels) and compare cohort
  * conversion; these are the two computations behind those views.
  *
  * Numeric policy: every sum of products accumulates as
  * decimal(38,0) (exact, order-independent — DuckDB's HUGEINT), and
  * floats appear only in the final scalar arithmetic, written in the
  * identical operation order in the oracle SQL so IEEE rounding
  * matches bit for bit.
  */
object Stats {

  private def bigint(c: Column): Column = c.cast("decimal(38,0)")

  /** Pearson correlation matrix between the daily count series of
    * every event-type pair.
    *
    * Spark-first shape: one groupBy builds the (day, type, cnt)
    * series; a broadcast-sized day×type grid zero-fills days where a
    * type is silent (a day with no events at all is absent for every
    * type — there is nothing to anchor it to); the pair frame is a
    * self-equi-join ON DAY (each side carries only the small daily
    * series, never the fact table), and one map-side-combinable
    * aggregate reduces each pair to the six exact sufficient sums
    * (n, Σx, Σy, Σxy, Σx², Σy²). r is derived from those sums alone,
    * so the result is independent of partitioning and row order. At
    * 100 TB the fact scan happens once; everything after it is
    * calendar×types-sized. Not built on `corr()`: float accumulation
    * order varies with partitioning — integer sufficient sums are
    * reproducible by construction. */
  def q67Correlation(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
    val daily = e.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val grid = e.select(col("day")).distinct()
      .crossJoin(broadcast(e.select(col("event_type")).distinct()))
    val dense = grid.join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val a = dense.select(col("day"), col("event_type").as("type_a"), col("cnt").as("x"))
    val b = dense.select(col("day"), col("event_type").as("type_b"), col("cnt").as("y"))
    val sums = a.join(b, "day")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(bigint(col("x"))).as("sx"),
        sum(bigint(col("y"))).as("sy"),
        sum(bigint(col("x")) * bigint(col("y"))).as("sxy"),
        sum(bigint(col("x")) * bigint(col("x"))).as("sxx"),
        sum(bigint(col("y")) * bigint(col("y"))).as("syy"))
    val n = bigint(col("n_days"))
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = sqrt((n * col("sxx") - col("sx") * col("sx")).cast("double")) *
      sqrt((n * col("syy") - col("sy") * col("sy")).cast("double"))
    sums.select(
      col("type_a"), col("type_b"), col("n_days"),
      col("sx").cast("bigint").as("sum_a"),
      col("sy").cast("bigint").as("sum_b"),
      when(den > 0, num / den).as("pearson_r"))
  }

  /** A/B experiment readout: deterministic hash assignment of users
    * to two variants, per-variant conversion and revenue, and the
    * two-proportion z statistic for the difference.
    *
    * Assignment is `mix32(user_id) % 2` — the engine-neutral mixed
    * hash (NOT the raw Knuth multiplicative hash: multiplying by an
    * odd constant preserves parity, so `% 2` of it would just be
    * `user_id % 2`). The pipeline is two aggregates: per-user
    * (conversion flag + revenue — map-side combinable on the user
    * key) then one global conditional-sum row. No joins, no windows;
    * at 100 TB this is a scan plus two exchanges, the second of which
    * carries one row per partition. z and the rates are pure
    * functions of six exact integers. */
  def q68Experiment(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))).as("rev"))
      .select(
        (Exprs.mix32(col("user_id")) % 2).as("variant"),
        (col("purchases") > 0).cast("int").as("converted"),
        coalesce(col("rev"), lit(0).cast("decimal(18,2)")).as("rev"))
    val d = (c: Column) => c.cast("double")
    val cells = perUser.agg(
      count(when(col("variant") === 0, 1)).as("users_a"),
      count(when(col("variant") === 1, 1)).as("users_b"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0)).as("conv_a"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0)).as("conv_b"),
      sum(when(col("variant") === 0, col("rev"))).cast("double").as("rev_a"),
      sum(when(col("variant") === 1, col("rev"))).cast("double").as("rev_b"))
    val rateA = d(col("conv_a")) / d(col("users_a"))
    val rateB = d(col("conv_b")) / d(col("users_b"))
    val pooled = d(col("conv_a") + col("conv_b")) / d(col("users_a") + col("users_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / d(col("users_a")) + lit(1.0) / d(col("users_b"))))
    cells.select(
      col("users_a"), col("users_b"), col("conv_a"), col("conv_b"),
      when(col("users_a") > 0, rateA).as("rate_a"),
      when(col("users_b") > 0, rateB).as("rate_b"),
      when(col("users_a") > 0 && col("users_b") > 0 && se > 0,
        (rateA - rateB) / se).as("z_score"),
      when(col("users_a") > 0, col("rev_a") / d(col("users_a"))).as("arpu_a"),
      when(col("users_b") > 0, col("rev_b") / d(col("users_b"))).as("arpu_b"))
  }

  /** Chi-square TERM DRIFT across corpus sources — the distribution
    * check a training pipeline runs when a new crawl/source lands: a
    * source×term contingency table, each cell's chi-square
    * contribution (o-e)²/e, and the top drifted terms. A term whose
    * usage is uniform across sources contributes ~0; a term
    * concentrated in one source dominates — exactly the "did this
    * source shift the vocabulary distribution" question (PSI needs
    * ln(); the chi-square statistic answers the same question in
    * div/mul-only arithmetic that reproduces bit-for-bit across
    * engines).
    *
    * Scale shape: one corpus scan → explode → the (source, term)
    * contingency cells via a map-side-combinable groupBy; marginals
    * are two aggregations of the CELLS (sources×vocab rows, not the
    * corpus); the readout quantizes each cell's double contribution
    * to integer micro-units (identical IEEE ops on exact integer
    * inputs → identical doubles → identical floor), so the cross-
    * source sum is an order-free integer sum and the top-20 ranking
    * is engine-exact. */
  def q81ChisqDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val cells = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col("source")).agg(sum(col("o")).as("r_tot"))
    val colTot = cells.groupBy(col("term"))
      .agg(sum(col("o")).as("c_tot"), count(lit(1)).as("n_sources"))
    val nTot = rowTot.agg(sum(col("r_tot")).as("n_tot"))
    // e and the contribution use doubles, but every input is an exact
    // int64 (< 2^53) and the op sequence (*, /, -, *, /) is written
    // identically in the oracle — bit-identical, then floored to µ-units
    val contrib = cells
      .join(broadcast(rowTot), "source")
      .join(colTot, "term")
      .crossJoin(broadcast(nTot))
      .withColumn("e", d(col("r_tot")) * d(col("c_tot")) / d(col("n_tot")))
      .withColumn("chi2_micro",
        floor((d(col("o")) - col("e")) * (d(col("o")) - col("e")) / col("e")
          * lit(1000000.0)).cast("long"))
    val w = Window.orderBy(col("chi2_micro_sum").desc, col("term").asc)
    contrib
      .groupBy(col("term"))
      .agg(
        sum(col("chi2_micro")).as("chi2_micro_sum"),
        max(col("c_tot")).as("term_total"),
        max(col("n_sources")).as("n_sources"))
      .withColumn("drift_rank", row_number().over(w))
      .filter(col("drift_rank") <= 20)
  }

  /** Embedding-dimension statistics — the QA pass an embedding corpus
    * gets before indexing: per-dimension moments and the most
    * CORRELATED dimension pairs (high |corr| means redundant axes —
    * the signal that decides whitening/PCA or a smaller PQ subspace
    * split). One corpus scan reduces to exact sufficient statistics
    * (n, Σx per dim; Σxy per dim pair over the i<j upper triangle):
    * quantized integer inputs into decimal(38,0) sums — exact and
    * order-free at any scale — then corr derives from the exact
    * aggregates in one fixed double sequence both engines replicate.
    *
    * Scale: the pair triangle comes from the fused GramTriangleAgg
    * kernel — per vector, dim²/2 multiply-adds into a partition-local
    * long[] (exact decimal carries past int64), NO generated pair
    * rows and NO positional self-join; the only exchange in the pass
    * is one ~2k-cell buffer per partition. (The join form shuffled
    * the exploded positions and sort-merge joined 40M rows at sf1 —
    * 3.4 s for what is 40M MACs; a generate form ran interpreted:
    * higher-order lambdas never enter codegen.) The sums are the
    * same exact decimal(38,0) values. Pair ranking uses corr —
    * derived from exact decimals, bit-identical — so the top-20 is
    * engine-exact. */
  def q84EmbedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = (c: Column) => c.cast("double")
    val pos = Clustering.quantizedVecs(spark, dir)
      .select(col("vec_id"), posexplode(col("q")).as(Seq("i", "x")))
    val dims = pos.groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(bigint(col("x"))).as("sx"),
        sum(bigint(col("x") * col("x"))).as("sxx"))
    val pairs = Clustering.quantizedVecs(spark, dir)
      .select(col("q")).as[Seq[Long]]
      .select(new graft.functions.GramTriangleAgg(64, strict = true).toColumn)
      .toDF("cells")
      .select(explode(col("cells")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        col("p.s").cast("decimal(38,0)").as("sxy"))
    val w = Window.orderBy(abs(col("corr")).desc, col("i").asc, col("j").asc)
    pairs
      .join(broadcast(dims.select(col("i"), col("n"),
        col("sx").as("sx_i"), col("sxx").as("sxx_i"))), "i")
      .join(broadcast(dims.select(col("i").as("j"),
        col("sx").as("sx_j"), col("sxx").as("sxx_j"))), "j")
      .withColumn("cnum", d(col("n")) * d(col("sxy")) - d(col("sx_i")) * d(col("sx_j")))
      .withColumn("vnum_i", d(col("n")) * d(col("sxx_i")) - d(col("sx_i")) * d(col("sx_i")))
      .withColumn("vnum_j", d(col("n")) * d(col("sxx_j")) - d(col("sx_j")) * d(col("sx_j")))
      .withColumn("corr", col("cnum") / (sqrt(col("vnum_i")) * sqrt(col("vnum_j"))))
      .withColumn("pair_rank", row_number().over(w))
      .filter(col("pair_rank") <= 20)
      .select(col("i"), col("j"), col("n"), col("corr"), col("pair_rank"))
  }

  /** q96: dominant principal direction of the embedding corpus by
    * integer POWER ITERATION over the second-moment (Gram) matrix —
    * the embedding-QA readout behind anisotropy checks ("all my
    * vectors point the same way" is the classic broken-encoder
    * signature; a dominant direction hogging the spectrum means
    * cosine similarity is measuring the artifact, not content).
    * Output: per-dimension loading of the top eigenvector (fixed
    * scale: max |loading| = 10000) plus the Rayleigh-quotient
    * eigenvalue estimate.
    *
    * Scale shape: the ONLY corpus-sized pass is the Gram triangle —
    * one self-join per vector on vec_id bounded by dim²/2 groups
    * (the q84 discipline), map-side combined. The matrix is divided
    * by n (floorDiv — second moment, magnitude independent of corpus
    * size, no int64 overflow at any N), collected as ≤ dim(dim+1)/2
    * rows (metadata, the q32/q82 centroid-collect policy), and the 5
    * power-iteration rounds run on the driver in exact integer
    * arithmetic — dim×dim times 5 multiplies, microseconds.
    * Determinism: components quantize at floor(x·4096) (4096 = 2^12,
    * exact in binary FP, so floor is engine-identical), every division
    * is floorDiv, renormalization is integer (·10000 div max|w|) — the
    * oracle replays gram, floorDiv-by-n, and all 5 unrolled rounds in
    * DuckDB. The q32/q53/q86 reproducibility discipline applied to
    * spectral estimation. */
  def q96PcaPower(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val iters = 5
    val scaleV = 10000L
    // upper triangle (i <= j) of Σ x_i·x_j via the fused
    // GramTriangleAgg kernel (the q84 shape): per vector dim²/2
    // multiply-adds into partition-local state, no pair rows, no
    // self-join — the only exchange is one ~2k-cell buffer per
    // partition
    import spark.implicits._
    val tri = Tables.embeddings(spark, dir)
      .select(expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 4096.0D) as bigint))")
        .as("qv"))
      .as[Seq[Long]]
      .select(new graft.functions.GramTriangleAgg(64, strict = false).toColumn)
      .toDF("cells")
      .select(explode(col("cells")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        col("p.s").cast("bigint").as("s"))
      .collect()
    val n = Tables.embeddings(spark, dir).count()
    require(n > 0, "q96: empty embedding corpus")
    val g = Array.ofDim[Long](dim, dim)
    tri.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2))
      val v = Math.floorDiv(s, n)
      g(i)(j) = v; g(j)(i) = v
    }
    var v = Array.fill(dim)(scaleV)
    var w = Array.fill(dim)(0L)
    for (_ <- 1 to iters) {
      w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      require(m > 0, "q96: zero Gram matrix")
      v = w.map(x => Math.floorDiv(x * scaleV, m))
    }
    val wFin = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
    // Rayleigh quotient in BigInt: Σ v_i·w_i can exceed int64 for a
    // worst-case corpus (DuckDB's SUM(BIGINT) is HUGEINT — same math)
    val num = v.indices.map(i => BigInt(v(i)) * BigInt(wFin(i))).sum
    val den = v.map(x => BigInt(x) * BigInt(x)).sum
    val lambda = ((num - num.mod(den)) / den).toLong // floorDiv
    import spark.implicits._
    v.toSeq.zipWithIndex
      .map { case (l, i) => (i.toLong, l, lambda) }
      .toDF("i", "loading", "lambda_q")
  }
}
