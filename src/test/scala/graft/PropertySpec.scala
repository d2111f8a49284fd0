package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.schema.SchemaOps
import graft.sink.Warehouse

/** Property-based checks over the disposition algebra (SURVEY §5): merge
  * idempotence, replace-equals-last-batch, conform totality/idempotence.
  * ScalaCheck generators driven directly with fixed seeds (the scalatestplus
  * bridge isn't on the offline classpath); Spark jobs per case are
  * expensive, so case counts stay small but the inputs are genuinely
  * generated (duplicate PKs, arbitrary values).
  */
class PropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType),
    StructField("Amount", LongType)))

  private def df(rows: Seq[(String, Long)]) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private val batchGen: Gen[List[(String, Long)]] =
    Gen.listOfN(6, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0L, 99L)))

  private def samples[T](g: Gen[T], n: Int, seed0: Long): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed0 + i)))

  test("property: merging a batch twice == merging it once") {
    for (((initial, batch), i) <- samples(Gen.zip(batchGen, batchGen), 5, 42).zipWithIndex) {
      val once = new Warehouse(spark, tmpDir(s"p-once$i"))
      val twice = new Warehouse(spark, tmpDir(s"p-twice$i"))
      once.replace("t", df(initial)); twice.replace("t", df(initial))
      once.merge("t", df(batch), Seq("Id"))
      twice.merge("t", df(batch), Seq("Id"))
      twice.merge("t", df(batch), Seq("Id"))
      val a = once.load("t").orderBy("Id", "Amount").collect().toSeq
      val b = twice.load("t").orderBy("Id", "Amount").collect().toSeq
      assert(a == b, s"case $i: initial=$initial batch=$batch")
    }
  }

  test("property: broadcast and sort-merge anti-join merge paths are equivalent") {
    // gate = 0 forces every delete set down the SMJ fallback; the result
    // must be byte-equal to the broadcast path on the same random batches —
    // the size gate may only ever change the PLAN, never the table.
    for (((initial, batch), i) <- samples(Gen.zip(batchGen, batchGen), 5, 271828).zipWithIndex) {
      val bcast = new Warehouse(spark, tmpDir(s"p-gate-b$i"))
      val smj = new Warehouse(spark, tmpDir(s"p-gate-s$i"), mergeBroadcastMaxKeys = 0L)
      bcast.replace("t", df(initial)); smj.replace("t", df(initial))
      bcast.merge("t", df(batch), Seq("Id"))
      smj.merge("t", df(batch), Seq("Id"))
      val a = bcast.load("t").orderBy("Id", "Amount").collect().toSeq
      val b = smj.load("t").orderBy("Id", "Amount").collect().toSeq
      assert(a == b, s"case $i: initial=$initial batch=$batch")
    }
  }

  test("property: star and propagate connected components agree on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(30, Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)))
        .map(_.filter { case (a, b) => a != b })
    val eschema = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    for ((es, i) <- samples(edgeGen, 4, 1618).zipWithIndex) {
      val edges = spark.createDataFrame(es.map(e => Row(e._1, e._2)).asJava, eschema)
      val prop = graft.functions.Graph.connectedComponents(edges, maxIter = 30)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val star = graft.functions.Graph.connectedComponents(edges, maxIter = 30, algorithm = "star")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(prop == star, s"case $i: edges=$es")
    }
  }

  test("property: replace == last batch, regardless of history") {
    for (((first, last), i) <- samples(Gen.zip(batchGen, batchGen), 5, 137).zipWithIndex) {
      val wh = new Warehouse(spark, tmpDir(s"p-repl$i"))
      wh.replace("t", df(first))
      wh.replace("t", df(last))
      val got = wh.load("t").orderBy("Id", "Amount").collect().toSeq
      val want = df(last).orderBy("Id", "Amount").collect().toSeq
      assert(got == want, s"case $i")
    }
  }

  test("property: clusterBy and compact never change table contents") {
    for ((batches, i) <- samples(Gen.listOfN(3, batchGen), 3, 613).zipWithIndex) {
      val wh = new Warehouse(spark, tmpDir(s"p-compact$i"))
      batches.foreach(b => wh.append("t", df(b), Seq("Amount"), clusterBy = Seq("Amount")))
      val expected = batches.flatten.sorted
      def contents() = wh.load("t").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(contents() == expected, s"case $i after clustered appends")
      wh.compact("t", sortBy = Seq("Amount"))
      assert(contents() == expected, s"case $i after compact")
    }
  }

  test("property: predicate file skipping never changes query results") {
    // Random multi-file tables + random predicates: the catalog scan (with
    // ManifestPruneRule active) must equal a raw load + filter. A pruning
    // bug here would silently DROP rows, which no fixed example reliably
    // catches — so the inputs are generated.
    spark.conf.set("spark.sql.catalog.pgraft", classOf[graft.catalog.GraftCatalog].getName)
    val proot = tmpDir("p-prune-root")
    spark.conf.set("spark.sql.catalog.pgraft.root", proot)
    val wh = new Warehouse(spark, proot)
    val predGen: Gen[String] = Gen.oneOf(
      for {
        op <- Gen.oneOf("=", ">", ">=", "<", "<=")
        v <- Gen.choose(-10L, 110L)
      } yield s"Amount $op $v",
      // prefix + null-safe forms ride the same property: pruning may only
      // ever shrink IO, never change the answer
      Gen.oneOf("a", "b", "c", "d", "e", "").map(c => s"Id LIKE '$c%'"),
      Gen.oneOf("a", "c", "e").map(c => s"Id <=> '$c'"))
    for ((batches, i) <- samples(Gen.listOfN(3, batchGen), 4, 271).zipWithIndex) {
      val t = s"pt$i"
      batches.foreach(b => wh.append(t, df(b).repartition(1), Seq("Amount")))
      for ((pred, j) <- samples(predGen, 6, 1000L * i).zipWithIndex) {
        val got = spark.sql(s"SELECT Id, Amount FROM pgraft.$t WHERE $pred")
          .orderBy("Id", "Amount").collect().toSeq
        val want = wh.load(t).filter(pred).orderBy("Id", "Amount").collect().toSeq
        assert(got == want, s"case $i/$j pred=$pred")
      }
    }
  }

  test("property: int8 quantize/reconstruct error bound holds on generated vectors") {
    import org.apache.spark.sql.functions._
    import graft.queries.SimilarityQueries.{quantizeInt8, reconstructInt8}
    // vectors of varying dim, mixed sign/magnitude, plus all-zero vectors
    val vecGen: Gen[List[Double]] = Gen.oneOf(
      Gen.choose(1, 8).flatMap(d => Gen.listOfN(d, Gen.choose(-10.0, 10.0))),
      Gen.choose(1, 8).map(d => List.fill(d)(0.0)))
    for ((vecs, i) <- samples(Gen.listOfN(8, vecGen), 4, 1234).zipWithIndex) {
      val in = spark.createDataFrame(
        vecs.zipWithIndex.map { case (v, j) => Row(j.toLong, v) }.asJava,
        StructType(Seq(StructField("vec_id", LongType),
          StructField("v", ArrayType(DoubleType)))))
      val out = reconstructInt8(quantizeInt8(in))
        .select(col("vec_id"), col("scale"),
          aggregate(zip_with(col("rv"), col("v"), (a, b) => abs(a - b)),
            lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"),
          aggregate(col("qv"), lit(0), (acc, q) =>
            greatest(acc, abs(q.cast("int")))).as("max_q"))
        .collect()
      out.foreach { r =>
        assert(r.getDouble(2) <= r.getDouble(1) / 2 + 1e-12,
          s"case $i vec ${r.getLong(0)}: err ${r.getDouble(2)} > scale/2 ${r.getDouble(1) / 2}")
        assert(r.getInt(3) <= 127, s"case $i vec ${r.getLong(0)}: |q| ${r.getInt(3)} > 127")
      }
    }
  }

  test("property: appendDeduped admits exactly the first row per fingerprint") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("fp", StringType)))
    val rowGen = Gen.zip(Gen.choose(0L, 999L), Gen.oneOf("p", "q", "r", "s", "t"))
    for ((batches, i) <- samples(Gen.listOfN(3, Gen.listOfN(6, rowGen)), 4, 99).zipWithIndex) {
      val wh = new Warehouse(spark, tmpDir(s"p-dedup$i"))
      var admitted = 0L
      batches.foreach { b =>
        val in = spark.createDataFrame(
          b.map(r => Row(r._1, r._2)).asJava, docSchema)
        val rep = wh.appendDeduped("c", in, "fp", "doc_id")
        admitted += rep.appended
        assert(rep.appended + rep.dupInBatch + rep.dupInTable == b.size, s"case $i: $rep")
      }
      val table = wh.load("c").collect().map(r => (r.getLong(0), r.getString(1)))
      val wantFps = batches.flatten.map(_._2).toSet
      assert(table.map(_._2).toSet == wantFps, s"case $i: fingerprint set mismatch")
      assert(table.length == wantFps.size && admitted == wantFps.size,
        s"case $i: ${table.length} rows for ${wantFps.size} fingerprints")
      // the kept row per fp is the min-pk row of the EARLIEST batch containing it
      val want = batches.zipWithIndex.flatMap { case (b, bi) =>
        b.map(r => (r._2, bi, r._1))
      }.groupBy(_._1).map { case (fp, rs) =>
        val firstBatch = rs.map(_._2).min
        fp -> rs.filter(_._2 == firstBatch).map(_._3).min
      }
      table.foreach { case (id, fp) =>
        assert(want(fp) == id, s"case $i: kept $id for $fp, want ${want(fp)}")
      }
    }
  }

  test("property: q84 chunk arithmetic covers every token with bounded overlap") {
    // pure arithmetic mirror of the q84 formula: starts = 1 to max(n-8,1)
    // by 24, chunk = [s, min(s+31, n)] — every token covered, adjacent
    // full chunks overlap by exactly 8
    for (n <- 1 to 400) {
      val starts = 1 to math.max(n - 8, 1) by 24
      val covered = starts.flatMap(s => s to math.min(s + 31, n)).toSet
      assert((1 to n).forall(covered), s"n=$n: uncovered tokens")
      starts.sliding(2).foreach {
        case Seq(a, b) =>
          if (b + 31 <= n) // both chunks full
            assert(a + 31 - b + 1 == 8, s"n=$n: overlap ${a + 31 - b + 1} != 8")
        case _ =>
      }
    }
  }

  test("property: saltedJoin equals the plain equi-join on skewed generated data") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Skew
    // heavy skew: most fact rows share one hot key
    val factGen = Gen.listOfN(40,
      Gen.zip(Gen.frequency(8 -> Gen.const("hot"), 2 -> Gen.oneOf("b", "c", "d")),
        Gen.choose(0L, 99L)))
    val dimGen = Gen.listOfN(4, Gen.zip(Gen.oneOf("hot", "b", "c", "d", "e"),
      Gen.choose(100L, 199L)))
    for (((facts, dims), i) <- samples(Gen.zip(factGen, dimGen), 4, 777).zipWithIndex) {
      val f = df(facts).withColumnRenamed("Amount", "fa")
      val d = df(dims.distinct).withColumnRenamed("Amount", "da")
      val plain = f.join(d, "Id").orderBy("Id", "fa", "da").collect().toSeq
      val salted = Skew.saltedJoin(f, d, "Id")
        .select("Id", "fa", "da").orderBy("Id", "fa", "da").collect().toSeq
      assert(plain == salted, s"case $i: facts=$facts dims=$dims")
    }
  }

  test("property: conform is total and idempotent on arbitrary target subsets") {
    val targets = Seq(
      StructType(Seq(StructField("Id", StringType))),
      StructType(Seq(StructField("Amount", DoubleType), StructField("Id", StringType))),
      StructType(Seq(StructField("New", TimestampType), StructField("Id", StringType))))
    for (((rows, target), i) <-
        samples(Gen.zip(batchGen, Gen.oneOf(targets)), 6, 7).zipWithIndex) {
      val once = SchemaOps.conform(df(rows), target)
      val twiceDf = SchemaOps.conform(once, target)
      assert(once.schema.fieldNames.toSeq == target.fieldNames.toSeq, s"case $i")
      assert(twiceDf.schema == once.schema, s"case $i")
      assert(once.count() == rows.size, s"case $i")
    }
  }

  test("property: morMerge and merge converge to identical content on random histories") {
    // deferred-IO upsert (delete-file + append) vs copy-on-write rewrite:
    // same algebra, so any batch history must land identical bags — before
    // AND after the MOR side materializes its pending deletes
    val histGen = Gen.listOfN(3, batchGen)
    for ((batches, i) <- samples(histGen, 4, 11137L).zipWithIndex) {
      val cow = new Warehouse(spark, tmpDir(s"p-mmcow$i"))
      val mor = new Warehouse(spark, tmpDir(s"p-mmmor$i"))
      cow.replace("t", df(batches.head)); mor.replace("t", df(batches.head))
      batches.tail.foreach { b =>
        cow.merge("t", df(b), Seq("Id"))
        mor.morMerge("t", df(b), Seq("Id"))
      }
      def bag(w: Warehouse) = w.load("t").collect().toSeq.map(_.toSeq)
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(bag(mor) == bag(cow), s"case $i diverged before materialization")
      mor.compactDeletes("t")
      assert(bag(mor) == bag(cow), s"case $i diverged after materialization")
    }
  }

  test("property: positionDelete and deleteWhere remove identical rows on random predicates") {
    import org.apache.spark.sql.functions.col
    val caseGen = Gen.zip(batchGen, Gen.choose(0L, 99L))
    for (((rows, threshold), i) <- samples(caseGen, 4, 21137L).zipWithIndex) {
      val cow = new Warehouse(spark, tmpDir(s"p-pdcow$i"))
      val pos = new Warehouse(spark, tmpDir(s"p-pdpos$i"))
      cow.replace("t", df(rows)); pos.replace("t", df(rows))
      val cond = col("Amount") >= threshold
      cow.deleteWhere("t", cond)
      pos.positionDelete("t", cond)
      def bag(w: Warehouse) = w.load("t").collect().toSeq.map(_.toSeq)
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(bag(pos) == bag(cow), s"case $i diverged with pending position pairs")
      pos.compactDeletes("t")
      assert(bag(pos) == bag(cow), s"case $i diverged after materialization")
    }
  }

  test("property: positionUpdate and updateWhere produce identical content on random inputs") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val caseGen = Gen.zip(batchGen, Gen.choose(0L, 99L))
    for (((rows, threshold), i) <- samples(caseGen, 4, 31137L).zipWithIndex) {
      val cow = new Warehouse(spark, tmpDir(s"p-pucow$i"))
      val mor = new Warehouse(spark, tmpDir(s"p-pumor$i"))
      cow.replace("t", df(rows)); mor.replace("t", df(rows))
      val cond = col("Amount") < threshold
      // old-row semantics on both assignments (Id derives from OLD Amount)
      val set = Map(
        "Id" -> concat_ws("-", col("Id"), col("Amount")),
        "Amount" -> (col("Amount") * 3L + 1L))
      cow.updateWhere("t", cond, set)
      mor.positionUpdate("t", cond, set)
      def bag(w: Warehouse) = w.load("t").collect().toSeq.map(_.toSeq)
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(bag(mor) == bag(cow), s"case $i diverged with pending pairs")
      mor.compactDeletes("t")
      assert(bag(mor) == bag(cow), s"case $i diverged after materialization")
    }
  }

  test("property: results are invariant to shuffle partition count") {
    // The determinism contract every query Scaladoc claims ("reproducible on
    // any cluster size / any retry") checked directly: re-running under a
    // different shuffle.partitions must produce BIT-identical rows. The
    // subset exercises each order-sensitivity class: hash-threshold sampling
    // (q66), greedy prefix fill under a keyed window (q121), bucketed greedy
    // packing (q68), rolling exact median (q111), integer PageRank (q120 —
    // the partition-invariant-arithmetic claim), two-phase salted agg
    // (q105), and the KS drift stat's int64 max (q123).
    val sensitive = Seq("q66_mixture_sample", "q68_packing_plan",
      "q105_salted_agg", "q111_rolling_median", "q120_pagerank2",
      "q121_token_budget_mix", "q123_ks_drift", "q124_pps_sample")
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      sensitive.foreach { name =>
        val fn = SparkEntry.queries(name)
        spark.conf.set("spark.sql.shuffle.partitions", original)
        val base = fn(spark, sf).collect().toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val alt = fn(spark, sf).collect().toSeq
        assert(base == alt,
          s"$name differs between shuffle.partitions=$original and 5")
        assert(base.nonEmpty, s"$name returned no rows — vacuous invariance")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", original)
  }
}
