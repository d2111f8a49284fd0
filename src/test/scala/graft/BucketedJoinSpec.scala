package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.sink.Warehouse

/** Storage-partitioned joins: two tables bucketed on the join key plan their
  * join with ZERO shuffle exchanges — each task zips one bucket's files from
  * both sides — while producing exactly the rows the shuffled plan produces.
  * Also pins the enabling invariant (hive-split writes make every file
  * single-valued on the spec transforms) and the graceful fallbacks.
  */
class BucketedJoinSpec extends SparkSpec {

  /** Count shuffle exchanges in the FINAL (post-AQE) physical plan. */
  private def shuffles(df: DataFrame): Int = {
    df.collect() // force execution so AQE's final plan exists
    def count(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def withSpj[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: SPJ is the subject
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** Count Sort nodes in the FINAL (post-AQE) physical plan. */
  private def sorts(df: DataFrame): Int = {
    df.collect()
    def count(p: SparkPlan): Int = {
      val self = p match {
        case _: org.apache.spark.sql.execution.SortExec => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def freshCatalog(tag: String): (Warehouse, String) = {
    val root = tmpDir(s"graft-spj-$tag")
    spark.conf.set(s"spark.sql.catalog.$tag", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    (new Warehouse(spark, root), tag)
  }

  test("bucketed fact-fact join plans with zero shuffles and matches the shuffled plan") {
    val (wh, cat) = freshCatalog("spjb")
    val orders = spark.range(0, 2000).select(col("id").as("o_id"),
      (col("id") % 97).as("cust"), (col("id") * 3).as("total"))
    val items = spark.range(0, 6000).select((col("id") % 2000).as("o_id"),
      col("id").as("li_id"), (col("id") % 11).as("qty"))
    wh.create("orders", orders.schema, Seq("bucket(8,o_id)"))
    wh.create("items", items.schema, Seq("bucket(8,o_id)"))
    // two appends each: SPJ must group MULTIPLE files per bucket
    wh.append("orders", orders.filter(col("o_id") < 1000))
    wh.append("orders", orders.filter(col("o_id") >= 1000))
    wh.append("items", items.filter(col("li_id") < 3000))
    wh.append("items", items.filter(col("li_id") >= 3000))

    // the write invariant SPJ rests on: every file single-valued per transform
    for (t <- Seq("orders", "items"); f <- wh.currentManifest(t).files) {
      val st = f.stats("bucket(8,o_id)")
      assert(st.min == st.max, s"$t file ${f.path} straddles buckets: $st")
    }

    val q = s"SELECT o.o_id, o.total, i.li_id, i.qty FROM $cat.orders o JOIN $cat.items i ON o.o_id = i.o_id"
    val (spjRows, nShuffles) = withSpj {
      val df = spark.sql(q)
      (df.collect().toSet, shuffles(df))
    }
    assert(nShuffles == 0, s"expected a shuffle-free storage-partitioned join, got $nShuffles exchanges")
    val plain = spark.sql(q).collect().toSet // bucketing conf off: shuffled plan
    assert(spjRows == plain)
    assert(spjRows.size == 6000)
  }

  test("key-sorted bucketed tables join with zero shuffles AND zero sorts (reported ordering)") {
    val (wh, cat) = freshCatalog("spjord")
    val orders = spark.range(0, 2000).select(col("id").as("o_id"), (col("id") * 3).as("total"))
    val items = spark.range(0, 6000).select((col("id") % 2000).as("o_id"), col("id").as("li_id"))
    wh.create("orders", orders.schema, Seq("bucket(8,o_id)"))
    wh.create("items", items.schema, Seq("bucket(8,o_id)"))
    // clusterBy the JOIN key: files land sorted by o_id (the sort marker
    // records it) and the two appends' per-bucket o_id ranges are disjoint,
    // so every group's files chain — the scan reports per-partition
    // ordering and the SMJ plans with NO Sort on either side
    wh.append("orders", orders.filter(col("o_id") < 1000), clusterBy = Seq("o_id"))
    wh.append("orders", orders.filter(col("o_id") >= 1000), clusterBy = Seq("o_id"))
    wh.append("items", items.filter(col("o_id") < 1000), clusterBy = Seq("o_id"))
    wh.append("items", items.filter(col("o_id") >= 1000), clusterBy = Seq("o_id"))
    val q = s"SELECT o.o_id, o.total, i.li_id FROM $cat.orders o JOIN $cat.items i ON o.o_id = i.o_id"
    val (rows, nShuffles, nSorts) = withSpj {
      val df = spark.sql(q)
      (df.collect().toSet, shuffles(df), sorts(df))
    }
    assert(nShuffles == 0, s"expected shuffle-free SPJ, got $nShuffles")
    assert(nSorts == 0, "reported per-partition ordering must remove the SMJ sorts")
    assert(rows == spark.sql(q).collect().toSet)
    assert(rows.size == 6000)

    // OVERLAPPING per-bucket ranges (the original two-append layout) must
    // NOT report ordering: the sorts stay and the answer stays right
    val (wh2, cat2) = freshCatalog("spjord2")
    wh2.create("l", orders.schema, Seq("bucket(8,o_id)"))
    wh2.create("r", items.schema, Seq("bucket(8,o_id)"))
    wh2.append("l", orders, clusterBy = Seq("o_id"))
    wh2.append("l", orders.limit(500), clusterBy = Seq("o_id")) // overlaps everything
    wh2.append("r", items, clusterBy = Seq("o_id"))
    val q2 = s"SELECT l.o_id, r.li_id FROM $cat2.l l JOIN $cat2.r r ON l.o_id = r.o_id"
    val (rows2, nShuffles2, nSorts2) = withSpj {
      val df = spark.sql(q2)
      (df.collect().length, shuffles(df), sorts(df))
    }
    assert(nShuffles2 == 0)
    assert(nSorts2 > 0, "overlapping file ranges must NOT claim ordering")
    assert(rows2 == withSpj(spark.sql(q2).collect().length))
  }

  test("compound-key sorted join: the FULL proven sort prefix drops both SMJ sorts; a boundary tie demotes to the leading key") {
    // join keys (o_id, sub) are a SUPERSET of the partition keys
    // (bucket(o_id)): co-partitioning on the subset is sound (same o_id ⇒
    // same bucket ⇒ same partition) but Spark requires opting out of the
    // all-cluster-keys check
    val coKey = "spark.sql.requireAllClusterKeysForCoPartition"
    val savedCo = spark.conf.getOption(coKey)
    spark.conf.set(coKey, "false")
    try {
    val (wh, cat) = freshCatalog("spjord3")
    // unique o_id per side: the range-cluster's file boundaries then never
    // split one o_id value across files, so every boundary is STRICT (a
    // duplicated key can straddle two files — tuple-sorted, but whole-file
    // per-column stats cannot prove it, the demotion case below)
    val left = spark.range(0, 2000).select(col("id").as("o_id"),
      (col("id") % 7).as("sub"), (col("id") * 3).as("v"))
    val right = spark.range(0, 2000).select(col("id").as("o_id"),
      (col("id") % 7).as("sub"), col("id").as("w"))
    wh.create("l", left.schema, Seq("bucket(8,o_id)"))
    wh.create("r", right.schema, Seq("bucket(8,o_id)"))
    // cluster by BOTH join keys: the marker records the (o_id, sub) id
    // chain, and the appends' per-bucket o_id ranges are STRICTLY disjoint
    // — so the scan proves and reports the whole two-column prefix and the
    // compound-key SMJ plans with NO Sort on either side
    wh.append("l", left.filter(col("o_id") < 1000), clusterBy = Seq("o_id", "sub"))
    wh.append("l", left.filter(col("o_id") >= 1000), clusterBy = Seq("o_id", "sub"))
    wh.append("r", right.filter(col("o_id") < 1000), clusterBy = Seq("o_id", "sub"))
    wh.append("r", right.filter(col("o_id") >= 1000), clusterBy = Seq("o_id", "sub"))
    val q = s"SELECT l.o_id, l.sub, l.v, r.w FROM $cat.l l JOIN $cat.r r " +
      s"ON l.o_id = r.o_id AND l.sub = r.sub"
    val (rows, nShuffles, nSorts) = withSpj {
      val df = spark.sql(q)
      (df.collect().toSet, shuffles(df), sorts(df))
    }
    assert(nShuffles == 0, s"expected shuffle-free SPJ, got $nShuffles")
    assert(nSorts == 0,
      "the full proven (o_id, sub) prefix must remove the compound-key SMJ sorts")
    assert(rows == spark.sql(q).collect().toSet)
    assert(rows.size == 2000)

    // a LEADING-key tie at a file boundary (o_id = 1000 in both appends)
    // leaves the secondary order unproven across the boundary: only the
    // leading column may be reported, so the compound-key SMJ keeps its
    // sorts and the answer stays right
    val (wh2, cat2) = freshCatalog("spjord4")
    wh2.create("l", left.schema, Seq("bucket(8,o_id)"))
    wh2.create("r", right.schema, Seq("bucket(8,o_id)"))
    wh2.append("l", left.filter(col("o_id") <= 1000), clusterBy = Seq("o_id", "sub"))
    wh2.append("l", left.filter(col("o_id") >= 1000), clusterBy = Seq("o_id", "sub"))
    wh2.append("r", right.filter(col("o_id") < 1000), clusterBy = Seq("o_id", "sub"))
    wh2.append("r", right.filter(col("o_id") >= 1000), clusterBy = Seq("o_id", "sub"))
    val q2 = s"SELECT l.o_id, l.sub, l.v, r.w FROM $cat2.l l JOIN $cat2.r r " +
      s"ON l.o_id = r.o_id AND l.sub = r.sub"
    val (rows2, nShuffles2, nSorts2) = withSpj {
      val df = spark.sql(q2)
      (df.collect().length, shuffles(df), sorts(df))
    }
    assert(nShuffles2 == 0)
    assert(nSorts2 > 0, "a boundary tie must not claim the secondary order")
    // the duplicated o_id = 1000 row joins twice per matching right row
    assert(rows2 == withSpj(spark.sql(q2).collect().length))
    } finally savedCo match {
      case Some(v) => spark.conf.set(coKey, v)
      case None    => spark.conf.unset(coKey)
    }
  }

  test("SPJ groups cover every row when one side is missing buckets (pushPartValues)") {
    val (wh, cat) = freshCatalog("spjm")
    val left = spark.range(0, 500).select(col("id").as("k"), col("id").as("v"))
    wh.create("l", left.schema, Seq("bucket(8,k)"))
    wh.create("r", left.schema, Seq("bucket(8,k)"))
    wh.append("l", left)
    wh.append("r", left.filter(col("k") % 16 === 0)) // sparse: some buckets empty on the right
    val q = s"SELECT l.k, r.v FROM $cat.l l JOIN $cat.r r ON l.k = r.k"
    val (rows, n) = withSpj {
      val df = spark.sql(q)
      (df.collect().toSet, shuffles(df))
    }
    assert(n == 0)
    assert(rows == (0 until 500 by 16).map(i => org.apache.spark.sql.Row(i.toLong, i.toLong)).toSet)
  }

  test("identity-partitioned tables co-locate too; mixed specs fall back correctly") {
    val (wh, cat) = freshCatalog("spji")
    val d = spark.range(0, 300).select((col("id") % 5).cast("int").as("g"), col("id").as("v"))
    wh.create("a", d.schema, Seq("g"))
    wh.create("b", d.schema, Seq("g"))
    wh.append("a", d)
    wh.append("b", d)
    val q = s"SELECT a.g, sum(a.v + b.v) AS s FROM $cat.a a JOIN $cat.b b ON a.g = b.g GROUP BY a.g"
    val (rows, n) = withSpj {
      val df = spark.sql(q)
      (df.collect().toSet, shuffles(df))
    }
    // join itself is co-located; the groupBy on g rides the same clustering
    assert(n == 0, s"identity SPJ expected shuffle-free join+agg, got $n")
    assert(rows == spark.sql(q).collect().toSet)

    // one bucketed + one unpartitioned: falls back to a correct shuffled join
    wh.create("plain", d.schema, Nil)
    wh.append("plain", d)
    val qm = s"SELECT a.g, p.v FROM $cat.a a JOIN $cat.plain p ON a.g = p.g"
    val (mixedRows, mixedShuffles) = withSpj {
      val df = spark.sql(qm)
      (df.collect().length, shuffles(df))
    }
    assert(mixedShuffles > 0)
    assert(mixedRows == spark.sql(qm).collect().length)
  }

  test("bucket counts must match: bucket(8) vs bucket(4) does not co-locate, stays correct") {
    val (wh, cat) = freshCatalog("spjx")
    val d = spark.range(0, 400).select(col("id").as("k"), col("id").as("v"))
    wh.create("b8", d.schema, Seq("bucket(8,k)"))
    wh.create("b4", d.schema, Seq("bucket(4,k)"))
    wh.append("b8", d)
    wh.append("b4", d)
    val q = s"SELECT x.k FROM $cat.b8 x JOIN $cat.b4 y ON x.k = y.k"
    val (cnt, n) = withSpj {
      val df = spark.sql(q)
      (df.collect().length, shuffles(df))
    }
    assert(n > 0, "mismatched bucket counts must NOT claim co-partitioning")
    assert(cnt == 400)
  }

  test("multi-way SPJ: a three-table co-partitioned join chain plans zero shuffles") {
    val (wh, cat) = freshCatalog("spj3")
    val d = spark.range(0, 400).select(col("id").as("k"), col("id").as("v"))
    for (t <- Seq("x", "y", "z")) {
      wh.create(t, d.schema, Seq("bucket(8,k)"))
      wh.append(t, d)
    }
    val q = s"""SELECT x.k, x.v + y.v + z.v AS s
               |FROM $cat.x x JOIN $cat.y y ON x.k = y.k JOIN $cat.z z ON y.k = z.k""".stripMargin
    val (rows, n) = withSpj {
      val df = spark.sql(q)
      (df.collect(), shuffles(df))
    }
    assert(n == 0, s"three-way co-partitioned chain expected shuffle-free, got $n")
    assert(rows.length == 400)
    assert(rows.map(r => r.getLong(1)).sum == (0L until 400L).map(_ * 3).sum)
  }

  test("static manifest pruning composes with SPJ: filtered side still co-locates") {
    // ManifestPruneRule (active in this extensions-registered session) swaps
    // the filtered relation for a pruned-manifest table; SpjSupport must
    // recompute eligibility on the SURVIVING files and the join still plans
    // shuffle-free (pushPartValues covers the now-missing buckets)
    val (wh, cat) = freshCatalog("spjp")
    val d = spark.range(0, 600).select(col("id").as("k"), col("id").as("v"))
    wh.create("a", d.schema, Seq("bucket(8,k)"))
    wh.create("b", d.schema, Seq("bucket(8,k)"))
    wh.append("a", d)
    wh.append("b", d)
    // k = 5 statically prunes side a to one bucket's files (bucket equality
    // projection); the join then zips that bucket against b's matching group
    val q = s"SELECT a.k, b.v FROM $cat.a a JOIN $cat.b b ON a.k = b.k WHERE a.k = 5"
    val (rows, n) = withSpj {
      val df = spark.sql(q)
      (df.collect().toSeq, shuffles(df))
    }
    assert(rows == Seq(org.apache.spark.sql.Row(5L, 5L)))
    assert(n == 0, s"pruned-side SPJ expected shuffle-free, got $n")
  }

  test("shuffle-one-side: bucketed x plain join shuffles ONLY the plain side") {
    val (wh, cat) = freshCatalog("spjo")
    val d = spark.range(0, 800).select(col("id").as("k"), col("id").as("v"))
    wh.create("fact", d.schema, Seq("bucket(8,k)"))
    wh.create("dim", d.schema, Nil)
    wh.append("fact", d)
    wh.append("dim", d.filter(col("k") % 3 === 0))
    val q = s"SELECT f.k, m.v FROM $cat.fact f JOIN $cat.dim m ON f.k = m.k"
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.shuffle.enabled")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      val (rows, n) = withSpj {
        val df = spark.sql(q)
        (df.collect().toSet, shuffles(df))
      }
      // one exchange: the dim hashes into the fact's bucket partitioning via
      // the catalog's bucket function; the fact side reads in place
      assert(n == 1, s"expected exactly the dim-side shuffle, got $n")
      assert(rows == d.filter(col("k") % 3 === 0).collect()
        .map(r => org.apache.spark.sql.Row(r.getLong(0), r.getLong(1))).toSet)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", v)
      case None    => spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("aggregation on the bucket key runs shuffle-free over a bucketed table") {
    val (wh, cat) = freshCatalog("spja")
    val d = spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
    wh.create("t", d.schema, Seq("bucket(8,k)"))
    wh.append("t", d)
    val q = s"SELECT k, sum(v) AS s FROM $cat.t GROUP BY k"
    val (cnt, n) = withSpj {
      val df = spark.sql(q)
      (df.collect().length, shuffles(df))
    }
    assert(cnt == 1000)
    assert(n == 0, s"bucket clustering should satisfy the groupBy distribution, got $n shuffles")
  }

  test("truncate specs never claim co-partitioning (width is uncomparable across sides)") {
    // Spark's SPJ check compares bound functions by canonical name (+ count
    // for bucket only); a truncate WIDTH mismatch has no comparison channel,
    // so reporting truncate clustering would zip truncate(2) against
    // truncate(4) groups and silently drop rows — SpjSupport must refuse
    val (wh, cat) = freshCatalog("spjt")
    val d = spark.range(0, 300).select(concat(lit("k"), lpad(col("id").cast("string"), 4, "0")).as("s"),
      col("id").as("v"))
    wh.create("t2", d.schema, Seq("truncate(2,s)"))
    wh.create("t4", d.schema, Seq("truncate(4,s)"))
    wh.append("t2", d)
    wh.append("t4", d)
    val q = s"SELECT a.s FROM $cat.t2 a JOIN $cat.t4 b ON a.s = b.s"
    val (cnt, n) = withSpj {
      val df = spark.sql(q)
      (df.collect().length, shuffles(df))
    }
    assert(n > 0, "truncate-partitioned tables must fall back to a shuffled join")
    assert(cnt == 300)
  }

  test("V2 transform functions agree with the write-side column expressions") {
    import graft.sink.PartitionTransforms
    // evaluate through SQL so resolution exercises the same FunctionCatalog
    // path the planner uses
    spark.conf.set("spark.sql.catalog.spjf", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjf.root", tmpDir("graft-spjf"))
    val rows = spark.range(-50, 50)
      .select(col("id"),
        concat(lit("k"), col("id")).as("s"),
        timestamp_micros(col("id") * 7230000001L).as("ts"))
    rows.createOrReplaceTempView("spjf_in")
    val fdf = spark.sql(
      """SELECT spjf.bucket(8, id) AS b_id, spjf.bucket(16, s) AS b_s,
        |       spjf.truncate(10, id) AS t_id, spjf.truncate(2, s) AS t_s,
        |       spjf.days(ts) AS d, spjf.hours(ts) AS h,
        |       spjf.years(ts) AS y, spjf.months(ts) AS m
        |FROM spjf_in""".stripMargin)
    def expr(spec: String, dt: org.apache.spark.sql.types.DataType) =
      PartitionTransforms.exprAndKind(PartitionTransforms.parse(spec).get, dt).get._1
    import org.apache.spark.sql.types._
    val edf = rows.select(
      expr("bucket(8,id)", LongType).as("b_id"), expr("bucket(16,s)", StringType).as("b_s"),
      expr("truncate(10,id)", LongType).as("t_id"), expr("truncate(2,s)", StringType).as("t_s"),
      expr("days(ts)", TimestampType).as("d"), expr("hours(ts)", TimestampType).as("h"),
      expr("years(ts)", TimestampType).as("y"), expr("months(ts)", TimestampType).as("m"))
    val f = fdf.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val e = edf.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(f == e)
  }
}
