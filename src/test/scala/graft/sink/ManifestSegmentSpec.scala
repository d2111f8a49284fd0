package graft.sink

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.{SparkSpec, TestSpark}

/** The segmented (v2) manifest store — the Iceberg manifest-list analog.
  *
  * The claims under test: (1) a commit's metadata write is O(its delta),
  * not O(the table's file count) — the root carries prior segments by
  * reference; (2) reading a segmented manifest yields EXACTLY the flat
  * manifest the committer handed in, across arbitrary add/remove/change
  * histories (property-tested on generated manifests with adversarial
  * paths/stats); (3) flat v1 manifests stay readable and auto-upgrade on
  * the next commit; (4) expiry retains segments shared with kept roots,
  * drops segments only dropped roots referenced, and grace-sweeps orphans;
  * (5) the segment/tombstone budget forces coalescing, so roots can't grow
  * without bound.
  */
class ManifestSegmentSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(StructField("x", LongType)))
  private def df(n: Long, from: Long = 0L) = TestSpark.spark.createDataFrame(
    (from until from + n).map(Row(_)).asJava, schema)

  // ------------------------------------------------ generators --

  // adversarial strings: framing characters, unicode, empties
  private val nastyStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)), Gen.const(""), Gen.const("a\tb:c,d e"),
    Gen.const("naïve—文字\n⊥"), Gen.const("::"), Gen.const(" leading"))

  private val statGen: Gen[(String, ColStat)] = for {
    col <- Gen.oneOf(Gen.oneOf("x", "y", "__graft_p0"), nastyStr)
    kind <- Gen.oneOf("s", "n", "z")
    mn <- nastyStr; mx <- nastyStr
  } yield col -> (if (kind == "z") ColStat("z", "", "") else ColStat(kind, mn, mx))

  private def fileGen(path: String): Gen[DataFile] = for {
    rows <- Gen.choose(0L, 1000000L)
    nstats <- Gen.choose(0, 3)
    stats <- Gen.listOfN(nstats, statGen)
    seq <- Gen.choose(0L, 50L)
  } yield DataFile(path, rows, stats.toMap, seq)

  private def delGen(path: String): Gen[DeleteFile] = for {
    rows <- Gen.choose(0L, 1000L)
    seq <- Gen.choose(0L, 50L)
    // real delete-key columns are never empty-named (schema columns)
    cols <- Gen.listOf(Gen.oneOf("k", "a\tb:c,d e", "naïve—文字", "::", " leading"))
      .map(_.take(2))
    nstats <- Gen.choose(0, 2)
    stats <- Gen.listOfN(nstats, statGen)
    kind <- Gen.oneOf("eq", "dv")
  } yield DeleteFile(path, rows, seq, cols, stats.toMap, kind)

  /** Evolve `prev` into a random successor: drop some entries, mutate some
    * in place (seq restamp / stats change), add some fresh ones — the union
    * of every commit shape's effect on the entry lists.
    */
  private def successorGen(prev: Manifest, round: Int): Gen[Manifest] = for {
    keepMask <- Gen.listOfN(prev.files.size, Gen.prob(0.8))
    mutMask <- Gen.listOfN(prev.files.size, Gen.prob(0.15))
    kept = prev.files.zip(keepMask).collect { case (f, true) => f }
    mutated = kept.zip(mutMask).map {
      case (f, true) => f.copy(seq = f.seq + 1)
      case (f, _)    => f
    }
    nAdd <- Gen.choose(0, 4)
    added <- Gen.sequence[Seq[DataFile], DataFile](
      (0 until nAdd).map(i => fileGen(s"d$round/f$i-${round * 1000 + i}.parquet")))
    keepDel <- Gen.listOfN(prev.deletes.size, Gen.prob(0.7))
    keptDels = prev.deletes.zip(keepDel).collect { case (d, true) => d }
    nDel <- Gen.choose(0, 2)
    addedDels <- Gen.sequence[Seq[DeleteFile], DeleteFile](
      (0 until nDel).map(i => delGen(s"del$round/k$i.parquet")))
  } yield Manifest(prev.schema, mutated ++ added, keptDels ++ addedDels)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def asSets(m: Manifest) = (m.schema, m.files.toSet, m.deletes.toSet)

  // ------------------------------------------------ properties --

  test("property: 25-commit random histories round-trip bit-exactly through the segmented store") {
    (1 to 4).foreach { run =>
      val dir = Paths.get(tmpDir(s"seg-prop$run"))
      def path(v: Int) = dir.resolve(s"m$v.manifest")
      var prev = Manifest(schema, Nil, Nil)
      Manifest.writeDelta(path(0), prev, None)
      assert(asSets(Manifest.read(path(0))) == asSets(prev))
      (1 to 25).foreach { v =>
        val next = sample(successorGen(prev, v), run * 1000L + v)
        Manifest.writeDelta(path(v), next, Some(path(v - 1)))
        val got = Manifest.read(path(v))
        assert(asSets(got) == asSets(next), s"run=$run v=$v mismatch")
        // prior snapshots stay intact (segments are immutable + shared)
        assert(asSets(Manifest.read(path(v - 1))) == asSets(prev),
          s"run=$run v=$v damaged its base")
        prev = next
      }
      // roots never exceed the segment budget
      val segs = Manifest.segmentRefs(path(25))
      assert(segs.size <= 65, s"root grew unbounded: ${segs.size} segments")
    }
  }

  test("commit metadata is O(delta): late appends to a wide table write small roots + batch-sized segments") {
    val root = tmpDir("seg-odelta")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 30).foreach(i => wh.append("t", df(4, i * 10), statsCols = Seq("x")))
    val td = Paths.get(root, "t")
    val v = wh.currentVersion("t")
    val prevSegs = Manifest.segmentRefs(td.resolve(s"m${v - 1}.manifest")).toSet
    val curSegs = Manifest.segmentRefs(td.resolve(s"m$v.manifest"))
    // the last commit carried every prior segment by REFERENCE and added
    // exactly one new one...
    val fresh = curSegs.filterNot(prevSegs)
    assert(fresh.size == 1, s"expected one fresh segment, got $fresh")
    // ...whose entries are just that batch, not the table
    val segLines = Files.readAllLines(td.resolve(fresh.head)).size() - 1
    val manifest = wh.currentManifest("t")
    assert(segLines < manifest.files.size / 4,
      s"delta segment has $segLines entries for a ${manifest.files.size}-file table")
    // and the root itself is line-bounded by commit count, not file count
    val rootLines = Files.readAllLines(td.resolve(s"m$v.manifest")).size()
    assert(rootLines <= v + 3, s"root has $rootLines lines after $v commits")
    assert(wh.load("t").count() == 30L * 4)
  }

  test("flat v1 manifests stay readable and auto-upgrade on the next commit") {
    val root = tmpDir("seg-v1compat")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(5), statsCols = Seq("x"))
    // rewrite the current snapshot in legacy FLAT form (a pre-segment table)
    val td = Paths.get(root, "t")
    val m1 = wh.currentManifest("t")
    Files.delete(td.resolve("m1.manifest"))
    Manifest.write(td.resolve("m1.manifest"), m1)
    assert(Manifest.segmentRefs(td.resolve("m1.manifest")).isEmpty)
    assert(asSets(wh.currentManifest("t")) == asSets(m1))
    // next commit lifts the flat base into a segment and deltas on top
    wh.append("t", df(3, 100), statsCols = Seq("x"))
    val segs = Manifest.segmentRefs(td.resolve("m2.manifest"))
    assert(segs.nonEmpty, "v2 root expected after committing over a flat base")
    assert(wh.load("t").count() == 8)
    assert(asSets(wh.manifestAt("t", 1)) == asSets(m1), "flat base still readable")
  }

  test("expiry: shared segments survive, dropped-only segments go, orphans sweep after grace") {
    val root = tmpDir("seg-expiry")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 6).foreach(i => wh.append("t", df(2, i * 10), statsCols = Seq("x")))
    val td = Paths.get(root, "t")
    val head = wh.currentVersion("t")
    val keptRootSegs = Manifest.segmentRefs(td.resolve(s"m$head.manifest")).toSet
    // stray segments: one stale (out-aged grace), one fresh (in-flight writer)
    val stale = td.resolve("gdeadbeefdeadbeef.seg")
    Files.writeString(stale, "graft-seg v1\n")
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000L))
    val fresh = td.resolve("gfreshfreshfresh0.seg")
    Files.writeString(fresh, "graft-seg v1\n")
    wh.expireSnapshots("t", keepLast = 2)
    // the head root's segments all survive — INCLUDING ones first written by
    // now-dropped commits (shared by reference)
    keptRootSegs.foreach(s => assert(Files.exists(td.resolve(s)), s"lost live segment $s"))
    assert(!Files.exists(stale), "stale orphan segment not swept")
    assert(Files.exists(fresh), "grace-aged sweep deleted an in-flight segment")
    assert(wh.load("t").count() == 12)
    // every surviving g*.seg is referenced by some kept root
    val keptVersions = wh.history("t")
    val live = keptVersions.flatMap(v =>
      Manifest.segmentRefs(td.resolve(s"m$v.manifest"))).toSet
    val onDisk = {
      val s = Files.list(td)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("g") && n.endsWith(".seg")).toSet
      finally s.close()
    }
    assert((onDisk -- live) == Set("gfreshfreshfresh0.seg"),
      s"unreferenced segments left behind: ${onDisk -- live}")
  }

  test("coalesce: segment budget caps the root; content intact after compaction of the metadata") {
    val root = tmpDir("seg-coalesce")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 80).foreach(i => wh.append("t", df(1, i), statsCols = Seq("x")))
    val td = Paths.get(root, "t")
    val v = wh.currentVersion("t")
    val segs = Manifest.segmentRefs(td.resolve(s"m$v.manifest"))
    assert(segs.size <= 65, s"root exceeded the segment budget: ${segs.size}")
    assert(segs.size >= 1)
    assert(wh.load("t").count() == 80)
    assert(wh.load("t").agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0) ==
      (0L until 80L).sum)
  }

  test("unknown delete-file kinds refuse loudly at parse, never misapply as equality deletes") {
    // a manifest written by an incompatible build (e.g. the pre-DV 'pos'
    // pair-file form, cols = Nil) must fail at READ with the migration
    // spelled out — treated as an equality delete it would anti-join on an
    // EMPTY column list and fail analysis or drop every row
    val dir = Paths.get(tmpDir("seg-kind"))
    val p = dir.resolve("m3.manifest")
    Files.writeString(p,
      "graft-manifest v1\n" + schema.json + "\n" +
        "d1/f.parquet\t4\t\t1\n" +
        "D\tpdel3/p.parquet\t2\t3\t\t\tpos\n")
    val ex = intercept[IllegalArgumentException] { Manifest.read(p) }
    assert(ex.getMessage.contains("pos") && ex.getMessage.contains("compactDeletes"),
      ex.getMessage)
    // known kinds still parse (defaulted 'eq' for pre-kind lines included)
    Files.writeString(p,
      "graft-manifest v1\n" + schema.json + "\n" +
        "D\tdel1/k.parquet\t2\t1\t" + java.util.Base64.getEncoder.encodeToString(
          "x".getBytes("UTF-8")) + "\t\n" +
        "D\tdv2\t1\t2\t\t\tdv\n")
    val m = Manifest.read(p)
    assert(m.deletes.map(_.kind).sorted == Seq("dv", "eq"))
  }

  test("readPruned: summary-disjoint segments are never parsed; tombstones always apply") {
    val dir = Paths.get(tmpDir("seg-pruned"))
    def path(v: Int) = dir.resolve(s"m$v.manifest")
    def file(p: String, lo: Long, hi: Long) =
      DataFile(p, hi - lo + 1, Map("x" -> ColStat("n", lo.toString, hi.toString, 0L)))
    // 3 commits, disjoint x-ranges: [0,9], [100,109], [200,209]
    val m0 = Manifest(schema, Seq(file("a/f0.parquet", 0, 9)))
    val m1 = Manifest(schema, m0.files :+ file("b/f1.parquet", 100, 109))
    val m2 = Manifest(schema, m1.files :+ file("c/f2.parquet", 200, 209))
    Manifest.writeDelta(path(0), m0, None)
    Manifest.writeDelta(path(1), m1, Some(path(0)))
    Manifest.writeDelta(path(2), m2, Some(path(1)))
    def keepEq(v: Long): SegSummary => Boolean = s =>
      s.stats.get("x").forall(st => StatsPruning.mayMatch(st, "=", "n", v.toString))
    val c0 = Manifest.prunedSegConsults.get()
    val (pruned, skipped) = Manifest.readPruned(path(2), keepEq(105L)).get
    assert(pruned.files.map(_.path) == Seq("b/f1.parquet"), pruned.files.toString)
    assert(skipped == 2)
    assert(Manifest.prunedSegConsults.get() - c0 == 1,
      "exactly ONE segment may be parsed for a one-range probe")
    // a CHANGED entry (tombstone + re-add in a later segment): the stale
    // version must never leak out of an earlier parsed segment
    val m3 = Manifest(schema, Seq(file("a/f0.parquet", 1000, 1009),
      file("b/f1.parquet", 100, 109), file("c/f2.parquet", 200, 209)))
    Manifest.writeDelta(path(3), m3, Some(path(2)))
    val (p3, _) = Manifest.readPruned(path(3), keepEq(5L)).get
    assert(p3.files.isEmpty, s"stale pre-change version leaked: ${p3.files}")
    val (p3b, _) = Manifest.readPruned(path(3), keepEq(1005L)).get
    assert(p3b.files.map(_.path) == Seq("a/f0.parquet"))
    assert(p3b.files.head.stats("x").min == "1000")
    // DELETE-AWARE skipping: a delete-only segment whose merged key bounds
    // the query refutes is skipped WITH its delete entry — any row that
    // delete would have removed carries x=9999 and the query's residual
    // filter (x=105) rejects it anyway
    val del = DeleteFile("d/k0.parquet", 2, 4, Seq("x"),
      Map("x" -> ColStat("n", "9999", "9999")), "eq")
    val m4 = Manifest(schema, m3.files, Seq(del))
    Manifest.writeDelta(path(4), m4, Some(path(3)))
    val (p4, _) = Manifest.readPruned(path(4), keepEq(105L)).get
    assert(p4.deletes.isEmpty,
      s"query-invisible delete segment must skip: ${p4.deletes}")
    assert(p4.files.map(_.path) == Seq("b/f1.parquet"))
    // the delete's own key range keeps its segment (and the delete)
    val (p4b, _) = Manifest.readPruned(path(4), keepEq(9999L)).get
    assert(p4b.deletes.map(_.path) == Seq("d/k0.parquet"))
    // a deletion vector has no value bounds: its segment never skips
    val dv = DeleteFile("d/vec0", 1, 5, Seq("a/f0.parquet"), Map.empty, "dv")
    val m5 = Manifest(schema, m3.files, Seq(del, dv))
    Manifest.writeDelta(path(5), m5, Some(path(4)))
    val (p5, _) = Manifest.readPruned(path(5), keepEq(105L)).get
    assert(p5.deletes.map(_.path).toSet == Set("d/vec0"),
      s"dv segment unskippable, refuted eq segment skipped: ${p5.deletes}")
  }

  test("property: readPruned plans the BIT-IDENTICAL surviving file set as the full parse") {
    // for any history and any conservative per-file predicate P:
    //   {f ∈ readPruned(K).files : P(f)} == {f ∈ read().files : P(f)}
    // where K is P lifted to the segment summary — i.e. segment skipping
    // never changes what a per-file prune would plan, it only avoids
    // parsing entries the per-file pass would discard anyway
    def perFile(stats: Map[String, ColStat], v: String): Boolean =
      stats.get("x").forall(st =>
        scala.util.Try(StatsPruning.mayMatch(st, "=", "n", v)).getOrElse(true))
    (1 to 3).foreach { run =>
      val dir = Paths.get(tmpDir(s"seg-prunedprop$run"))
      def path(v: Int) = dir.resolve(s"m$v.manifest")
      var prev = Manifest(schema, Nil, Nil)
      Manifest.writeDelta(path(0), prev, None)
      (1 to 15).foreach { v =>
        val next = sample(successorGen(prev, v), run * 777L + v)
        Manifest.writeDelta(path(v), next, Some(path(v - 1)))
        val full = Manifest.read(path(v))
        for (probe <- Seq("0", "500000", "999999")) {
          val (pruned, _) = Manifest.readPruned(path(v),
            s => perFile(s.stats, probe)).get
          assert(pruned.files.filter(f => perFile(f.stats, probe)).toSet ==
            full.files.filter(f => perFile(f.stats, probe)).toSet,
            s"run=$run v=$v probe=$probe planned sets diverge")
          // deletes: never invented, and every DROPPED delete is provably
          // invisible — an eq delete whose OWN x bounds refute the probe
          // (covering merged bounds refuted ⇒ each file's tighter bounds
          // refuted), so no row it would remove can pass the query filter
          assert(pruned.deletes.toSet.subsetOf(full.deletes.toSet),
            s"run=$run v=$v probe=$probe invented deletes")
          val dropped = full.deletes.toSet -- pruned.deletes.toSet
          assert(dropped.forall(d => d.kind == "eq" &&
            d.stats.get("x").exists(st =>
              !scala.util.Try(StatsPruning.mayMatch(st, "=", "n", probe))
                .getOrElse(true))),
            s"run=$run v=$v probe=$probe unsound delete drop: $dropped")
        }
        prev = next
      }
    }
  }

  test("root header: schema + row hwm + delete count without replaying entries") {
    val root = tmpDir("seg-header")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(4), statsCols = Seq("x"))
    val td = Paths.get(root, "t")
    val h1 = Manifest.readHeader(td.resolve("m1.manifest"))
    assert(h1.schema.fieldNames.toSeq == Seq("x"))
    assert(h1.deleteCount == 0)
    assert(h1.rowHwm == 4L)
    wh.equalityDelete("t", spark.createDataFrame(Seq(Row(1L)).asJava, schema))
    val h2 = wh.manifestHeader("t")
    assert(h2.deleteCount == 1, "pending delete entry must show in the header")
    wh.compactDeletes("t")
    assert(wh.manifestHeader("t").deleteCount == 0)
    // pre-extras manifests read as unknown (-1), never as "no deletes"
    val legacy = td.resolve("mleg.manifest")
    Files.writeString(legacy, "graft-manifest v1\n" + schema.json + "\n")
    assert(Manifest.readHeader(legacy).deleteCount == -1)
  }

  test("chunked coalesce: a compacted manifest stays prunable at segment grain") {
    val dir = Paths.get(tmpDir("seg-chunk"))
    val p = dir.resolve("m0.manifest")
    // 10k files in value order — a coalesce must chunk, not mega-segment
    val files = (0 until 10000).map { i =>
      DataFile(f"d/f$i%05d.parquet", 10,
        Map("x" -> ColStat("n", (i * 10).toString, (i * 10 + 9).toString, 0L)))
    }
    Manifest.writeDelta(p, Manifest(schema, files), None)
    val segs = Manifest.segmentRefs(p)
    assert(segs.size == 3, s"10k entries at 4096/chunk should land as 3 segments: ${segs.size}")
    assert(asSets(Manifest.read(p)) == asSets(Manifest(schema, files)))
    val c0 = Manifest.prunedSegConsults.get()
    val (pruned, skipped) = Manifest.readPruned(p, s =>
      s.stats.get("x").forall(st => StatsPruning.mayMatch(st, "=", "n", "50005"))).get
    assert(pruned.files.size == 4096, "one chunk's entries materialize")
    assert(pruned.files.filter(f =>
      StatsPruning.mayMatch(f.stats("x"), "=", "n", "50005"))
      .map(_.path) == Seq("d/f05000.parquet"))
    assert(skipped == 2 && Manifest.prunedSegConsults.get() - c0 == 1,
      "a point probe over a coalesced table must parse exactly one chunk")
  }

  test("rename (all-entries-changed commit) coalesces; stats keys remapped in the segment") {
    val root = tmpDir("seg-rename")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 5).foreach(i => wh.append("t", df(2, i * 10), statsCols = Seq("x")))
    wh.renameColumn("t", "x", "y")
    val m = wh.currentManifest("t")
    assert(m.files.forall(f => f.stats.contains("y") && !f.stats.contains("x")))
    val td = Paths.get(root, "t")
    val segs = Manifest.segmentRefs(td.resolve(s"m${wh.currentVersion("t")}.manifest"))
    assert(segs.size == 1, s"rename should coalesce to one segment, got ${segs.size}")
    assert(wh.load("t").columns.toSeq == Seq("y"))
    assert(wh.load("t").count() == 10)
  }
}
