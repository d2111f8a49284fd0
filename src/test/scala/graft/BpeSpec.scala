package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.functions.BpeTrainer

/** BPE training contract, checked against an independent in-memory
  * reference implementation of the classic algorithm (overlapping counts at
  * selection, greedy non-overlapping application, count-then-lexicographic
  * tie-break): the distributed trainer must reproduce the exact merge
  * sequence AND the exact re-segmented corpus, under any partitioning.
  */
class BpeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // ---- reference implementation (plain Scala, sequential) ----------------
  private def refPairCounts(seqs: Seq[Vector[String]]): Map[(String, String), Long] =
    seqs.flatMap(s => s.sliding(2).collect { case Seq(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refApply(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(seqs0: Seq[Vector[String]], n: Int, minCount: Long = 2L)
    : (Seq[(String, String, Long)], Seq[Vector[String]]) = {
    var seqs = seqs0
    val merges = Seq.newBuilder[(String, String, Long)]
    var stop = false
    var r = 0
    while (r < n && !stop) {
      val pc = refPairCounts(seqs)
      if (pc.isEmpty) stop = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minCount) stop = true
        else { merges += ((a, b, cnt)); seqs = seqs.map(refApply(_, a, b)); r += 1 }
      }
    }
    (merges.result(), seqs)
  }

  // ---- fixtures -----------------------------------------------------------
  private val corpus: Seq[(Long, Vector[String])] = Seq(
    1L -> "l o w e r".split(" ").toVector,
    2L -> "l o w e s t".split(" ").toVector,
    3L -> "n e w e r".split(" ").toVector,
    4L -> "w i d e r".split(" ").toVector,
    5L -> "l o w".split(" ").toVector,
    6L -> "n e w".split(" ").toVector)

  private def df(rows: Seq[(Long, Vector[String])], parts: Int = 1) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("seq", ArrayType(StringType))))
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)
      .repartition(parts)
  }

  private def collectSeqs(res: BpeTrainer.Result): Map[Long, Vector[String]] =
    res.sequences.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap

  test("merge sequence and re-segmented corpus match the reference exactly") {
    val (refMerges, refSeqs) = refTrain(corpus.map(_._2), 8)
    assert(refMerges.nonEmpty, "fixture must actually train")
    val res = BpeTrainer.train(df(corpus), "seq", 8)
    assert(res.merges.map(m => (m.left, m.right, m.count)) == refMerges)
    val got = collectSeqs(res)
    corpus.foreach { case (id, s0) =>
      assert(got(id) == refSeqs(corpus.indexWhere(_._1 == id)),
        s"doc $id segmented differently")
    }
  }

  test("deterministic under partitioning (7-way vs 1-way)") {
    val r1 = BpeTrainer.train(df(corpus, 1), "seq", 6)
    val r7 = BpeTrainer.train(df(corpus, 7), "seq", 6)
    assert(r1.merges == r7.merges)
    assert(collectSeqs(r1) == collectSeqs(r7))
  }

  test("greedy non-overlap: 'a a a' under (a,a) becomes [aa, a]") {
    val rows = Seq(1L -> Vector("a", "a", "a"), 2L -> Vector("a", "a", "a", "a"))
    val res = BpeTrainer.train(df(rows), "seq", 1, minCount = 1L)
    assert(res.merges.map(m => (m.left, m.right)) == Seq(("a", "a")))
    // selection counted overlapping pairs: 2 + 3 = 5
    assert(res.merges.head.count == 5L)
    val got = collectSeqs(res)
    assert(got(1L) == Vector("aa", "a"))
    assert(got(2L) == Vector("aa", "aa"))
  }

  test("stops early when nothing reaches minCount; short rows untouched") {
    val rows = Seq(1L -> Vector("x", "y"), 2L -> Vector("z"), 3L -> Vector.empty[String])
    val res = BpeTrainer.train(df(rows), "seq", 5, minCount = 2L)
    assert(res.merges.isEmpty, "every pair is unique")
    val got = collectSeqs(res)
    assert(got(1L) == Vector("x", "y") && got(2L) == Vector("z") &&
      got(3L) == Vector.empty[String])
  }

  // ---- encode (corpus-scale apply of a trained merge list) ---------------

  test("encode round-trips the trained vocabulary: sequences reproduced exactly") {
    import org.apache.spark.sql.functions._
    val res = BpeTrainer.train(df(corpus), "seq", 8)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("words", ArrayType(StringType))))
    val words = spark.createDataFrame(
      corpus.map { case (id, s) => Row(id, Seq(s.mkString)) }.asJava, schema)
      .repartition(5)
    val got = words
      .select(col("doc_id"), BpeTrainer.encode(spark, col("words"), res.merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val want = collectSeqs(res)
    corpus.foreach { case (id, _) => assert(got(id) == want(id), s"doc $id") }
  }

  test("encodeWord equals the sequential reference under the frozen table") {
    import graft.functions.expressions.BpeCodec
    import graft.functions.BpeMerges
    val codec = new BpeCodec(BpeMerges.frozen.map { case (a, b) => Array(a, b) }.toArray)
    val words = Seq("order", "window", "scan", "querying", "a", "zzz",
      "sortorder", "columnvector", "aggregate", "x9y", "partpart")
    words.foreach { w =>
      val ref = BpeMerges.frozen.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => refApply(s, a, b) }
      val got = codec.encodeWord(w).map(_.toString).toVector
      assert(got == ref, s"'$w': got $got want $ref")
    }
  }

  test("encode: multi-word rows concatenate in order; null words are skipped") {
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.BpeFns
    BpeFns.register(spark)
    val d = spark.range(1)
      .select(array(lit("low"), lit(null).cast("string"), lit("newer")).as("ws"),
        array().cast("array<string>").as("empty"))
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val row = d.select(
      BpeFns.bpeEncodeNative(col("ws"), merges).as("t1"),
      BpeFns.bpeEncodeNative(col("empty"), merges).as("t2")).head()
    assert(row.getSeq[String](0) == Seq("low", "n", "e", "w", "er"))
    assert(row.getSeq[String](1) == Seq.empty[String])
  }

  // ---- byte-level mode (GPT-2-style UTF-8 byte seeding) ------------------

  test("byte-level base vocabulary: bijective remap, any string round-trips") {
    import graft.functions.expressions.BpeCodec
    assert(BpeCodec.ByteToChar.distinct.length == 256, "remap must be bijective")
    assert(BpeCodec.ByteToChar.forall(_.length == 1))
    // printable ASCII keeps itself; space/control/non-ASCII bytes shift
    assert(BpeCodec.ByteToChar('a'.toInt) == "a" && BpeCodec.ByteToChar(33) == "!")
    assert(BpeCodec.ByteToChar(32).charAt(0) >= 256.toChar)
    for (w <- Seq("café", "naïve", "日本語", "𝄞 clef", "tab\tand space", "",
                  "mixed ascii + ünïcödé"))
      assert(BpeCodec.decodeByteSymbols(BpeCodec.byteSymbolsOf(w).toSeq) == w,
        s"round-trip failed for '$w'")
  }

  test("byte-level train -> encode round-trip is bit-equal on non-ASCII text") {
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.BpeCodec
    // words with multi-byte characters: byte-level seeds differ from code
    // points (é is two symbols, 𝄞 four), and merges learn across them
    val wordsRaw = Seq(1L -> "héllo", 2L -> "héllohé", 3L -> "h𝄞llo",
      4L -> "héll", 5L -> "hello", 6L -> "héhé")
    val seeded = wordsRaw.map { case (id, w) => id -> BpeCodec.byteSymbolsOf(w).toVector }
    val res = BpeTrainer.train(df(seeded), "seq", 6, minCount = 2L)
    assert(res.merges.nonEmpty, "fixture must actually train")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("words", ArrayType(StringType))))
    val raw = spark.createDataFrame(
      wordsRaw.map { case (id, w) => Row(id, Seq(w)) }.asJava, schema).repartition(3)
    val got = raw.select(col("doc_id"),
        BpeTrainer.encode(spark, col("words"), res.merges, byteLevel = true).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val want = collectSeqs(res)
    wordsRaw.foreach { case (id, w) =>
      assert(got(id) == want(id), s"doc $id")
      // and every token stream decodes back to the original word exactly
      assert(BpeCodec.decodeByteSymbols(got(id)) == w, s"doc $id decode")
    }
  }

  test("byte-level == code-point seeding on the [a-z0-9] word universe (q129's)") {
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.BpeFns
    import graft.functions.BpeMerges
    BpeFns.register(spark)
    // every byte of [a-z0-9]+ is in the printable keep range, so the two
    // modes must agree symbol for symbol — the property that lets q129's
    // char-level oracle adjudicate the byte-level mode on ASCII corpora
    val d = spark.range(1).select(array(
      lit("order"), lit("querying"), lit("x9y"), lit("partpart")).as("ws"))
    val row = d.select(
      BpeFns.bpeEncodeNative(col("ws"), BpeMerges.frozen).as("chars"),
      BpeFns.bpeEncodeNative(col("ws"), BpeMerges.frozen, byteLevel = true).as("bytes"))
      .head()
    assert(row.getSeq[String](0) == row.getSeq[String](1))
  }

  test("byte-level != code-point seeding on multi-byte characters (q136's universe)") {
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.{BpeCodec, BpeFns}
    import graft.functions.BpeMerges
    BpeFns.register(spark)
    // 'ä' (0xC3 0xA4): one code-point symbol vs two remapped byte symbols —
    // the q136 divergence, pinned here at the token level
    val d = spark.range(1).select(array(lit("tät!"), lit("öre.")).as("ws"))
    val row = d.select(
      BpeFns.bpeEncodeNative(col("ws"), BpeMerges.frozen).as("chars"),
      BpeFns.bpeEncodeNative(col("ws"), BpeMerges.frozen, byteLevel = true).as("bytes"))
      .head()
    val chars = row.getSeq[String](0)
    val bytes = row.getSeq[String](1)
    assert(chars != bytes)
    assert(chars.contains("ä") && chars.contains("ö"))
    // the byte side carries the remapped UTF-8 bytes instead (keep-range
    // Latin-1 maps to itself: C3='Ã', A4='¤', B6='¶')
    assert(bytes.contains("Ã") && bytes.contains("¤") && bytes.contains("¶"))
    assert(!bytes.contains("ä") && !bytes.contains("ö"))
    // punctuation seeds identically in both modes (single printable byte)
    assert(chars.count(_ == "!") == 1 && bytes.count(_ == "!") == 1)
    // and the byte tokens still decode back to the original words
    assert(BpeCodec.decodeByteSymbols(bytes) == "tät!öre.")
  }

  test("frozen merge table is well-formed and chainable") {
    import graft.functions.BpeMerges
    val f = BpeMerges.frozen
    assert(f.size == 48)
    assert(f == f.distinct, "duplicate merges")
    val produced = scala.collection.mutable.Set.empty[String]
    f.foreach { case (a, b) =>
      def ok(s: String) = s.length == 1 || produced.contains(s)
      assert(ok(a) && ok(b), s"merge ($a,$b) uses a symbol never produced before it")
      produced += (a + b)
    }
    assert(f.forall { case (a, b) => (a + b).matches("[a-z0-9]+") },
      "frozen symbols must stay inside the oracle-safe alphabet")
  }

  test("learned merges chain into longer symbols (multi-round fusion)") {
    // 'a b' dominates, then 'ab c' — the second merge must see the fused
    // symbol from the first (delta-maintained counts, not a stale seed).
    val rows = (1L to 4L).map(i => i -> Vector("a", "b", "c", "d"))
    val res = BpeTrainer.train(df(rows), "seq", 3, minCount = 2L)
    assert(res.merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", "c"), ("abc", "d")))
    assert(collectSeqs(res)(1L) == Vector("abcd"))
  }
}
