package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * construction step a training-data pipeline runs after vocabulary stats
  * (q85's coverage curve picks the size; this learns the merges). Classic
  * BPE (Sennrich et al. 2016): repeatedly take the most frequent adjacent
  * symbol pair and fuse it into one symbol, greedy left-to-right and
  * non-overlapping at application time, counting overlapping occurrences at
  * selection time.
  *
  * Spark-first shape — the driver holds ONLY the learned merge list:
  *
  *   - pair counts live in a (a, b, cnt) DataFrame, seeded by one
  *     partial+final aggregate over the corpus;
  *   - each round's argmax is a top-1 over that VOCABULARY²-bounded frame
  *     (count desc, then lexicographic — fully deterministic), never a scan
  *     of the corpus;
  *   - the merge applies only to AFFECTED rows (an `exists` filter finds
  *     sequences containing the pair), and the count frame is maintained by
  *     DELTA: cnt += pairs(after) − pairs(before) over affected rows only.
  *     A merge of a rare pair touches almost nothing — without the delta
  *     maintenance, training m merges costs m full corpus scans, which is
  *     the difference between a tokenizer you can train on 100 TB and one
  *     you cannot;
  *   - the greedy non-overlapping apply is a codegen'd `aggregate` fold
  *     over the token array (no UDF): state = (output-so-far, skip-next);
  *     "a a a" under merge (a,a) becomes ["aa", "a"], exactly like the
  *     reference algorithm;
  *   - both state frames `localCheckpoint` per round (lineage would
  *     otherwise nest m HOF layers deep).
  */
object BpeTrainer {

  /** One learned merge: the fused pair and its count at selection time. */
  final case class Merge(left: String, right: String, count: Long)

  final case class Result(merges: Seq[Merge], sequences: DataFrame)

  /** Overlapping adjacent pairs of a token array (selection-time counting). */
  private def pairsOf(t: Column): Column =
    filter(
      transform(sequence(lit(1), greatest(size(t) - 1, lit(1))),
        i => struct(try_element_at(t, i).as("a"), try_element_at(t, i + 1).as("b"))),
      p => p.getField("b").isNotNull && p.getField("a").isNotNull)

  private def pairCounts(df: DataFrame, seqCol: String): DataFrame =
    df.select(explode(pairsOf(col(seqCol))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  private def hasPair(t: Column, a: String, b: String): Column =
    exists(sequence(lit(1), greatest(size(t) - 1, lit(1))),
      i => try_element_at(t, i) === a && try_element_at(t, i + 1) === b)

  /** Greedy left-to-right non-overlapping application of one merge. */
  private def applyMerge(t: Column, a: String, b: String): Column = {
    val fused = a + b
    val folded = aggregate(
      sequence(lit(1), size(t)),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) =>
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
        .when(try_element_at(t, i) === a && try_element_at(t, i + 1) === b,
          struct(concat(acc.getField("out"), array(lit(fused))).as("out"),
            lit(true).as("skip")))
        .otherwise(
          struct(concat(acc.getField("out"), array(try_element_at(t, i))).as("out"),
            lit(false).as("skip"))),
      acc => acc.getField("out"))
    when(size(t) < 2, t).otherwise(folded)
  }

  /** Learn up to `nMerges` merges over `df`'s `seqCol` (array<string>).
    * Stops early when no pair reaches `minCount`. Returns the merge list in
    * learned order plus the corpus re-segmented under all of them.
    */
  def train(df: DataFrame, seqCol: String, nMerges: Int,
            minCount: Long = 2L): Result = {
    require(nMerges >= 0)
    var seqs = df.localCheckpoint()
    var counts = pairCounts(seqs, seqCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]

    var rounds = 0
    var exhausted = false
    while (rounds < nMerges && !exhausted) {
      val top = counts.orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      top.headOption match {
        case Some(Row(a: String, b: String, cnt: Long)) if cnt >= minCount =>
          val affected = seqs.filter(hasPair(col(seqCol), a, b))
          val rest = seqs.filter(!hasPair(col(seqCol), a, b))
          val merged = affected.withColumn(seqCol, applyMerge(col(seqCol), a, b))
          val delta = pairCounts(affected, seqCol)
            .withColumn("cnt", -col("cnt"))
            .unionByName(pairCounts(merged, seqCol))
          counts = counts.unionByName(delta)
            .groupBy("a", "b").agg(sum("cnt").as("cnt"))
            .filter(col("cnt") > 0)
            .localCheckpoint()
          seqs = rest.unionByName(merged).localCheckpoint()
          merges += Merge(a, b, cnt)
          rounds += 1
        case _ => exhausted = true
      }
    }
    Result(merges.toSeq, seqs)
  }

  /** Corpus-scale ENCODE: apply a learned merge list to a column of words
    * (array<string>), returning all subword tokens in order. Semantics are
    * the sequential apply above — `encode(words, train(...).merges)` on the
    * training corpus reproduces `Result.sequences` exactly. One native
    * expression call per row ([[graft.functions.expressions.BpeEncode]]),
    * zero shuffle, Zipf-friendly per-task word cache.
    */
  def encode(spark: org.apache.spark.sql.SparkSession, words: Column,
             merges: Seq[Merge], byteLevel: Boolean = false): Column = {
    graft.functions.expressions.BpeFns.register(spark)
    graft.functions.expressions.BpeFns.bpeEncodeNative(
      words, merges.map(m => (m.left, m.right)), byteLevel)
  }
}
