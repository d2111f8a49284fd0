package graft.functions

/** The frozen production merge table for `bpe_encode` — 48 merges trained
  * once over the sf0.001 `documents` word corpus (words =
  * `regexp_extract_all(normalize(text), '[a-z0-9]+')`, one training row per
  * word OCCURRENCE) with the classic BPE selection rule BpeTrainer
  * implements: most frequent adjacent pair, overlapping counts, ties broken
  * count-desc then lexicographic, minCount=2. Freezing the table (rather
  * than training inside the query) is what production tokenizers do — the
  * vocabulary is a build artifact, the corpus-scale job only ever APPLIES
  * it — and it is what keeps q129 oracle-checkable: the DuckDB oracle
  * mirrors the same table as literal `replace()` steps.
  *
  * Regenerate after a testdata refresh with:
  * {{{
  *   val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  *     .select(explode(regexp_extract_all(
  *       regexp_replace(lower(trim(col("text"))), "\\s+", " "),
  *       lit("[a-z0-9]+"), lit(0))).as("w"))
  *     .select(transform(sequence(lit(1), length(col("w"))),
  *       i => substring(col("w"), i, 1))... ) // chars of w, see BpeSpec
  *   BpeTrainer.train(words, "seq", 48).merges
  * }}}
  */
object BpeMerges {
  val frozen: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"), ("w", "indow"),
    ("d", "er"), ("or", "der"), ("or", "t"), ("s", "ort"), ("par", "t"),
    ("u", "p"), ("a", "g"), ("ag", "g"), ("a", "lu"), ("alu", "e"),
    ("v", "alue"), ("in", "e"), ("l", "ine"), ("e", "y"), ("k", "ey"),
    ("j", "o"), ("jo", "in"), ("g", "e"), ("mer", "ge"), ("er", "y"),
    ("g", "r"), ("gr", "o"), ("gro", "up"), ("q", "u"), ("qu", "ery"),
    ("c", "t"), ("ct", "or"), ("e", "ctor"))
}
