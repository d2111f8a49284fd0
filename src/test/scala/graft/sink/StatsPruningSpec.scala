package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** Stat-domain comparison semantics — in particular, string bounds must
  * compare in UTF-8 BINARY order (how Spark's min/max computed them), not
  * Java's UTF-16 code-unit order, which ranks supplementary-plane
  * characters below U+E000..U+FFFF and would mis-prune.
  */
class StatsPruningSpec extends AnyFunSuite {

  test("string cmp is UTF-8 binary order (supplementary plane above U+FFFD)") {
    val emoji = new String(Character.toChars(0x1F600)) // U+1F600, surrogate pair
    val fffd = "�"
    assert(fffd.compareTo(emoji) > 0, "Java UTF-16 order (the trap)")
    assert(StatsPruning.cmp("s", emoji, fffd) > 0, "UTF-8 binary order (correct)")
    // a file whose max is the emoji must NOT be pruned for `= U+FFFD`
    assert(StatsPruning.mayMatch(ColStat("s", "a", emoji), "=", "s", fffd))
  }

  test("numeric cmp and bound semantics") {
    assert(StatsPruning.cmp("n", "9", "10") < 0) // numeric, not lexicographic
    val st = ColStat("n", "10", "20")
    assert(StatsPruning.mayMatch(st, "=", "n", "15"))
    assert(!StatsPruning.mayMatch(st, "=", "n", "25"))
    assert(StatsPruning.mayMatch(st, ">", "n", "19"))
    assert(!StatsPruning.mayMatch(st, ">", "n", "20"))
    assert(StatsPruning.mayMatch(st, "<=", "n", "10"))
    assert(!StatsPruning.mayMatch(st, "<", "n", "10"))
    // all-null file matches no comparison; unknown op keeps the file
    assert(!StatsPruning.mayMatch(ColStat("z", "", ""), "=", "n", "1"))
    assert(StatsPruning.mayMatch(st, "??", "n", "1"))
    // domain mismatch is conservative
    assert(StatsPruning.mayMatch(ColStat("s", "a", "b"), "=", "n", "1"))
  }
}
