package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class RepetitionKernelSpec extends SparkSpec {

  /** Plain-Scala reference: the semantics the kernel must reproduce. */
  private def ref(toks: Seq[String]): (Int, Int, Int, Int) = {
    val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString("\u0001")).toSeq
    val top = if (bigrams.isEmpty) 0
      else bigrams.groupBy(identity).values.map(_.size).max
    (toks.size, toks.distinct.size, bigrams.size, top)
  }

  test("kernel matches the plain-Scala reference on real docs") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"),
        RepetitionKernel.repetitionStats(TextFunctions.tokens(col("text"))).as("r"))
      .select("text", "r.n_tokens", "r.n_distinct", "r.n_bigrams", "r.top_bigram_n")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val toks = row.getString(0).trim match {
        case "" => Seq.empty[String]
        case t  => t.split("\\s+").toSeq
      }
      val (n, d, b, top) = ref(toks)
      assert((row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4))
        == ((n, d, b, top)), s"doc: ${row.getString(0).take(60)}")
    }
  }

  test("degenerate repetition is detected") {
    import spark.implicits._
    val got = Seq(
      "spam spam spam spam spam",        // 1 distinct token, 1 distinct bigram
      "a b a b a b a",                   // alternation: top bigram 'a b' ×3
      "all distinct tokens here now",    // no repetition
      "one",                             // single token: no bigrams
      "").toDF("text")
      .select(RepetitionKernel.repetitionStats(TextFunctions.tokens(col("text"))).as("r"))
      .select("r.n_tokens", "r.n_distinct", "r.n_bigrams", "r.top_bigram_n")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got(0) == ((5, 1, 4, 4)))
    assert(got(1) == ((7, 2, 6, 3)))
    assert(got(2) == ((5, 5, 4, 1)))
    assert(got(3) == ((1, 1, 0, 0)))
    assert(got(4) == ((0, 0, 0, 0)))
  }

  test("bigram keys are boundary-safe (ab+c vs a+bc)") {
    import spark.implicits._
    // 'ab c ab c' has top bigram 2; 'a bc a bc' must not share keys
    // with it — the \u0001 separator keeps pair boundaries distinct.
    val got = Seq("ab c a bc ab c a bc").toDF("text")
      .select(RepetitionKernel.repetitionStats(TextFunctions.tokens(col("text"))).as("r"))
      .select("r.n_tokens", "r.n_distinct", "r.n_bigrams", "r.top_bigram_n")
      .head
    // tokens: ab c a bc ab c a bc → 8 tokens, 4 distinct, 7 bigrams;
    // bigrams: ab|c, c|a, a|bc, bc|ab, ab|c, c|a, a|bc → top = 2
    assert((got.getInt(0), got.getInt(1), got.getInt(2), got.getInt(3))
      == ((8, 4, 7, 2)))
  }
}
