package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The native text→hashed-item-set kernels must be value-identical
  * (as sorted multisets) to the composed HOF forms on adversarial
  * inputs — that equivalence is what keeps the DuckDB oracle valid
  * for the dedup gates. */
class HashKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  private val words = Vector("the", "café", "Zürich", "a", "行きます",
    "x1", "— dash", "", "mixed42", "ß", "tab\tinner", "end.")
  private def randText(): String =
    (0 until rnd.nextInt(40)).map(_ => words(rnd.nextInt(words.size)))
      .mkString(" ") + (if (rnd.nextBoolean()) "  " else "")

  private val corpus = ((1 to 150).map(i => (i.toLong, randText())) ++ Seq(
    (900L, ""), (901L, "   "), (902L, "one"), (903L, "one two"),
    (904L, "\ta  b\tc "), (905L, "ααββγγ"), (906L, "aaaaa"),
    (907L, "ab"))).toDF("id", "text")

  private def sortedHof(c: org.apache.spark.sql.Column) =
    sort_array(c)

  test("hashed_word_shingles == sorted composed transform(wordShingles(tokens))") {
    for (n <- Seq(1, 2, 3)) {
      val native = corpus.select(col("id"),
        HashKernels.hashedWordShingles(col("text"), n).as("hs"))
      val hof = corpus.select(col("id"),
        sortedHof(transform(
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), n),
          g => TextFunctions.portableHash64(g))).as("hs"))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        s"shingle n=$n mismatch")
    }
  }

  test("hashed_char_ngrams == sorted composed transform(charNgrams)") {
    for (n <- Seq(2, 5)) {
      val native = corpus.select(col("id"),
        HashKernels.hashedCharNgrams(col("text"), n).as("hs"))
      val hof = corpus.select(col("id"),
        sortedHof(transform(TextFunctions.charNgrams(col("text"), n),
          g => TextFunctions.portableHash64(g))).as("hs"))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        s"ngram n=$n mismatch")
    }
  }

  test("char n-gram distinctness is decided on gram bytes, multibyte safe") {
    // "ααββ" 2-grams: αα, αβ, ββ — 3 distinct; repeated text dedups
    val r = Seq((1L, "ααββαα")).toDF("id", "text")
      .select(HashKernels.hashedCharNgrams(col("text"), 2).as("hs"))
      .head().getSeq[Long](0)
    assert(r.size == 4) // αα αβ ββ βα
    assert(r == r.sorted)
  }

  test("parity holds on random code-point soup (multibyte, whitespace zoo)") {
    // strings of random defined code points — multibyte UTF-8, every
    // whitespace class, combining marks — the worst case for the
    // byte-offset walk and the trim/split parity
    def randCp(): Int = {
      var cp = 0
      do cp = rnd.nextInt(0x2FFF) + 1
      while (!Character.isDefined(cp) || Character.isSurrogate(cp.toChar))
      cp
    }
    val soup = (1 to 200).map { i =>
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(60)).foreach { _ =>
        if (rnd.nextInt(5) == 0) sb.append(" \t\n ".charAt(rnd.nextInt(4)))
        else sb.appendCodePoint(randCp())
      }
      (i.toLong, sb.toString)
    }.toDF("id", "text")
    val nShingle = soup.select(col("id"),
      HashKernels.hashedWordShingles(col("text"), 2).as("hs"))
    val hShingle = soup.select(col("id"),
      sortedHof(transform(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2),
        g => TextFunctions.portableHash64(g))).as("hs"))
    assert(nShingle.exceptAll(hShingle).isEmpty && hShingle.exceptAll(nShingle).isEmpty)
    val nGram = soup.select(col("id"),
      HashKernels.hashedCharNgrams(col("text"), 3).as("hs"))
    val hGram = soup.select(col("id"),
      sortedHof(transform(TextFunctions.charNgrams(col("text"), 3),
        g => TextFunctions.portableHash64(g))).as("hs"))
    assert(nGram.exceptAll(hGram).isEmpty && hGram.exceptAll(nGram).isEmpty)
  }

  test("sorted_hashed_jaccard == hashed_jaccard on random multisets") {
    val pairs = (1 to 300).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+ ((Seq(1L, 1L, 1L), Seq(1L)))
    val df = pairs.toDF("a", "b")
    val both = df.select(
      LshKernels.sortedHashedJaccard(col("a"), col("b")).as("m"),
      LshKernels.hashedJaccard(col("a"), col("b")).as("h"))
    assert(both.filter(col("m") =!= col("h")).isEmpty)
  }
}
