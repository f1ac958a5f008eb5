package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergePair is greedy left-to-right and never re-merges a fresh symbol") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"),
      Seq("b"), Seq.empty[String]).toDF("syms")
    val aa = df.select(Bpe.mergePair(col("syms"), "a", "a"))
      .collect().map(_.getSeq[String](0))
    assert(aa(0) == Seq("aa", "a"), aa(0)) // NOT [a, aa]
    val ab = df.select(Bpe.mergePair(col("syms"), "a", "b"))
      .collect().map(_.getSeq[String](0))
    assert(ab(1) == Seq("ab", "ab"))
    assert(ab(2) == Seq("b") && ab(3) == Seq.empty)
  }

  test("learnMerges: counts, lexicographic tie-break, early termination") {
    val docs = Seq("aaa aa", "ab").toDF("text")
    // iter1: (a,a)=3 (overlap counts) beats (a,b)=1
    // iter2: (aa,a)=1 ties (a,b)=1 -> lex: lhs 'a' < 'aa' -> (a,b)
    // iter3: (aa,a)=1
    // iter4: vocabulary has no pairs left -> stops at 3 rows
    val m = Bpe.learnMerges(docs, "text", numMerges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "a", 3L), (2, "a", "b", 1L),
      (3, "aa", "a", 1L)), m.toSeq)
  }

  test("staged iterations produce the identical merge table") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    val plain = Bpe.learnMerges(docs, "text", numMerges = 4).collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("bpespec").toString
    val staged = Bpe.learnMerges(docs, "text", numMerges = 4,
      stagingDir = Some(tmp)).collect().toSeq
    assert(plain == staged)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "staging must not pin blocks")
  }

  test("tokenize: counts reconcile — words covered, merges only shrink token counts") {
    val docs = Seq((1L, "aaa aa"), (2L, "ab"), (3L, "aaa ab"))
      .toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, "doc_id", "text", numMerges = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // merges (from the learnMerges spec): (a,a)@1, (a,b)@2, (aa,a)@3
    // final syms: aaa->[aaa], aa->[aa], ab->[ab]
    assert(out(1L) == ((2L, 2L)), out(1L)) // aaa + aa -> 1 + 1
    assert(out(2L) == ((1L, 1L)))
    assert(out(3L) == ((2L, 2L)))
    // every corpus word is in the trained vocabulary: n_words must
    // equal the raw whitespace token count (no join loss)
    val raw = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(lower(col("text")))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(out.forall { case (id, (w, _)) => w == raw(id) })
    // with zero merges applied... numMerges >= 1, so assert the
    // monotone bound instead: BPE tokens never exceed characters and
    // never undercut words
    assert(out.forall { case (_, (w, t)) => t >= w })
  }

  test("pair counting reduces at the combiners (vocab-sized aggregation)") {
    val docs = Seq("the quick brown fox", "the quick fox").toDF("text")
    val vocab = Bpe.wordFreq(docs, "text")
    assert(vocab.queryExecution.executedPlan.toString
      .contains("partial_count"), "word count must map-side combine")
    // 4 distinct words; the/quick/fox appear twice, brown once
    val f = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("the") == 2 && f("brown") == 1 && f.size == 4)
  }

  test("learnMergesBatched: batchSize 1 reproduces the classic schedule") {
    val docs = Seq("aaa aa", "ab").toDF("text")
    val classic = Bpe.learnMerges(docs, "text", numMerges = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val batched = Bpe.learnMergesBatched(docs, "text", rounds = 3,
        batchSize = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(batched ==
      classic.map { case (i, a, b, c) => (i, 1, a, b, c) }, batched)
  }

  test("learnMergesBatched skips conflicting pairs; they resurface next round") {
    // round 1 counts: (a,b)=2 > (a,c)=1, but (a,c) shares symbol 'a'
    // with the accepted (a,b) — so round 1 accepts ONLY (a,b) and
    // round 2 picks (a,c) up with fresh (identical) counts
    val docs = Seq("ab ab ac").toDF("text")
    val got = Bpe.learnMergesBatched(docs, "text", rounds = 2,
        batchSize = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq((1, 1, "a", "b", 2L), (2, 1, "a", "c", 1L)), got)
  }

  test("tokenizeWithMerges applies a stored merge list without re-training") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val trained = Bpe.tokenize(docs, "doc_id", "text", numMerges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val applied = Bpe.tokenizeWithMerges(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(applied == trained)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "apply path must not pin blocks")
  }
}
