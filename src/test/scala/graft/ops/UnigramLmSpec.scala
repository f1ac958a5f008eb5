package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM tokenizer induction ([[UnigramLm]]): the determinism
  * contracts the ts30 gate can't see from one corpus — prune ORDER at
  * a count tie, char coverage after pruning, the apply path, and
  * run-to-run reproducibility. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("prune order is (cnt DESC, piece ASC): the tie at the boundary is deterministic") {
    // "ab" and "cd" tie at count 2; keepPieces = 1 puts the tie ON the
    // boundary — the lexicographically smaller piece must survive
    val docs = Seq("ab ab cd cd").toDF("text")
    val v = UnigramLm.trainVocab(docs, "text", iters = 2,
      maxPieceLen = 4, maxWordLen = 20, minSeedCount = 2, keepPieces = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.contains("ab") && !v.contains("cd"))
    // chars always survive (coverage), floored at 1 even when the EM
    // path stopped using them ("a"/"b" ride inside the piece "ab")
    assert(Seq("a", "b", "c", "d").forall(v.contains))
    assert(v("a") == 1L && v("b") == 1L)
    // ...and "cd" still segments: its chars carry real usage counts
    assert(v("c") == 2L && v("d") == 2L)
  }

  test("EM keeps the pieces the model uses; coverage never breaks") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    val v = UnigramLm.trainVocab(docs, "text", iters = 2,
      keepPieces = 120)
    val pieces = v.collect().map(r => (r.getString(0), r.getLong(1)))
    // non-degenerate: multi-char pieces exist and carry real usage
    assert(pieces.exists(p => p._1.length >= 2 && p._2 > 1))
    // every training word still segments under the pruned vocab: its
    // chars are all present
    val chars = pieces.map(_._1).filter(_.length == 1).toSet
    val missing = UnigramLm.trainingWords(docs, "text", 20)
      .select("word").collect().map(_.getString(0))
      .flatMap(_.toCharArray.map(_.toString)).distinct
      .filterNot(chars)
    assert(missing.isEmpty, s"uncovered chars: ${missing.mkString(",")}")
    // reproducible: a second run returns the identical vocabulary
    val again = UnigramLm.trainVocab(docs, "text", iters = 2,
      keepPieces = 120)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pieces.sorted.toSeq == again.sorted.toSeq)
  }

  test("tokenize: Viterbi path lengths, long words fall back to chars") {
    val train = Seq("ab ab cd cd").toDF("text")
    val v = UnigramLm.trainVocab(train, "text", iters = 1,
      maxPieceLen = 4, maxWordLen = 20, minSeedCount = 2, keepPieces = 10)
    val docs = Seq(
      (1L, "ab ab cd"),
      (2L, "abcdabcdabcdabcdabcdabcd ab") // 24-char word > maxWordLen
    ).toDF("id", "text")
    val out = UnigramLm.tokenize(docs, "id", "text", v,
      maxPieceLen = 4, maxWordLen = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: ab(1) + ab(1) + cd(1, "cd" survived keepPieces=10) = 3
    assert(out(1L) == ((3L, 3L)))
    // doc 2: the long word char-counts (24), "ab" is one piece
    assert(out(2L) == ((2L, 25L)))
  }

  test("tokenize on a FOREIGN corpus: unknown words/chars count as <unk>-per-char, never vanish") {
    val train = Seq("ab ab cd cd").toDF("text")
    val v = UnigramLm.trainVocab(train, "text", iters = 1,
      maxPieceLen = 4, maxWordLen = 20, minSeedCount = 2, keepPieces = 10)
    // "xyz" shares NO character with the training vocab (no candidate
    // rows at all); "axb" has known chars around an unknown one (the
    // DP is unreachable at the 'x' boundary). Both must still count.
    val docs = Seq((1L, "ab xyz axb")).toDF("id", "text")
    val out = UnigramLm.tokenize(docs, "id", "text", v)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // ab(1 piece) + xyz(3 chars, all unknown) + axb(3 chars, DP
    // unreachable) — 3 words, 7 pieces; before the fallback the
    // unknown words were silently DROPPED from both counts
    assert(out(1L) == ((3L, 7L)), out.toString)
  }

  test("supplementary characters: DP indices are code points, not UTF-16 units") {
    // "𝕒" (MATHEMATICAL DOUBLE-STRUCK SMALL A, U+1D552) is ONE code
    // point but TWO UTF-16 units. Candidate (pos,len) come from
    // Spark's substr (code points); a DP sized by word.length could
    // never reach best(n) for any word containing it — training
    // silently dropped its pieces and tokenize fell back to
    // <unk>-per-UTF-16-unit (2 per char instead of 1).
    val w = "𝕒" // 𝕒
    val train = Seq(s"$w$w $w$w xy xy").toDF("text")
    val v = UnigramLm.trainVocab(train, "text", iters = 2,
      maxPieceLen = 4, maxWordLen = 20, minSeedCount = 2, keepPieces = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 2-code-point piece "𝕒𝕒" must survive EM like "xy" does —
    // with the UTF-16 DP its word was unreachable and it never counted
    assert(v.contains(s"$w$w"), v.keys.mkString(","))
    assert(v(s"$w$w") == v("xy"))
    val docs = Seq((1L, s"$w$w xy"), (2L, s"$w$w$w")).toDF("id", "text")
    val out = UnigramLm.tokenize(docs, "id", "text",
        Seq((s"$w$w", 2L), (w, 1L), ("xy", 2L), ("x", 1L), ("y", 1L))
          .toDF("piece", "cnt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: 𝕒𝕒 = 1 piece, xy = 1 piece; doc 2: 𝕒𝕒 + 𝕒 = 2 pieces
    assert(out(1L) == ((2L, 2L)), out.toString)
    assert(out(2L) == ((1L, 2L)), out.toString)
  }

  test("byte fallback: any input round-trips losslessly; counts match the segmenter") {
    val train = Seq("ab ab cd cd").toDF("text")
    val v = UnigramLm.trainVocab(train, "text", iters = 1,
      maxPieceLen = 4, maxWordLen = 20, minSeedCount = 2, keepPieces = 10)
      .persist()
    // the ts31-breaking fixture class plus worse: unknown ASCII,
    // mixed known/unknown, 2-/3-/4-byte characters, pure emoji
    val words = Seq("ab", "xyz", "axb", "caffè", "→", "🌍", "a🌍b",
      "日本語", "ab→cd")
    val wdf = words.toDF("word")
    val segs = UnigramLm.segmentPiecesByteFallback(wdf, v, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      val pieces = segs(w)
      // LOSSLESS: detokenize inverts segmentation exactly
      assert(UnigramLm.detokenize(pieces) == w,
        s"$w -> $pieces -> ${UnigramLm.detokenize(pieces)}")
    }
    // vocab pieces are preferred wherever a path exists
    assert(segs("ab") == Seq("ab"))
    assert(segs("xyz").forall(_.startsWith("<0x")), segs("xyz").toString)
    assert(segs("a🌍b").count(_.startsWith("<0x")) == 4, segs("a🌍b"))
    // counts agree with the counting path (tokenizeByteFallback)
    val docs = Seq((1L, words.mkString(" "))).toDF("id", "text")
    val counted = UnigramLm.tokenizeByteFallback(docs, "id", "text", v)
      .head
    assert(counted.getLong(1) == words.size.toLong)
    assert(counted.getLong(2) == segs.values.map(_.size.toLong).sum,
      s"${counted.getLong(2)} vs ${segs.view.mapValues(_.size).toMap}")
    v.unpersist()
  }
}
