package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer induction (Kudo 2018)
  * — the OTHER production tokenizer family next to BPE ([[Bpe]]):
  * instead of growing a vocabulary by merges, start from a large
  * substring seed and let EM keep the pieces a unigram language model
  * actually uses.
  *
  * Distributed the ts13 way: ONE corpus scan reduces the text to the
  * word-frequency table; the substring candidate table derives from
  * it once; every EM iteration after that touches only VOCABULARY-
  * sized frames (score join + per-word Viterbi + combinable count
  * rollup). The corpus is never read again.
  *
  * Semantics (pinned for the oracle, gate ts30):
  *  - TRAINING WORDS: lowercased whitespace tokens with ≤ `maxWordLen`
  *    chars (the SentencePiece cap — unboundedly long "words" are
  *    URLs/garbage and would explode the DP);
  *  - SEED: every substring of length 1..`maxPieceLen` of every
  *    training word, counted with word-frequency weighting and
  *    OCCURRENCE multiplicity ("aaa" contributes "aa" twice); multi-
  *    char pieces need `minSeedCount`; single chars always enter
  *    (coverage guarantee — every word stays segmentable);
  *  - E-STEP (hard/Viterbi EM — the deterministic member of the EM
  *    family): piece score = round(ln(cnt / total), 9) (the dsir
  *    1e-9 rounding discipline, so the DP compares engine-portable
  *    doubles); per word, the best segmentation by summed score,
  *    positions ascending, candidate lengths ascending, strict
  *    improvement — ties keep the SHORTER piece at that boundary.
  *    Prefix sums associate left-to-right, so both engines fold the
  *    identical expression tree;
  *  - M-STEP + PRUNE: piece counts along the best paths (freq-
  *    weighted), then keep the top `keepPieces` multi-char pieces by
  *    (cnt DESC, piece ASC) — the deterministic prune order the spec
  *    pins — plus ALL single chars, count-floored at 1 (a zero-count
  *    char would carry probability 0 and make some word
  *    unsegmentable next round).
  *
  * Scale shape: the E-step's one exchange keys by WORD (vocabulary-
  * sized, never the corpus); the per-word DP is O(len·maxPieceLen)
  * inside `flatMapGroups`; the M-step is a map-side-combinable sum.
  * At 100 TB the corpus term is exactly the wordFreq scan, as with
  * BPE. */
object UnigramLm {

  /** All (pos, len, piece) substrings of `word` up to `maxLen` —
    * 1-based pos, occurrence-multiplicity preserved. */
  private def substrs(word: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), p =>
      transform(sequence(lit(1), least(lit(maxLen), length(word) - p + 1)),
        l => struct(p.as("pos"), l.as("len"),
          word.substr(p, l).as("piece")))))

  /** Training words: [[Bpe.wordFreq]] capped at `maxWordLen` chars. */
  def trainingWords(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    Bpe.wordFreq(docs, textCol).filter(length(col("word")) <= maxWordLen)

  /** The substring candidate table (word, freq, pos, len, piece) —
    * derived once, joined against each round's scored vocabulary. */
  private def candidates(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("word"), col("freq"),
        explode(substrs(col("word"), maxPieceLen)).as("c"))
      .select(col("word"), col("freq"), col("c.pos"), col("c.len"),
        col("c.piece"))

  /** The deterministic prune: top `keepPieces` multi-char pieces by
    * (cnt DESC, piece ASC), plus every seed char count-floored at 1.
    * `counts` may lack chars EM stopped using — the left join
    * restores them. */
  private def prune(counts: DataFrame, chars: DataFrame,
      keepPieces: Int): DataFrame = {
    val multi = counts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(keepPieces)
      .select("piece", "cnt")
    val charRows = chars.select("piece")
      .join(counts.select("piece", "cnt"), Seq("piece"), "left")
      .select(col("piece"),
        greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
    multi.unionByName(charRows)
  }

  /** One hard-EM round: score the vocab, Viterbi-segment every
    * training word, count the pieces the best paths use. */
  private def viterbiCounts(cands: DataFrame, vocab: DataFrame): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val total = vocab.agg(sum(col("cnt")).cast("double").as("__total"))
    val scored = vocab.crossJoin(broadcast(total))
      .select(col("piece"),
        round(log(col("cnt").cast("double") / col("__total")), 9)
          .as("score"))
    val wordCands = cands
      .join(scored, Seq("piece"))
      .select(col("word"), col("freq"), col("pos"), col("len"),
        col("score"), col("piece"))
      .as[(String, Long, Int, Int, Double, String)]
    wordCands.groupByKey(_._1).flatMapGroups { (word, it) =>
      val rows = it.toArray
      val freq = rows.head._2
      // candidate (pos,len) come from Spark's substr — CODE-POINT
      // indices; size the DP the same way or supplementary chars
      // (emoji, astral CJK) leave best(n) unreachable forever
      val n = word.codePointCount(0, word.length)
      // candidates by END position (1-based), lengths ascending — the
      // tie rule: equal scores keep the shorter piece at the boundary
      val byEnd = rows.groupBy(r => r._3 + r._4 - 1)
        .map { case (e, rs) => e -> rs.sortBy(_._4) }
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val path = Array.fill[List[String]](n + 1)(Nil)
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        byEnd.getOrElse(i, Array.empty[(String, Long, Int, Int, Double, String)])
          .foreach { c =>
            val l = c._4
            if (best(i - l) != Double.NegativeInfinity) {
              val s = best(i - l) + c._5
              if (s > best(i)) { best(i) = s; path(i) = c._6 :: path(i - l) }
            }
          }
        i += 1
      }
      path(n).map(p => (p, freq)).iterator
    }.toDF("piece", "freq")
      .groupBy("piece").agg(sum("freq").as("cnt"))
  }

  /** Train the unigram-LM vocabulary: seed → `iters` hard-EM rounds,
    * each pruned deterministically. Returns (piece, cnt) — the final
    * vocabulary with its last-round usage counts (chars floored at
    * 1). Iteration state stages through persisted leaves (the
    * [[Bpe]]/[[ConnectedComponents]] fixpoint discipline); every
    * cache frees before return. */
  def trainVocab(docs: DataFrame, textCol: String, iters: Int = 2,
      maxPieceLen: Int = 4, maxWordLen: Int = 20, minSeedCount: Int = 2,
      keepPieces: Int = 150): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    require(maxPieceLen >= 1 && maxWordLen >= 1 && keepPieces >= 1)
    val spark = docs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words = trainingWords(docs, textCol, maxWordLen).persist(lvl)
    val cands = candidates(words, maxPieceLen).persist(lvl)
    val staged = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def stage(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(lvl)
      staged += rdd
      spark.createDataFrame(rdd, df.schema)
    }
    try {
      val seed = cands.groupBy("piece").agg(sum("freq").as("cnt"))
      val chars = stage(seed.filter(length(col("piece")) === 1))
      var vocab = stage(prune(
        seed.filter(length(col("piece")) === 1 ||
          col("cnt") >= minSeedCount),
        chars, keepPieces))
      for (_ <- 1 to iters)
        vocab = stage(prune(viterbiCounts(cands, vocab), chars, keepPieces))
      vocab
    } finally {
      words.unpersist(blocking = false)
      cands.unpersist(blocking = false)
      staged.foreach(_.unpersist(blocking = false))
    }
  }

  /** APPLY the trained vocabulary: per document, whitespace word
    * count and unigram-LM token count — the [[Bpe.tokenize]] twin.
    * One (word)-keyed join of the exploded corpus against the
    * per-word Viterbi segmentation of the DISTINCT word set. The
    * apply corpus may be FOREIGN (unlike BPE-tokenize's same-corpus
    * contract), so the unknown cases are pinned rather than dropped:
    * words longer than `maxWordLen`, words with NO in-vocab substring
    * at all, and words whose DP is unreachable (an out-of-vocabulary
    * character mid-word) all count one piece per character — the
    * <unk>-per-char convention, never a silent row loss. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 4,
      maxWordLen: Int = 20): DataFrame = {
    val corpusWords = docs
      .select(explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
    val inCap = corpusWords.filter(length(col("word")) <= maxWordLen)
    // LEFT join: a word with no in-vocab substring never reaches the
    // DP and must still count (char fallback), not vanish
    val lens = inCap.select("word")
      .join(segmentLengths(candidates(inCap, maxPieceLen), vocab),
        Seq("word"), "left")
      .select(col("word"),
        coalesce(col("n_pieces"), length(col("word")).cast("long"))
          .as("n_pieces"))
      .unionByName(corpusWords.filter(length(col("word")) > maxWordLen)
        .select(col("word"), length(col("word")).cast("long").as("n_pieces")))
    docs.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(
          lower(col(textCol)))).as("word"))
      .join(lens, Seq("word"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_lm_tokens"))
  }

  /** Per-word Viterbi path LENGTH under `vocab` — the apply-side DP. */
  private def segmentLengths(cands: DataFrame, vocab: DataFrame): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val total = vocab.agg(sum(col("cnt")).cast("double").as("__total"))
    val scored = vocab.crossJoin(broadcast(total))
      .select(col("piece"),
        round(log(col("cnt").cast("double") / col("__total")), 9)
          .as("score"))
    cands.join(scored, Seq("piece"))
      .select(col("word"), col("pos"), col("len"), col("score"))
      .as[(String, Int, Int, Double)]
      .groupByKey(_._1).mapGroups { (word, it) =>
        val rows = it.toArray
        // code-point length — candidate indices are Spark substr's
        val n = word.codePointCount(0, word.length)
        val byEnd = rows.groupBy(r => r._2 + r._3 - 1)
          .map { case (e, rs) => e -> rs.sortBy(_._3) }
        val best = Array.fill(n + 1)(Double.NegativeInfinity)
        val cnt = Array.fill(n + 1)(0L)
        best(0) = 0.0
        var i = 1
        while (i <= n) {
          byEnd.getOrElse(i, Array.empty[(String, Int, Int, Double)])
            .foreach { c =>
              val l = c._3
              if (best(i - l) != Double.NegativeInfinity) {
                val s = best(i - l) + c._4
                if (s > best(i)) { best(i) = s; cnt(i) = cnt(i - l) + 1 }
              }
            }
          i += 1
        }
        // unreachable (an out-of-vocabulary character mid-word on a
        // foreign corpus): <unk>-per-char, never a silent zero
        (word, if (best(n) == Double.NegativeInfinity) n.toLong else cnt(n))
      }.toDF("word", "n_pieces")
  }

  /** Per-byte fallback score: far below any vocabulary piece's
    * ln-probability (vocab scores sit in (-total, 0), realistically
    * ≥ -20 at any trained size), so the DP routes through byte edges
    * ONLY where no vocabulary path exists — exactly SentencePiece's
    * `byte_fallback` contract. Exact in doubles on both engines
    * (integer multiples of -100), so the oracle DP folds bit-equal. */
  private val ByteScore = -100.0

  private def utf8Width(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4

  /** APPLY with BYTE FALLBACK ([[tokenize]]'s production twin —
    * SentencePiece `byte_fallback=true`): every character position
    * always carries a fallback edge of one byte token PER UTF-8 BYTE
    * at [[ByteScore]] per byte, so the Viterbi DP is reachable for
    * ANY input and unknown characters count their byte width instead
    * of a lossy `<unk>`. Words over `maxWordLen` byte out whole
    * (np = octet count — the cap rule, byte edition); words with no
    * in-vocab substring never reach the DP and coalesce to the same
    * octet count (a pure byte path's np, exactly what the DP would
    * compute). Lossless by construction — [[segmentPiecesByteFallback]]
    * + [[detokenize]] round-trip any input; gate ts32 pins the counts
    * against the unrolled-DP oracle on a foreign corpus. */
  def tokenizeByteFallback(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 4,
      maxWordLen: Int = 20): DataFrame = {
    val corpusWords = docs
      .select(explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
    val inCap = corpusWords.filter(length(col("word")) <= maxWordLen)
    val lens = inCap.select("word")
      .join(byteFallbackLengths(candidates(inCap, maxPieceLen), vocab),
        Seq("word"), "left")
      .select(col("word"),
        coalesce(col("n_pieces"), octet_length(col("word")).cast("long"))
          .as("n_pieces"))
      .unionByName(corpusWords.filter(length(col("word")) > maxWordLen)
        .select(col("word"),
          octet_length(col("word")).cast("long").as("n_pieces")))
    docs.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(
          lower(col(textCol)))).as("word"))
      .join(lens, Seq("word"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_lm_tokens"))
  }

  /** Per-word byte-fallback Viterbi path LENGTH (piece count; byte
    * tokens count one PER BYTE). The DP is always reachable: every
    * end position i has the byte edge from i-1 in addition to the
    * vocab candidates (processed after the byte edge, lengths
    * ascending, strict improvement — vocab beats bytes by score
    * construction, ties keep the shorter vocab piece). */
  private def byteFallbackLengths(cands: DataFrame,
      vocab: DataFrame): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val total = vocab.agg(sum(col("cnt")).cast("double").as("__total"))
    val scored = vocab.crossJoin(broadcast(total))
      .select(col("piece"),
        round(log(col("cnt").cast("double") / col("__total")), 9)
          .as("score"))
    cands.join(scored, Seq("piece"))
      .select(col("word"), col("pos"), col("len"), col("score"))
      .as[(String, Int, Int, Double)]
      .groupByKey(_._1).mapGroups { (word, it) =>
        val rows = it.toArray
        val cps = word.codePoints.toArray
        val n = cps.length
        val byEnd = rows.groupBy(r => r._2 + r._3 - 1)
          .map { case (e, rs) => e -> rs.sortBy(_._3) }
        val best = Array.fill(n + 1)(Double.NegativeInfinity)
        val cnt = Array.fill(n + 1)(0L)
        best(0) = 0.0
        var i = 1
        while (i <= n) {
          // the byte edge FIRST (lowest priority: any vocab edge's
          // score strictly beats it), then vocab candidates
          val w = utf8Width(cps(i - 1))
          if (best(i - 1) != Double.NegativeInfinity) {
            best(i) = best(i - 1) + ByteScore * w
            cnt(i) = cnt(i - 1) + w
          }
          byEnd.getOrElse(i, Array.empty[(String, Int, Int, Double)])
            .foreach { c =>
              val l = c._3
              if (best(i - l) != Double.NegativeInfinity) {
                val s = best(i - l) + c._4
                if (s > best(i)) { best(i) = s; cnt(i) = cnt(i - l) + 1 }
              }
            }
          i += 1
        }
        (word, cnt(n))
      }.toDF("word", "n_pieces")
  }

  /** Per-word byte-fallback SEGMENTATION — the piece sequences
    * behind [[tokenizeByteFallback]]'s counts: vocab pieces verbatim,
    * fallback bytes as `<0xNN>` tokens (one per UTF-8 byte, the
    * SentencePiece rendering). [[detokenize]] inverts it exactly. */
  def segmentPiecesByteFallback(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 4): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val w = words.select(col("word")).distinct()
      .withColumn("freq", lit(1L))
    val total = vocab.agg(sum(col("cnt")).cast("double").as("__total"))
    val scored = vocab.crossJoin(broadcast(total))
      .select(col("piece"),
        round(log(col("cnt").cast("double") / col("__total")), 9)
          .as("score"))
    val cand = candidates(w, maxPieceLen).join(scored, Seq("piece"))
      .select(col("word"), col("pos"), col("len"), col("score"),
        col("piece"))
      .as[(String, Int, Int, Double, String)]
    val segmented = cand.groupByKey(_._1).mapGroups { (word, it) =>
      val rows = it.toArray
      val cps = word.codePoints.toArray
      val n = cps.length
      val byEnd = rows.groupBy(r => r._2 + r._3 - 1)
        .map { case (e, rs) => e -> rs.sortBy(_._3) }
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val path = Array.fill[List[String]](n + 1)(Nil)
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        val wd = utf8Width(cps(i - 1))
        if (best(i - 1) != Double.NegativeInfinity) {
          best(i) = best(i - 1) + ByteScore * wd
          // paths build head-first (consumed by one final reverse):
          // this code point's byte tokens push onto path(i-1) in
          // byte order, so they pop back out in order after reverse
          path(i) = new String(Character.toChars(cps(i - 1)))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .map(b => f"<0x${b & 0xff}%02X>")
            .foldLeft(path(i - 1))((acc, t) => t :: acc)
        }
        byEnd.getOrElse(i, Array.empty[(String, Int, Int, Double, String)])
          .foreach { c =>
            val l = c._3
            if (best(i - l) != Double.NegativeInfinity) {
              val s = best(i - l) + c._4
              if (s > best(i)) { best(i) = s; path(i) = c._5 :: path(i - l) }
            }
          }
        i += 1
      }
      (word, path(n).reverse)
    }.toDF("word", "pieces")
    // words with NO candidate rows (pure byte paths) never reach the
    // DP — synthesize their all-bytes segmentation
    val missing = w.select("word")
      .join(segmented.select("word"), Seq("word"), "left_anti")
      .as[String].map { word =>
        (word, word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => f"<0x${b & 0xff}%02X>").toSeq)
      }.toDF("word", "pieces")
    segmented.unionByName(missing)
  }

  /** Invert [[segmentPiecesByteFallback]]: vocab pieces contribute
    * their characters, `<0xNN>` byte tokens their bytes — adjacent
    * byte runs decode as one UTF-8 sequence. Total: any token list
    * the segmenter emits rebuilds the exact input string. */
  def detokenize(pieces: Seq[String]): String = {
    val ByteTok = "<0x([0-9A-F]{2})>".r
    val out = new java.io.ByteArrayOutputStream()
    pieces.foreach {
      case ByteTok(h) => out.write(Integer.parseInt(h, 16))
      case p => out.write(
        p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
