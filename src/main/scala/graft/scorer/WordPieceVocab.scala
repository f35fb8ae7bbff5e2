package graft.scorer

/** WordPiece tokenizer + vocab loader fulfilling the [[OnnxScorer]]
  * `encode` contracts out of the box (the reference's models are BERT
  * cross-encoders; their tokenization is greedy longest-match
  * WordPiece over a `vocab.txt` of one token per line, `##`-prefixed
  * continuation pieces — reference: the FARM tokenizer the inference
  * stack at src/models/relevance_infer.py / text_kpi_infer.py loads
  * with its exported model).
  *
  * Semantics implemented (and their limits, stated):
  *   - basic tokenization: words split on whitespace, punctuation
  *     split into single-char tokens, lowercased CHAR-BY-CHAR
  *     (`Character.toLowerCase` — 1:1, so char offsets into the
  *     original string survive; locale multi-char case mappings are
  *     out of scope for this loader);
  *   - greedy longest-match pieces per word, `##` continuations, a
  *     word with no decomposition → one `[UNK]` (BERT semantics: the
  *     WHOLE word degrades, not a suffix);
  *   - pair encoding `[CLS] a [SEP] b [SEP]`, and a QA encoding that
  *     carries per-context-token char offsets so a decoded span maps
  *     back to exact answer text ([[QaEncoding]]).
  *
  * Everything is pure JVM and `Serializable` — built driver-side
  * (vocab-sized), shipped in task closures like every other scorer.
  */
final class WordPieceVocab private (val tokens: IndexedSeq[String]) extends Serializable {

  private val ids: Map[String, Int] = tokens.zipWithIndex.toMap
  require(ids.size == tokens.size, "duplicate tokens in WordPiece vocab")

  val padId: Int = ids.getOrElse("[PAD]", 0)
  val unkId: Int = ids.getOrElse("[UNK]", 0)
  val clsId: Int = ids.getOrElse("[CLS]", 0)
  val sepId: Int = ids.getOrElse("[SEP]", 0)

  def size: Int = tokens.length
  def idOf(token: String): Option[Int] = ids.get(token)
  def tokenOf(id: Int): String = tokens(id)

  private def isPunct(c: Char): Boolean =
    !Character.isLetterOrDigit(c) && !Character.isWhitespace(c)

  /** Basic tokens with char offsets: (lowercased token, start, end). */
  def basicTokens(text: String): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (isPunct(c)) {
        out += ((String.valueOf(Character.toLowerCase(c)), i, i + 1)); i += 1
      } else {
        val s = i
        while (i < n && !Character.isWhitespace(text.charAt(i)) && !isPunct(text.charAt(i))) i += 1
        out += ((text.substring(s, i).map(Character.toLowerCase), s, i))
      }
    }
    out.toSeq
  }

  /** Greedy longest-match pieces of one (lowercased) word:
    * (piece id, relStart, relEnd) in word-relative chars. A word with
    * no full decomposition collapses to one `[UNK]` spanning it.
    */
  def wordPieceSpans(word: String): Seq[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var start = 0
    while (start < word.length) {
      var end   = word.length
      var found = -1
      while (end > start && found < 0) {
        val piece = (if (start > 0) "##" else "") + word.substring(start, end)
        ids.get(piece) match {
          case Some(id) => found = id
          case None     => end -= 1
        }
      }
      if (found < 0) return Seq((unkId, 0, word.length))
      out += ((found, start, end))
      start = end
    }
    out.toSeq
  }

  /** Piece ids of free text (no specials). */
  def encode(text: String): Array[Long] =
    basicTokens(text).iterator
      .flatMap { case (w, _, _) => wordPieceSpans(w).map(_._1.toLong) }
      .toArray

  /** The [[OnnxRelevanceScorer]] `encode` contract:
    * `[CLS] question [SEP] paragraph [SEP]`.
    */
  def encodePair(question: String, paragraph: String): Array[Long] =
    (clsId.toLong +: encode(question) :+ sepId.toLong) ++
      encode(paragraph) :+ sepId.toLong

  /** The [[OnnxQaScorer]] `encode` contract: pair ids + per-context-
    * token char offsets into the ORIGINAL context string.
    */
  def encodeQa(question: String, context: String): QaEncoding = {
    val q = encode(question)
    val ctx = basicTokens(context).flatMap { case (w, s, _) =>
      wordPieceSpans(w).map { case (id, rs, re) => (id.toLong, s + rs, s + re) }
    }
    val ids = (clsId.toLong +: q :+ sepId.toLong) ++ ctx.map(_._1) :+ sepId.toLong
    QaEncoding(ids, q.length + 2, ctx.map(t => (t._2, t._3)).toArray)
  }
}

object WordPieceVocab {

  /** The specials every vocab built with [[fromTokens]] should lead
    * with (ids 0..3, the conventional BERT layout).
    */
  val Specials: Seq[String] = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]")

  def fromTokens(tokens: Seq[String]): WordPieceVocab =
    new WordPieceVocab(tokens.toIndexedSeq)

  /** Load a standard `vocab.txt`: one token per line, id = line index.
    * Blank trailing lines are dropped; interior lines load verbatim
    * (minus a trailing CR) because real vocabs contain
    * whitespace-significant pieces.
    */
  def load(path: String): WordPieceVocab = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val lines = src.getLines().map(_.stripSuffix("\r")).toIndexedSeq
      fromTokens(lines.reverse.dropWhile(_.isEmpty).reverse)
    } finally src.close()
  }
}
