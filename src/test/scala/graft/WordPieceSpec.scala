package graft

import graft.scorer.WordPieceVocab

import org.scalatest.funsuite.AnyFunSuite

/** WordPiece loader round-trip against the committed tiny vocab
  * fixture (`src/test/resources/wordpiece/vocab.txt`): greedy
  * longest-match, `##` continuations, whole-word [UNK] degradation,
  * pair layout, and the QA char-offset geometry that maps decoded
  * token spans back to exact answer substrings.
  */
class WordPieceSpec extends AnyFunSuite {

  private val vocab = WordPieceVocab.load(
    getClass.getResource("/wordpiece/vocab.txt").getPath)

  private def pieces(ids: Array[Long]): Seq[String] =
    ids.toSeq.map(i => vocab.tokenOf(i.toInt))

  test("fixture loads with the conventional special layout") {
    assert(vocab.padId === 0 && vocab.unkId === 1 && vocab.clsId === 2 && vocab.sepId === 3)
    assert(vocab.idOf("##s").nonEmpty)
  }

  test("greedy longest match prefers the whole word over its pieces") {
    // "report" exists whole AND as re + ##port — whole token wins
    assert(pieces(vocab.encode("report")) === Seq("report"))
    assert(pieces(vocab.encode("reports")) === Seq("report", "##s"))
    assert(pieces(vocab.encode("reporting")) === Seq("report", "##ing"))
    assert(pieces(vocab.encode("unaffable")) === Seq("un", "##aff", "##able"))
  }

  test("a word with no decomposition degrades WHOLE to [UNK], not a suffix") {
    // "zebra": no 'z...' root piece → one UNK even though ##able exists
    assert(pieces(vocab.encode("zebra")) === Seq("[UNK]"))
    // surrounding known words are unaffected
    assert(pieces(vocab.encode("the zebra sat")) === Seq("the", "[UNK]", "sat"))
  }

  test("basic tokenization lowercases and splits punctuation as single tokens") {
    assert(pieces(vocab.encode("The cat, on.")) ===
      Seq("the", "cat", ",", "on", "."))
  }

  test("encodePair lays out [CLS] q [SEP] p [SEP]") {
    assert(pieces(vocab.encodePair("the cat", "sat on the mat")) ===
      Seq("[CLS]", "the", "cat", "[SEP]", "sat", "on", "the", "mat", "[SEP]"))
  }

  test("QA encoding offsets recover exact answer substrings from the ORIGINAL text") {
    val ctx = "The Climate reports, net zero target."
    val e   = vocab.encodeQa("the target", ctx)
    assert(pieces(e.ids) === Seq("[CLS]", "the", "target", "[SEP]",
      "the", "climate", "report", "##s", ",", "net", "zero", "target", ".", "[SEP]"))
    assert(e.contextStart === 4)
    def answer(s: Int, en: Int): String = {
      val from = e.contextTokenOffsets(s - e.contextStart)._1
      val to   = e.contextTokenOffsets(en - e.contextStart)._2
      ctx.substring(from, to)
    }
    // token span over [climate .. ##s] recovers original-case text,
    // piece boundaries land INSIDE the word correctly
    assert(answer(5, 7) === "Climate reports")
    assert(answer(6, 6) === "report")  // the 'report' piece of "reports"
    assert(answer(9, 11) === "net zero target")
  }

  test("round-trip: every non-UNK piece id maps back to a vocab token that re-encodes to itself") {
    val ids = vocab.encode("the cat sat on the mat , reporting net zero .")
    assert(!ids.contains(vocab.unkId.toLong))
    val rejoined = pieces(ids).map(p => p.stripPrefix("##"))
    assert(rejoined.mkString("") === "thecatsatonthemat,reportingnetzero.")
  }
}
