package graft

import graft.ops.{Dedup, TextAnalysis}

import org.apache.spark.sql.functions._

/** PassJoin edit-distance join: exactness against brute force
  * (the blocking must have ZERO false negatives — the oracle is
  * all-pairs), plus the collocation scorer.
  */
class EditDistanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def bruteForce(strs: Seq[(Long, String)]): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && sa.length >= 2 && sb.length >= 2
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
  }

  test("editDistancePairs finds substitutions, insertions and deletions in either half") {
    val strs = Seq(
      1L -> "abcdefgh",
      2L -> "abcdefgX", // substitution in segment 1
      3L -> "Xbcdefgh", // substitution in segment 0
      4L -> "abcdefghZ", // append (length +1)
      5L -> "bcdefgh",   // delete first char (shifts segment 0)
      6L -> "abcdXefgh", // insert mid-string (shifts segment 1)
      7L -> "zzzzzzzz"   // unrelated
    )
    val out = Dedup.editDistancePairs(strs.toDF("id", "s"), "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == bruteForce(strs))
    assert(out.contains((1L, 2L, 1)) && out.contains((1L, 3L, 1)) &&
      out.contains((1L, 4L, 1)) && out.contains((1L, 5L, 1)) && out.contains((1L, 6L, 1)))
    assert(!out.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("editDistancePairs ≡ brute force on randomized corpora (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    for (round <- 1 to 3) {
      val strs = (1L to 60L).map { i =>
        val len = 2 + rnd.nextInt(7)
        i -> Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val out = Dedup.editDistancePairs(strs.toDF("id", "s"), "id", "s")
        .as[(Long, Long, Int)].collect().toSet
      assert(out == bruteForce(strs), s"round $round diverged from brute force")
    }
  }

  test("lev_at_most ≡ min(levenshtein, k+1) on randomized strings, every k") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 300).map { _ =>
      def mk = Seq.fill(rnd.nextInt(12))("abcd".charAt(rnd.nextInt(4))).mkString
      (mk, mk)
    }
    val df = pairs.toDF("a", "b")
    for (k <- 0 to 3) {
      val bad = df.select(
          expr(s"lev_at_most(a, b, $k)").as("banded"),
          least(levenshtein(col("a"), col("b")), lit(k + 1)).as("full"))
        .filter(col("banded") =!= col("full")).count()
      assert(bad == 0L, s"banded kernel diverged from levenshtein at k=$k")
    }
  }

  test("bpeTrain learns merges by weighted pair frequency, composing earlier merges") {
    // corpus: "abab" x3, "abc" x2, "dd" x1
    // step 1: pairs (a,b):3*2+2=8, (b,a):3, (b,c):2, (d,d):1 → merge (a,b)
    // step 2: symbols now ab|ab, ab|c, d|d → (ab,ab):3, (ab,c):2, (d,d):1
    //         → merge (ab,ab) — a COMPOSED merge of the step-1 symbol
    val df = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc") :+ "dd").toDF("text")
    val merges = graft.ops.TextAnalysis.bpeTrain(df, "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(merges(0) == ((1, "a", "b", 8L)))
    assert(merges(1) == ((2, "ab", "ab", 3L)))
    assert(merges(2) == ((3, "ab", "c", 2L)))
  }

  test("bpeEncodeCounts applies merges in order, composing symbols") {
    val df = Seq((1L, "abab"), (2L, "abc"), (3L, "dd ab")).toDF("id", "text")
    // merges: (a,b) then (ab,ab) → "abab"=1 symbol, "abc"=2 (ab+c),
    // "dd"=2 (no d merge), "ab"=1
    val out = graft.ops.TextAnalysis
      .bpeEncodeCounts(df, "id", "text", Seq(("a", "b"), ("ab", "ab")))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 2L, 3L)))
  }

  test("bpeTrain breaks count ties lexicographically (deterministic training)") {
    // "xy" and "zw" both appear twice → tie at 2, (x,y) < (z,w)
    val df = Seq("xy", "zw", "xy", "zw").toDF("text")
    val merges = graft.ops.TextAnalysis.bpeTrain(df, "text", nMerges = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(merges(0) == ((1, "x", "y", 2L)))
    assert(merges(1) == ((2, "z", "w", 2L)))
  }

  test("bpeTokenize emits per-doc token-id sequences that DECODE back to the text words") {
    val df = Seq((1L, "abab abc"), (2L, "dd ab abab")).toDF("id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val vocab = graft.ops.TextAnalysis.bpeTokenVocab(df, "text", merges)
      .as[(String, Int)].collect().toMap.map(_.swap) // tid -> sym
    // vocab = final symbols {abab, ab, c, d} ranked lexicographically
    assert(vocab.values.toSet == Set("abab", "ab", "c", "d"))
    val out = graft.ops.TextAnalysis.bpeTokenize(df, "id", "text", merges)
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
    // round trip: ids -> symbols -> concatenated words == whitespace words
    val decoded = out.map { case (id, n, ids) =>
      assert(n == ids.length)
      id -> ids.map(vocab)
    }.toMap
    // doc 1: "abab"->[abab], "abc"->[ab, c]; doc 2: "dd"->[d, d], "ab"->[ab], "abab"->[abab]
    assert(decoded(1L) == Seq("abab", "ab", "c"))
    assert(decoded(2L) == Seq("d", "d", "ab", "abab"))
    assert(decoded(1L).mkString == "ababab" + "c")
    assert(decoded(2L).mkString == "ddababab")
  }

  test("collocations scores association vs independence exactly") {
    // corpus: "a b" ×3, "a c" ×1 → N=8; n(a)=4, n(b)=3, n(c)=1
    // assoc(a,b) = 3·8/(4·3) = 2.0 ; assoc(a,c) = 1·8/(4·1) = 2.0
    val df = (Seq.fill(3)("a b") :+ "a c").toDF("text")
    val out = TextAnalysis.collocations(df, "text", minCount = 1)
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(("a", "b", 3L, 2.0), ("a", "c", 1L, 2.0)))
  }
}
