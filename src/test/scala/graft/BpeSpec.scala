package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeEncode
import graft.text.Bpe

/** The BPE tokenizer: trainer semantics on a hand corpus, the
  * codegen'd encoder against an independent reference, and the
  * separator-string replay the DuckDB oracle uses (two replaces per
  * rank) — all three formulations must be bit-identical. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: rank-loop greedy on token lists. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var toks = word.map(_.toString).toList
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = toks
      while (rest.nonEmpty) rest match {
        case x :: y :: t if x == a && y == b => out += (a + b); rest = t
        case x :: t => out += x; rest = t
        case Nil => ()
      }
      toks = out.toList
    }
    toks
  }

  /** The oracle's formulation: separator string, 2× replace per rank. */
  private def sqlReplayEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var s = "|" + word.map(c => s"$c|").mkString
    for ((a, b) <- merges) {
      val pat = s"|$a|$b|"; val rep = s"|$a$b|"
      s = s.replace(pat, rep).replace(pat, rep)
    }
    s.split('|').filter(_.nonEmpty).toSeq
  }

  test("trainer learns count-weighted merges on a hand corpus") {
    // "abab" x3, "abc" x2: pair counts (a,b)=8, (b,a)=3, (b,c)=2
    // -> rank1 = (a,b). Then (ab,ab)=3, (ab,c)=2 -> rank2 = (ab,ab)?
    // no: self-pairs are EXCLUDED, so rank2 = (ab,c).
    val docs = Seq("abab abab", "abab abc", "abc").toDF("text")
    val merges = Bpe.train(docs, "text", 2)
    assert(merges === Seq(("a", "b"), ("ab", "c")))
  }

  test("trainer stops when nothing is mergeable") {
    val docs = Seq("aa aa", "b").toDF("text") // only self-pairs remain
    assert(Bpe.train(docs, "text", 5) === Seq.empty)
  }

  test("encoder equals reference and SQL replay on every corpus word") {
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(Bpe.words($"text")).as("w")).distinct()
      .withColumn("toks", Bpe.encode($"w"))
      .as[(String, Seq[String])].collect()
    assert(words.nonEmpty)
    for ((w, got) <- words) {
      assert(got === refEncode(w, Bpe.merges), s"greedy-ref mismatch on '$w'")
      assert(got === sqlReplayEncode(w, Bpe.merges),
        s"SQL-replay mismatch on '$w' — the oracle would diverge")
    }
    // tokens must concatenate back to the word (no loss, no invention)
    for ((w, got) <- words) assert(got.mkString === w)
  }

  test("replay equivalence holds on adversarial shapes, not just corpus words") {
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "b"), ("ab", "ab"))
      .filter { case (a, b) => a != b } // (ab,ab) dropped like the trainer does
    val hard = Seq("ththth", "thethethe", "ababab", "tthhee", "x", "",
      "abababababab", "ththththth", "theabthe")
    for (w <- hard) {
      assert(refEncode(w, merges) === sqlReplayEncode(w, merges),
        s"divergence on '$w'")
    }
    // and the expression agrees with both
    val got = hard.filter(_.nonEmpty).toDF("w")
      .select($"w", BpeEncode.of($"w", merges).as("t"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- hard if w.nonEmpty)
      assert(got(w) === refEncode(w, merges), s"expression mismatch on '$w'")
  }

  test("self-pair merges are refused at construction") {
    intercept[IllegalArgumentException] {
      BpeEncode.of(lit("aaa"), Seq(("a", "a")))
    }
  }

  test("fixture invariants: non-empty, no self-pairs, encodes corpus words whole") {
    assert(Bpe.merges.size === 64)
    assert(Bpe.merges.forall { case (a, b) => a != b })
    val enc = Seq("customer", "table", "value", "key").toDF("w")
      .select(Bpe.encode($"w")).as[Seq[String]].collect()
    assert(enc.forall(_.size === 1),
      "top corpus words must be single fixture tokens")
  }
}
