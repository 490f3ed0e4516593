package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fns

/** Tokenizer semantics of the reference word-count app
  * (`/root/reference/src/mrapps/wc.go:21-34`): split on any non-letter,
  * digits are separators, case-sensitive, empties dropped. */
class TokenizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(filter(Fns.tokensArr(col("text")), w => w =!= lit("")).as("t"))
      .as[Seq[String]].head()

  test("digits split words") {
    assert(tok("abc123def") === Seq("abc", "def"))
  }
  test("punctuation and spaces split words") {
    assert(tok("a.b, c  d") === Seq("a", "b", "c", "d"))
  }
  test("case is preserved (case-sensitive counting)") {
    assert(tok("Ab aB") === Seq("Ab", "aB"))
  }
  test("empty tokens dropped at both ends") {
    assert(tok(" 7x9 ") === Seq("x"))
    assert(tok("") === Seq.empty)
    assert(tok("123 456") === Seq.empty)
  }
  private def tokU(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(filter(Fns.tokensArrUnicode(col("text")), w => w =!= lit("")).as("t"))
      .as[Seq[String]].head()

  test("unicode tokenizer keeps accented/Greek/CJK letters (wc.go IsLetter)") {
    assert(tokU("Füße im Êtang 123 ναι") === Seq("Füße", "im", "Êtang", "ναι"))
    assert(tokU("日本語 text—mixed, ok?") === Seq("日本語", "text", "mixed", "ok"))
    // on pure ASCII it agrees with the fixture tokenizer
    val samples = Seq("the fast key 9 order", "a.b,c", "Zz 42 yY")
    samples.foreach(s => assert(tokU(s) === tok(s), s"input: '$s'"))
  }

  test("matches the plain-Scala tokenizer used by the MR API apps") {
    val samples = Seq("the fast key 9 order", "a.b,c", "", "Zz 42 yY")
    samples.foreach { s =>
      assert(tok(s) === s.split("[^a-zA-Z]+").toSeq.filter(_.nonEmpty), s"input: '$s'")
    }
  }
}
