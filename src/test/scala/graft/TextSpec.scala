package graft

import graft.text.TextStats

class TextSpec extends SparkSpecBase {
  import spark.implicits._

  test("langId classifies real-language sentences") {
    val d = Seq(
      (0L, "the cat is on the mat and the dog is here", "en"),
      (1L, "der hund ist gross und die katze ist klein", "de"),
      (2L, "el perro es grande y la casa es bonita que bien", "es"),
      (3L, "le chien est grand et les chats sont petits", "fr"),
      (4L, "我是学生，他是老师，我们在学校。", "zh"),
      (5L, "zzzz qqqq xxxx wwww", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextStats.langId(d).collect()
    val preds = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(0L) == "en")
    assert(preds(1L) == "de")
    assert(preds(2L) == "es")
    assert(preds(3L) == "fr")
    assert(preds(4L) == "zh")
    assert(preds(5L) == "und")
  }

  test("tokenStats counts whitespace tokens and uniques") {
    val d = Seq((0L, "a b b c", 7L)).toDF("doc_id", "text", "n_chars")
    val r = TextStats.tokenStats(d).collect()(0)
    assert(r.getInt(1) == 4 && r.getInt(2) == 3 && r.getInt(3) == 7)
  }

  test("fingerprint matches a hand-rolled rolling hash") {
    val d = Seq((0L, "ab")).toDF("doc_id", "text")
    val fp = TextStats.fingerprint(d).collect()(0).getLong(1)
    val expected = (('a'.toInt.toLong * 31) + 'b'.toInt) % 1000000007L
    assert(fp == expected)
  }

  test("bpeTokenCount splits on word boundaries") {
    val d = Seq((0L, "hello, world!")).toDF("doc_id", "text")
    // tokens: hello , ' ' world ! -> 5 non-empty pieces
    assert(TextStats.bpeTokenCount(d).collect()(0).getInt(1) == 5)
  }
}
