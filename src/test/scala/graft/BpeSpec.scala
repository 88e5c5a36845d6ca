package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Bpe

/** BPE subword tokenizer: deterministic training, encode equivalence
  * to the reference lowest-rank-first algorithm, honest token
  * accounting. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** the reference algorithm: repeatedly merge the LOWEST-RANK pair
    * present anywhere in the word (left-to-right within a rank),
    * until none applies — the loop HF/GPT tokenizers run. */
  private def referenceEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var continue = true
    while (continue && syms.length >= 2) {
      val present = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (present.isEmpty) continue = false
      else {
        val (r, _) = present.minBy(_._1)
        val (a, b) = merges(r)
        // merge all occurrences of (a, b), left to right
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  test("training learns the most frequent pairs with deterministic " +
      "tie-breaks and stops when no pair remains") {
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "new newer newest low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 3)
    assert(merges.length == 3)
    // "lo" + "w" dominate: 'l','o' adjacent in every low* word (6
    // occurrences), then ('lo','w') — the classic example
    assert(merges.head == ("l", "o"))
    assert(merges(1) == ("lo", "w"))
    // tiny corpus with no repeatable pair: training stops early
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    val m1 = Bpe.train(one, nMerges = 5)
    assert(m1.isEmpty) // all words are single chars — no pairs at all
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("local BPE training equals the distributed loop merge for " +
      "merge: greedy same-symbol runs, byte ties, early stop") {
    // merge-run-heavy corpus: 'aaaa' stresses left-to-right
    // non-overlapping replace (greedy pairing 'aa aa', never 'a aa a'),
    // repeated suffixes give deep merge chains, and equal-count pairs
    // exercise the binary-order tie-break. The local path (fused probe
    // + plain-Scala loop) must emit the identical ranked merges as the
    // distributed rounds (forced via localMaxVocab = 0).
    val docs = Seq(
      (1L, "aaaa aaa aa banana bandana low lower lowest lowest"),
      (2L, "aaaa banana cabana low low newest fewest zest zest"),
      (3L, "mississippi missive misses aaaa aa zest be bee beet"))
      .toDF("doc_id", "text")
    for (n <- Seq(0, 1, 5, 12, 40)) {
      val local = Bpe.train(docs, nMerges = n)
      val dist = Bpe.train(docs, nMerges = n, localMaxVocab = 0)
      assert(local == dist, s"nMerges=$n: $local vs $dist")
    }
    // and past the bound the same call falls back to the distributed
    // loop (vocab here is > 2 words)
    val fb = Bpe.train(docs, nMerges = 5, localMaxVocab = 2)
    assert(fb == Bpe.train(docs, nMerges = 5, localMaxVocab = 0))
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("rank-order replace encoding equals the reference " +
      "lowest-rank-first algorithm on random words") {
    val docs = Seq(
      (1L, "the theatre then there therefore other mother"),
      (2L, "banana bandana ananas banal the there"),
      (3L, "aaaa aaab abab baaa the other then")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 10)
    assert(merges.nonEmpty)
    // random words over the trained alphabet, plus the corpus's own
    val rnd = new scala.util.Random(23)
    val alphabet = "abehnorst"
    val words = (0 until 200).map(_ =>
      (0 to rnd.nextInt(10)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("the", "theatre", "banana", "aaaa", "abab", "x", "")
    val wdf = words.filter(_.nonEmpty).distinct.toDF("w")
    val got = wdf.select(col("w"),
        Bpe.symbolCount(Bpe.applyMerges(Bpe.initEnc(col("w")), merges))
          .as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.filter(_.nonEmpty).distinct.foreach { w =>
      val want = referenceEncode(w, merges).length
      assert(got(w) == want,
        s"word '$w': rank-order gave ${got(w)}, reference $want " +
          s"(merges $merges)")
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("native encode loop equals the reference algorithm AND the " +
      "replace chain on random words — including at R=1k, past the " +
      "replace chain's codegen scale") {
    import graft.functions.{BpeTable, BpeTokenCount}
    // small trained table: native == reference == replace chain
    val docs = Seq(
      (1L, "the theatre then there therefore other mother"),
      (2L, "banana bandana ananas banal the there"),
      (3L, "aaaa aaab abab baaa the other then")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 10)
    val table = new BpeTable(merges)
    val rnd = new scala.util.Random(41)
    val alphabet = "abehnorst"
    val words = ((0 until 300).map(_ =>
      (0 to rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("the", "theatre", "banana", "aaaa", "abab", "x"))
      .filter(_.nonEmpty).distinct
    val chain = words.toDF("w").select(col("w"),
        Bpe.symbolCount(Bpe.applyMerges(Bpe.initEnc(col("w")), merges))
          .as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.foreach { w =>
      val native = BpeTokenCount.encode(w, table)
      assert(native.toSeq == referenceEncode(w, merges),
        s"word '$w' vs reference")
      assert(native.length == chain(w), s"word '$w' vs replace chain")
    }
    // R=1k-scale table (trained on a synthetic corpus with deep merge
    // structure) — the replace chain cannot codegen here; the native
    // loop must still match the driver-side reference exactly
    val rnd2 = new scala.util.Random(59)
    val bigAlphabet = "abcdefghijklmnop"
    val bigWords = (0 until 4000).map(_ =>
      (0 until 3 + rnd2.nextInt(9)).map(_ =>
        bigAlphabet(rnd2.nextInt(bigAlphabet.length))).mkString)
    val bigDocs = bigWords.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val bigMerges = Bpe.train(bigDocs, nMerges = 1000)
    assert(bigMerges.length == 1000, s"trained ${bigMerges.length}")
    val bigTable = new BpeTable(bigMerges)
    val probeWords = (bigWords.distinct.take(400) ++
      (0 until 200).map(_ => (0 until 2 + rnd2.nextInt(14)).map(_ =>
        bigAlphabet(rnd2.nextInt(bigAlphabet.length))).mkString))
      .distinct
    probeWords.foreach { w =>
      assert(BpeTokenCount.encode(w, bigTable).toSeq ==
        referenceEncode(w, bigMerges), s"R=1k word '$w'")
    }
    // and end-to-end through the codegen'd expression on a DataFrame
    val viaExpr = probeWords.toDF("w")
      .select(col("w"),
        graft.functions.BpeFunctions.bpeCount(col("w"), bigMerges)
          .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probeWords.foreach { w =>
      assert(viaExpr(w) == referenceEncode(w, bigMerges).length.toLong,
        s"R=1k expression word '$w'")
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("encodeIds emits vocab ids in document order, matching a " +
      "driver reference encode token for token, with sum(len) == " +
      "tokenCounts") {
    val docs = Seq(
      (1L, "low lower, low! the theatre"),
      (2L, "banana bandana: the lowest..."),
      (3L, "..."),
      (4L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 6)
    assert(merges.nonEmpty)
    val vv = Bpe.vocab(docs, merges)
    // vocab structure: base single-code-point symbols in UTF-8 byte
    // order, then merge outputs in rank order
    val nBase = vv.indexWhere(s => s.codePointCount(0, s.length) > 1)
    val base = vv.take(nBase)
    assert(base == base.sorted, s"base not byte-ordered: $base")
    assert(vv.drop(nBase) == merges.map { case (a, b) => a + b }.distinct)
    val idOf = vv.zipWithIndex.toMap
    // driver reference: same word|punct pre-tokenization, reference
    // encode per word, direct vocab lookup per punct char
    val tokRe = java.util.regex.Pattern.compile(
      Bpe.WordRe + "|" + Bpe.PunctRe)
    def refIds(text: String): Seq[Int] = {
      val m = tokRe.matcher(text.toLowerCase)
      val out = Seq.newBuilder[Int]
      while (m.find()) {
        val t = m.group()
        if ((t.head >= 'a' && t.head <= 'z')
            || (t.head >= '0' && t.head <= '9') || t.head == '_')
          referenceEncode(t, merges).foreach(s => out += idOf(s))
        else out += idOf(t)
      }
      out.result()
    }
    val got = Bpe.encodeIds(docs, merges, vv)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, text) =>
      assert(got(id) == refIds(text), s"doc $id")
      assert(got(id).forall(_ >= 0),
        s"doc $id: corpus-built vocab must never emit OOV")
    }
    // the id sequence's length IS the bpe token count
    val counts = Bpe.tokenCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, _) =>
      assert(got(id).length.toLong == counts(id), s"doc $id")
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("decodeIds inverts encodeIds to the whitespace-stripped " +
      "lowercased normal form; out-of-range ids decode to U+FFFD") {
    val docs = Seq(
      (1L, "Hello, World!  Mixed\tWS\nand CASE."),
      (2L, ""),
      (3L, "banana bandana band"),
      (4L, "...!!  ")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 6)
    val vv = Bpe.vocab(docs, merges)
    val dec = Bpe.decodeIds(Bpe.encodeIds(docs, merges, vv), vv)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val norm = docs.select(col("doc_id"),
        array_join(regexp_extract_all(lower(col("text")),
          lit(Bpe.WordRe + "|" + Bpe.PunctRe), lit(0)), "").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec == norm)
    assert(dec(2L) == "") // empty doc round-trips to empty
    // decode is TOTAL: OOV (-1), a special token (vocab size — e.g.
    // packSequences' EOS), and any out-of-range id map to U+FFFD
    val weird = Seq((9L, Array(-1, 0, vv.length, 1 << 20)))
      .toDF("doc_id", "bpe_ids")
    val d = Bpe.decodeIds(weird, vv).collect()(0).getString(1)
    assert(d == "\uFFFD" + vv.head + "\uFFFD\uFFFD")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("BpeTable rejects non-self-trained merge tables at " +
      "construction and the registered builders validate arity") {
    import graft.functions.{BpeFunctions, BpeTable, BpeVocab}
    // the ADVICE counter-example: rank 0 references 'ab', first
    // produced at rank 1 — lowest-rank-first would diverge from the
    // rank-order replace chain on 'abc'
    val e = intercept[IllegalArgumentException] {
      new BpeTable(Seq(("ab", "c"), ("a", "b")))
    }
    assert(e.getMessage.contains("self-trained"), e.getMessage)
    // a multi-char element NO merge produces is a harmless no-op pair
    new BpeTable(Seq(("zz", "q"), ("a", "b")))
    // self-trained order is accepted
    new BpeTable(Seq(("a", "b"), ("ab", "c")))
    // SQL-text arity errors are analysis-time messages, not internal
    // NoSuchElementExceptions
    val table = new BpeTable(Seq(("a", "b")))
    val cname = BpeFunctions.register(spark, table)
    val a1 = intercept[Exception] {
      spark.sql(s"SELECT $cname()").collect()
    }
    assert(a1.getMessage.contains("argument"), a1.getMessage)
    val iname = BpeFunctions.registerIds(spark, table,
      new BpeVocab(Seq("a", "b", "ab")))
    val a2 = intercept[Exception] {
      spark.sql(s"SELECT $iname('x', 'y')").collect()
    }
    assert(a2.getMessage.contains("argument"), a2.getMessage)
  }

  test("trained naive-Bayes language ID separates languages with real " +
      "character signal, including on held-out text") {
    // NB: the testdata documents table draws the SAME vocabulary for
    // every lang label (no character-level signal — self-scoring
    // accuracy there is the prior's ~54% by construction; measured),
    // so the accuracy check runs on a corpus with genuine per-language
    // character distributions. The oracle entry t_langid_model covers
    // cross-engine exactness on the real table.
    import graft.pipeline.TextOps
    val vocab = Map(
      "aa" -> Seq("kala", "talo", "puhua", "paljon", "kaunis", "vesi"),
      "bb" -> Seq("strom", "pravda", "zdroj", "vrstva", "hlavni", "dvur"),
      "cc" -> Seq("ohayo", "tenki", "sushi", "kimono", "haiku", "onsen"))
    val rnd = new scala.util.Random(31)
    def doc(lang: String) =
      (0 until 12).map(_ => vocab(lang)(rnd.nextInt(6))).mkString(" ")
    val rows = (0 until 240).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      (i.toLong, lang, doc(lang))
    }
    val (trainRows, heldOut) = rows.splitAt(180)
    val train = trainRows.toDF("doc_id", "lang", "text")
    val model = TextOps.trainLangId(train)
    def accuracy(df: org.apache.spark.sql.DataFrame): Double = {
      val scored = TextOps.langIdScore(df, model)
        .join(df.select(col("doc_id"), col("lang")), Seq("doc_id"))
      scored.where(col("lang_pred") === col("lang")).count().toDouble /
        scored.count()
    }
    assert(accuracy(train) >= 0.98, s"train accuracy ${accuracy(train)}")
    assert(accuracy(heldOut.toDF("doc_id", "lang", "text")) >= 0.95)
    // unseen text scores via fallbacks, empty text via priors —
    // deterministic, never null
    val odd = Seq((900001L, "zzz qqq unseen"), (900002L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.langIdScore(odd, model).collect()
    assert(got.length == 2 && got.forall(!_.isNullAt(2)))
  }

  test("the NB classifier is label-generic: trained clean-vs-garbled " +
      "quality filtering works through the same trainLangId face") {
    // the production quality filter (fastText-style classifier over
    // character n-grams, CCNet/RefinedWeb lineage) IS this model with
    // a quality label column instead of a language one — the label
    // column is generic by construction; this spec documents and pins
    // that second face. Garbled text (keyboard mash, char soup) has a
    // sharply different trigram distribution from running prose.
    import graft.pipeline.TextOps
    val cleanWords = Seq("the", "water", "flows", "over", "stone",
      "and", "light", "rests", "on", "morning", "fields", "with")
    val rnd = new scala.util.Random(47)
    def clean() =
      (0 until 14).map(_ => cleanWords(rnd.nextInt(12))).mkString(" ")
    def garbled() = (0 until 14).map { _ =>
      (0 until 6).map(_ => "qxzvkjwf" (rnd.nextInt(8))).mkString
    }.mkString(" ")
    val rows = (0 until 200).map { i =>
      if (i % 2 == 0) (i.toLong, "keep", clean())
      else (i.toLong, "drop", garbled())
    }
    val (trainRows, heldOut) = rows.splitAt(150)
    val model = TextOps.trainLangId(
      trainRows.toDF("doc_id", "label", "text"), langCol = "label")
    val scored = TextOps.langIdScore(
      heldOut.toDF("doc_id", "label", "text"), model)
      .join(heldOut.toDF("doc_id", "label", "text")
        .select(col("doc_id"), col("label")), Seq("doc_id"))
    val acc = scored.where(col("lang_pred") === col("label")).count()
      .toDouble / scored.count()
    assert(acc >= 0.98, s"held-out quality accuracy $acc")
  }

  test("token counts: word subwords plus one per punctuation char; " +
      "empty and punctuation-only docs handled") {
    val docs = Seq(
      (1L, "low lower, low!"),
      (2L, "..."),
      (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 2) // (l,o), (lo,w)
    val got = Bpe.tokenCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: "low"→[low] (1), "lower"→[low,e,r] (3), "low" (1) + "," "!"
    assert(got(1L) == 1 + 3 + 1 + 2, got.toString)
    assert(got(2L) == 3)
    assert(got(3L) == 0)
    // BPE counts differ from whitespace counts — the honest-budget
    // point: feed bpe_tokens into packBudget's tokensCol
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
