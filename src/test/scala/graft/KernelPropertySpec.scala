package graft

import graft.functions.{MinHashExpr, SimHashExpr, VecExprs, WinnowExpr}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property checks for the native kernels: the interpreted eval path,
  * the whole-stage-codegen path (through a real projection), and a
  * naive Scala reimplementation must all agree on seeded random
  * inputs. Guards doGenCode/nullSafeEval divergence — the class of bug
  * plan-level oracles can miss when one path is never exercised.
  */
class KernelPropertySpec extends SparkSpecBase {

  private val rng = new Random(42)

  test("vec_dot / vec_norm: codegen agrees with a naive fold on 100 random float vectors") {
    import spark.implicits._
    val data = Seq.fill(100)((Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df   = data.toDF("a", "b")
    VecExprs.register(spark)
    val got = df.selectExpr("vec_dot(a, b) AS d", "vec_norm(a) AS n").collect()
    data.zip(got).foreach { case ((a, b), row) =>
      val dot  = a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
      val norm = math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      assert(row.getDouble(0) == dot, "dot mismatch (must be bitwise — ordered fold)")
      assert(row.getDouble(1) == norm, "norm mismatch")
    }
  }

  test("minhash_sig: codegen agrees with a per-hash naive minimum on random shingle sets") {
    import spark.implicits._
    val data = Seq.fill(50)(Array.fill(1 + rng.nextInt(100))(rng.nextLong().abs % MinHashExpr.P))
    val df   = data.toDF("shx")
    MinHashExpr.register(spark)
    val got = df.selectExpr("minhash_sig(shx) AS sig").collect().map(_.getSeq[Long](0))
    data.zip(got).foreach { case (xs, sig) =>
      (0 until MinHashExpr.NumHashes).foreach { i =>
        val expect = xs.map(x => (MinHashExpr.coefA(i) * x + MinHashExpr.coefB(i)) % MinHashExpr.P).min
        assert(sig(i) == expect, s"hash $i")
      }
    }
  }

  test("simhash64: codegen agrees with a naive bit-vote on random word-hash sets") {
    import spark.implicits._
    val data = Seq.fill(50)(Array.fill(1 + rng.nextInt(80))(rng.nextLong()))
    val df   = data.toDF("wh")
    SimHashExpr.register(spark)
    val got = df.selectExpr("simhash64(wh) AS s").collect().map(_.getLong(0))
    data.zip(got).foreach { case (hs, s) =>
      val expect = (0 until 64).foldLeft(0L) { (acc, i) =>
        val vote = hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
        if (vote >= 0) acc | (1L << i) else acc
      }
      assert(s == expect)
    }
  }

  test("winnow_fp: any shared substring of length >= W+K-1 bytes shares a fingerprint") {
    import spark.implicits._
    val shared = rng.alphanumeric.take(WinnowExpr.W + WinnowExpr.K - 1).mkString
    val docs = Seq(
      (1L, rng.alphanumeric.take(40).mkString + shared + rng.alphanumeric.take(40).mkString),
      (2L, rng.alphanumeric.take(55).mkString + shared + rng.alphanumeric.take(25).mkString)
    ).toDF("doc_id", "text")
    WinnowExpr.register(spark)
    val fps = docs.selectExpr("doc_id", "winnow_fp(text) AS fp").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1) & fps(2)).nonEmpty, "winnowing guarantee violated: shared window has no common fingerprint")
  }

  test("mg_candidates: survivors are a superset of true frequent items under eviction + merges") {
    import spark.implicits._
    val cap = graft.functions.FreqItemsAgg.Capacity
    // Zipf-ish skew over a vocabulary ~6x the counter budget, spread
    // over 8 partitions so both the decrement-all eviction path and the
    // summary merge run. k = cap+1 is the TIGHTEST threshold the
    // guarantee covers.
    val vocab = cap * 6
    val words = Seq.tabulate(20000) { i =>
      val r = rng.nextDouble()
      val z = math.min(vocab - 1, (math.pow(r, 3) * vocab).toInt)
      s"w$z"
    }
    val df = words.toDF("word").repartition(8)
    graft.functions.FreqItemsAgg.register(spark)
    val cands = df.agg(expr("mg_candidates(word)")).collect().head.getSeq[String](0).toSet
    assert(cands.size <= cap, s"summary exceeded its budget: ${cands.size}")
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n     = words.size.toLong
    val mustSurvive = exact.collect { case (w, c) if c * (cap + 1) > n => w }.toSet
    assert(mustSurvive.nonEmpty, "fixture produced no frequent items — vacuous")
    assert(mustSurvive.subsetOf(cands),
      s"guarantee violated — missing: ${mustSurvive.diff(cands)}")
  }

  test("jsonlAudit: a corrupt line with a null original value never counts value_ok") {
    import spark.implicits._
    // event_id 31 is in the corrupt slice (31 % 31 == 0) AND has a null
    // value: the failed parse yields null, and without the parse-success
    // gate null <=> null would false-pass the value check. event_id 32
    // survives with a null value and MUST count (null round-trips).
    val events = Seq(
      (31L, "click", Some(7L), Option.empty[Double]),
      (32L, "click", Some(8L), Option.empty[Double]),
      (33L, "click", Some(9L), Some(1.25))
    ).toDF("event_id", "event_type", "user_id", "value")
    val row = graft.operators.Ingest.jsonlAuditOn(events).collect().head
    assert(row.getAs[Long]("n_lines") == 3L)
    assert(row.getAs[Long]("n_bad") == 1L)
    assert(row.getAs[Long]("n_value_ok") == 2L, "corrupt null-value line must not count value_ok")
  }

  test("xmlRoundtrip: entity-hostile type strings survive the to_xml/from_xml cycle") {
    import spark.implicits._
    // escaping is the failure mode an aggregate-only gate could miss if
    // it never saw a hostile key: these BECOME the group keys, so any
    // entity corruption ('&' -> '&amp;' surviving, '<' truncating the
    // element) shifts a key and fails the count/sum comparison
    val hostile = Seq("a&b", "x<y>", "q\"uo'te", "unié中", "  pad  ")
    val events = hostile.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 2L, t, 100L + i), (i * 2L + 1L, t, 200L + i))
    }.toDF("event_id", "event_type", "user_id")
    val rows = graft.operators.Ingest.xmlRoundtripOn(events).collect()
    val got  = rows.map(r => r.getAs[String]("event_type") ->
      ((r.getAs[Long]("n"), r.getAs[Long]("sum_ids"), r.getAs[Long]("sum_users")))).toMap
    hostile.zipWithIndex.foreach { case (t, i) =>
      assert(got.contains(t), s"type '$t' did not survive the XML cycle: keys=${got.keySet}")
      assert(got(t) == ((2L, i * 4L + 1L, 300L + 2L * i)), s"aggregates shifted for '$t': ${got(t)}")
    }
  }

  test("substring spans: random tiny-alphabet corpora agree with brute force (fuzz)") {
    // a 4-token alphabet forces heavy gram collisions — random docs
    // exercise island merges/breaks, doc-boundary windows, repeated
    // grams at both ends, and sub-k docs far beyond the crafted cases
    import spark.implicits._
    val k = 3
    for (round <- 0 until 3) {
      val docs = (0 until 30).map { i =>
        val n = rng.nextInt(12) // 0..11 tokens, incl. empty and sub-k docs
        (i.toLong, Seq.fill(n)(s"w${rng.nextInt(4)}").mkString(" "))
      }
      val got = graft.operators.Dedup
        .substringSpansOn(docs.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val toks  = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val grams = toks.toSeq.flatMap { case (id, ws) =>
        (0 to ws.size - k).map(p => (id, p.toLong, ws.slice(p, p + k).mkString(" ")))
      }
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val expected = grams.filter(g => counts(g._3) >= 2).groupBy(_._1).flatMap { case (id, gs) =>
        val ps = gs.map(_._2).sorted
        val islands = ps.tail.foldLeft(List(List(ps.head))) {
          case (acc @ cur :: rest, p) => if (p > cur.head + k) List(p) :: acc else (p :: cur) :: rest
          case (Nil, p)               => List(List(p))
        }
        islands.map(isl => (id, isl.min, isl.max + k - 1, isl.max + k - isl.min))
      }.toSet
      assert(got == expected,
        s"round $round: missing=${expected -- got} extra=${got -- expected}\ncorpus=$docs")
    }
  }

  test("despan: random tiny-alphabet corpora agree with brute force (fuzz)") {
    import spark.implicits._
    val k = 3
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    for (round <- 0 until 3) {
      val docs = (0 until 30).map { i =>
        val n = rng.nextInt(12)
        (i.toLong, Seq.fill(n)(s"w${rng.nextInt(4)}").mkString(" "))
      }
      val got = graft.operators.Dedup
        .despanOn(docs.toDF("doc_id", "text"), k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val toks  = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val grams = toks.toSeq.flatMap { case (id, ws) =>
        (0 to ws.size - k).map(p => (id, p, ws.slice(p, p + k).mkString(" ")))
      }
      val byGram = grams.groupBy(_._3)
      val expected = toks.map { case (id, ws) =>
        val cutPos = grams.collect {
          case (d, p, g) if d == id && byGram(g).size >= 2 && byGram(g).map(_._1).min != id =>
            (p until p + k)
        }.flatten.toSet
        val kept = ws.zipWithIndex.collect { case (w, p) if !cutPos.contains(p) => w }
        id -> ((ws.size.toLong, cutPos.size.toLong, md5hex(kept.mkString(" "))))
      }
      assert(got == expected, s"round $round mismatch\ncorpus=$docs")
    }
  }
}
