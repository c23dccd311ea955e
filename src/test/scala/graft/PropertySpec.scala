package graft

import graft.cdc.SpecificFilter
import graft.functions.HashExprs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based pins (native ScalaCheck): Spark-side operator semantics
  * must agree with straight-line Scala model implementations on arbitrary
  * inputs. */
object PropertySpec extends Properties("graft") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-props")
    .getOrCreate()

  private val P = 2147483647L

  private val token: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("eqFilter agrees with map-lookup model") = {
    val rowGen: Gen[(Map[String, String], String, String)] = for {
      keys <- Gen.listOf(token)
      vals <- Gen.listOfN(keys.length, token)
      probe <- Gen.oneOf(Gen.oneOf("zzz" :: keys), token)
      target <- token
    } yield (keys.zip(vals).toMap, probe, target)

    Prop.forAll(Gen.listOfN(10, rowGen)) { cases =>
      val s = spark
      import s.implicits._
      val df = cases.zipWithIndex
        .map { case ((m, p, t), i) => (i, m, p, t) }
        .toDF("id", "cmap", "probe", "target")
      val got = df.where(SpecificFilter.eqFilter(col("cmap"), col("probe"), col("target")))
        .select("id").collect().map(_.getInt(0)).toSet
      val want = cases.zipWithIndex.collect {
        case ((m, p, t), i) if m.get(p).contains(t) => i
      }.toSet
      got == want
    }
  }

  property("byteRollHash agrees with char fold on ASCII") = {
    val ascii: Gen[String] =
      Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    Prop.forAll(Gen.nonEmptyListOf(ascii)) { texts =>
      val s = spark
      import s.implicits._
      val got = texts.toDF("t")
        .select(HashExprs.byteRollHash(col("t"), 1000003L, P))
        .collect().map(_.getLong(0)).toSeq
      val want = texts.map(_.foldLeft(0L)((h, c) => (h * 1000003L + c.toLong) % P))
      got == want
    }
  }

  property("fused shingle hashing equals the compositional form") = {
    val doc: Gen[String] = Gen.choose(2, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(m =>
        Gen.listOfN(m, Gen.alphaLowerChar).map(_.mkString))).map(_.mkString(" ")))
    Prop.forAll(Gen.nonEmptyListOf(doc)) { texts =>
      val s = spark
      import s.implicits._
      val df = texts.toDF("text")
        .select(split(col("text"), " ").as("toks"))
      val fused = df
        .select(HashExprs.shingleHashSet(col("toks"), 1000003L, P))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      val compositional = df.select(
        array_distinct(transform(
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat(element_at(col("toks"), i), lit(" "),
              element_at(col("toks"), i + 1))),
          sh => HashExprs.byteRollHash(sh, 1000003L, P))))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      fused == compositional
    }
  }

  property("session fold equals a reference gap-scan on in-order batches") = {
    import graft.streaming.ChangeFeedStream
    val Gap = ChangeFeedStream.SessionGapUs
    val evGen = for {
      n <- Gen.choose(1, 40)
      gaps <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0L, Gap), Gen.choose(Gap + 1, Gap * 3)))
    } yield gaps.scanLeft(1000L)(_ + _).zipWithIndex
      .map { case (ts, i) => ChangeFeedStream.SessEvent(1L, ts, i.toLong) }

    Prop.forAll(evGen) { events =>
      val (closed, open) = ChangeFeedStream.foldSession(1L, None, events)
      // reference model: split whenever consecutive gap exceeds Gap
      val model = events.foldLeft(List.empty[List[ChangeFeedStream.SessEvent]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) if e.ts_us - cur.head.ts_us <= Gap =>
          (e :: cur) :: done
        case (acc, e) => List(e) :: acc
      }.map(_.reverse).reverse
      val emitted = closed.map(c => (c.n_events, c.start_us, c.end_us))
      val want = model.dropRight(1).map(s =>
        (s.length.toLong, s.head.ts_us, s.last.ts_us))
      val openOk = open.exists(st =>
        st.n_events == model.last.length &&
          st.start_us == model.last.head.ts_us && st.end_us == model.last.last.ts_us)
      emitted == want && openOk
    }
  }

  property("minhash is order-invariant and monotone under union") = {
    val setGen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))
    Prop.forAll(setGen, setGen, Gen.long) { (a, b, seed) =>
      val s = spark
      import s.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(a)
      val df = Seq(
        ("orig", a.toArray),
        ("shuffled", shuffled.toArray),
        ("union", (a ++ b).toArray)
      ).toDF("k", "sh")
        .select(col("k"),
          HashExprs.minHash(col("sh"), graft.ops.Dedup.PermA, graft.ops.Dedup.PermB, P).as("m"))
      val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      m("shuffled") == m("orig") &&
        m("union").zip(m("orig")).forall { case (u, o) => u <= o }
    }
  }
}
