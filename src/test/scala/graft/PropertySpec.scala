package graft

import graft.etl.{Masking, Pipeline, QualityScore}
import graft.functions.DetRand
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test => ScTest}

/** Property-based invariants (SURVEY.md §5.2 item 3). Raw ScalaCheck
  * Properties (sbt runs them natively; the scalatest bridge artifact is
  * not in the offline cache). Sample counts are small — every sample
  * runs real Spark jobs.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // count_if ≡ SUM(CASE WHEN) — the A5 dialect equivalence every
  // conditional aggregate in the engine relies on.
  property("count_if equals sum(case when)") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-100, 100))) { xs =>
      val df = (0 +: xs).toDF("x") // never empty: aggregates need a row
      val r = df.agg(
        count_if($"x" > 0).as("a"),
        sum(when($"x" > 0, 1L).otherwise(0L)).as("b")).collect()(0)
      r.getLong(0) == r.getLong(1)
    }

  // Masking is idempotent and NULL-preserving for arbitrary strings.
  property("masking idempotent and NULL-preserving") =
    Prop.forAll(Gen.listOf(Gen.option(Gen.asciiPrintableStr))) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v.orNull) }
        .toDF("id", "ssn")
      val once = Masking.maskSensitiveData(df).collect()
      val twice = Masking.maskSensitiveData(Masking.maskSensitiveData(df)).collect()
      val nullsKept = once.forall(r =>
        (r.isNullAt(1)) == (xs(r.getLong(0).toInt).isEmpty))
      val masked = once.forall(r =>
        r.isNullAt(1) || r.getString(1) == Masking.MaskToken)
      nullsKept && masked && once.map(_.toSeq).sameElements(twice.map(_.toSeq))
    }

  // Quality score is bounded [0,1] and completeness is exact.
  property("quality score bounded, completeness exact") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.option(Gen.chooseNum(-1e6, 1e6)))) { xs =>
      val df = xs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(Double.box).orNull) }
        .toDF("id", "v")
      val r = QualityScore.score(df.withColumn("v", $"v".cast("double")))
      val expectedCompleteness =
        (xs.size + xs.count(_.isDefined)).toDouble / (2.0 * xs.size)
      r.completeness >= 0 && r.completeness <= 1 &&
        r.validity >= 0 && r.validity <= 1 &&
        r.overall >= 0 && r.overall <= 1 &&
        math.abs(r.completeness - expectedCompleteness) < 1e-12
    }

  // DetRand.u is in (0,1) and is a pure function of (id, salt) —
  // the partition-independence contract of the synthetic generator.
  property("DetRand.u in (0,1), partition-independent") =
    Prop.forAll(Gen.chooseNum(1, 1000), Gen.chooseNum(1, 64)) { (n, salt) =>
      val a = spark.range(1, n + 1).repartition(7)
        .select(DetRand.u(col("id"), salt).as("u"))
        .orderBy($"u").as[Double].collect()
      val b = spark.range(1, n + 1).repartition(2)
        .select(DetRand.u(col("id"), salt).as("u"))
        .orderBy($"u").as[Double].collect()
      a.forall(u => u > 0.0 && u < 1.0) && a.sameElements(b)
    }

  // LSH S-curve knob: candidate recall is MONOTONE in bands at fixed
  // numHashes — band boundaries nest (LshParams.bandMembers), so a
  // full-band match at b bands implies both half-band matches at 2b:
  // each doubling's candidate set is a SUPERSET, deterministically,
  // on any corpus. This is the guarantee that makes the (bands, rows)
  // tradeoff safe to tune upward for recall.
  private val lshCorpusGen = Gen.chooseNum(2, 6).flatMap(nd =>
    Gen.listOfN(nd, Gen.nonEmptyListOf(Gen.oneOf((0 until 6).map(i => s"t$i")))))

  property("lsh candidate set monotone in bands at fixed numHashes") =
    Prop.forAll(lshCorpusGen) { docsToks =>
      import graft.text.{LshParams, TextQueries}
      val base = docsToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts) }.toDF("doc_id", "ta0")
        .select($"doc_id", array_distinct($"ta0").as("ta"))
        .withColumn("n", size($"ta").cast("long"))
      val sig = base.select(
        Seq($"doc_id", $"n") ++ TextQueries.minhashCols(LshParams(8, 1)): _*)
      def candSet(b: Int): Set[(Long, Long)] = {
        val bands = TextQueries.minhashBandRows(sig, LshParams(8, b))
        bands.as("a").join(bands.as("b"),
            col("a.band_id") === col("b.band_id") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
          .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val chain = Seq(1, 2, 4, 8).map(candSet)
      chain.sliding(2).forall { case Seq(lo, hi) => lo.subsetOf(hi) }
    }

  // The window-based readmission flag agrees with the reference's
  // brute-force EXISTS self-join on arbitrary encounter histories.
  private val encGen = Gen.nonEmptyListOf(for {
    pid <- Gen.chooseNum(1, 5)
    off <- Gen.chooseNum(0, 90)
    los <- Gen.chooseNum(0, 5)
  } yield (pid.toLong, off, los))

  // The in-memory session splitter (the streaming state core) agrees
  // with the declarative gaps-and-islands window query on arbitrary
  // event histories.
  private val sessGen = Gen.nonEmptyListOf(for {
    uid <- Gen.chooseNum(1, 3)
    offMin <- Gen.chooseNum(0, 3000) // minutes over ~2 days
    v <- Gen.chooseNum(0, 10000)
  } yield (uid.toLong, offMin, v / 100.0))

  property("stateful session splitter equals window islands query") =
    Prop.forAll(sessGen) { rows =>
      import graft.streaming.EventStreamJob
      val base = 1700000000000000L // µs epoch anchor
      val evs = rows.zipWithIndex.map { case ((uid, off, v), i) =>
        EventStreamJob.SessEvent(uid, i.toLong, base + off * 60000000L, v,
          new java.sql.Timestamp((base + off * 60000000L) / 1000L))
      }
      val scala_ = evs.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
        EventStreamJob.splitSessions(es.sortBy(e => (e.us, e.event_id)))
      }.map(s => (s.user_id, s.session_start, s.n_events, s.total_value, s.duration_us))
        .sortBy(_.toString)

      val df = evs.map(e => (e.user_id, e.event_id, e.us, e.value))
        .toDF("user_id", "event_id", "us", "value")
      df.createOrReplaceTempView("sess_prop")
      val gap = EventStreamJob.SessionGapUs
      val sql_ = spark.sql(
        s"""WITH lagged AS (
           |  SELECT user_id, us, value,
           |    CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
           |         <= $gap THEN 0 ELSE 1 END AS new_sess,
           |    event_id
           |  FROM sess_prop),
           |islands AS (
           |  SELECT user_id, us, value,
           |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
           |      ROWS UNBOUNDED PRECEDING) AS sess
           |  FROM lagged)
           |SELECT user_id,
           |       date_format(timestamp_micros(MIN(us)), 'yyyy-MM-dd HH:mm:ss') AS session_start,
           |       COUNT(*) AS n_events,
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           |       MAX(us) - MIN(us) AS duration_us
           |FROM islands GROUP BY user_id, sess""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .sortBy(_.toString)
      scala_ == sql_.toSeq
    }

  property("windowed readmission equals EXISTS self-join") =
    Prop.forAll(encGen) { rows =>
      val enc = rows.zipWithIndex.map { case ((pid, off, los), i) =>
        (i.toLong, pid, off, los)
      }.toDF("encounter_id", "patient_id", "off", "los")
        .withColumn("encounter_date", date_add(lit("1992-01-01").cast("date"), $"off"))
        .withColumn("discharge_date", expr("date_add(encounter_date, los)"))
        .withColumn("encounter_type", lit("T"))
        .drop("off", "los")
      val fast = Pipeline.analyzeReadmissions(enc)
        .select("encounters", "readmissions").collect()
      enc.createOrReplaceTempView("enc_prop")
      val slow = spark.sql(
        """WITH flagged AS (
          |  SELECT EXISTS(SELECT 1 FROM enc_prop e2
          |                WHERE e2.patient_id = e1.patient_id
          |                  AND e2.encounter_id <> e1.encounter_id
          |                  AND e2.encounter_date >= e1.encounter_date
          |                  AND e2.encounter_date <= date_add(e1.discharge_date, 30)
          |               ) AS readmit
          |  FROM enc_prop e1)
          |SELECT COUNT(*) AS encounters,
          |       SUM(CASE WHEN readmit THEN 1 ELSE 0 END) AS readmissions
          |FROM flagged HAVING COUNT(*) >= 10""".stripMargin).collect()
      (fast.map(r => (r.getLong(0), r.getLong(1))).toSeq
        == slow.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    }

  // AsofJoin union+running-last ≡ naive equi-join + range + rank. The
  // generator assigns globally unique second offsets so neither
  // formulation faces an ambiguous tie between two right rows.
  private val asofGen = for {
    n <- Gen.chooseNum(1, 40)
    offs <- Gen.pick(n, 0 until 2000)
    rows <- Gen.sequence[Seq[(Int, Int, Boolean)], (Int, Int, Boolean)](
      offs.map(o => for {
        key <- Gen.chooseNum(1, 4)
        isLeft <- Gen.oneOf(true, false)
      } yield (key, o, isLeft)))
  } yield rows

  property("asof join equals naive join+rank") =
    Prop.forAll(asofGen) { rows =>
      val base = rows.zipWithIndex.map { case ((k, off, isL), i) =>
        (i.toLong, k.toLong, off, isL)
      }.toDF("id", "k", "off", "is_left")
        .withColumn("t", expr("timestamp_seconds(1700000000 + off)"))
      val left = base.filter($"is_left").select($"id", $"k", $"t".as("lt"))
      val right = base.filter(!$"is_left")
        .select($"k", $"t".as("rt"), $"id".as("rid"))
      val fast = graft.operators.AsofJoin
        .latestBefore(left, right, key = "k",
          leftTime = "lt", rightTime = "rt", carry = Seq("rid", "rt"))
        .select($"id", $"rid").as[(Long, Option[Long])].collect().toSeq.sorted
      left.createOrReplaceTempView("asof_l")
      right.createOrReplaceTempView("asof_r")
      val slow = spark.sql(
        """SELECT id, rid FROM (
          |  SELECT l.id, r.rid,
          |         ROW_NUMBER() OVER (PARTITION BY l.id ORDER BY r.rt DESC) AS rn
          |  FROM asof_l l LEFT JOIN asof_r r
          |    ON l.k = r.k AND r.rt <= l.lt)
          |WHERE rn = 1""".stripMargin)
        .as[(Long, Option[Long])].collect().toSeq.sorted
      fast == slow
    }

  // The latest right row must win ATOMICALLY: when it carries a NULL in
  // one column, that NULL is the answer — an older row's non-null value
  // must not leak through per-column (the struct-carry guarantee).
  property("asof join carries the latest row atomically, NULL fields included") =
    Prop.forAll(asofGen) { rows =>
      val base = rows.zipWithIndex.map { case ((k, off, isL), i) =>
        (i.toLong, k.toLong, off, isL)
      }.toDF("id", "k", "off", "is_left")
        .withColumn("t", expr("timestamp_seconds(1700000000 + off)"))
      val left = base.filter($"is_left").select($"id", $"k", $"t".as("lt"))
      val right = base.filter(!$"is_left")
        .select($"k", $"t".as("rt"), $"id".as("rid"),
          // v is NULL on every third right row — including, sometimes,
          // the genuinely-latest one
          when($"id" % 3 =!= 0, $"id" * 10).as("v"))
      val fast = graft.operators.AsofJoin
        .latestBefore(left, right, key = "k",
          leftTime = "lt", rightTime = "rt", carry = Seq("rid", "v"))
        .select($"id", $"rid", $"v")
        .as[(Long, Option[Long], Option[Long])].collect().toSeq.sorted
      left.createOrReplaceTempView("asof_l")
      right.createOrReplaceTempView("asof_r")
      val slow = spark.sql(
        """SELECT id, rid, v FROM (
          |  SELECT l.id, r.rid, r.v,
          |         ROW_NUMBER() OVER (PARTITION BY l.id ORDER BY r.rt DESC) AS rn
          |  FROM asof_l l LEFT JOIN asof_r r
          |    ON l.k = r.k AND r.rt <= l.lt)
          |WHERE rn = 1""".stripMargin)
        .as[(Long, Option[Long], Option[Long])].collect().toSeq.sorted
      fast == slow
    }

  // Bounded top-k aggregate ≡ global sort-take for any data, any
  // buffer split, either merge order (associative + commutative — the
  // property that makes its map-side partials shuffle-order-proof).
  property("top-k aggregate equals sort-take under arbitrary splits") = {
    import graft.functions.{TopIn, TopKAggregator}
    Prop.forAll(
      Gen.listOf(Gen.chooseNum(-1000.0, 1000.0)),
      Gen.chooseNum(1, 5),
      Gen.chooseNum(0.0, 1.0)) { (vs, k, cut) =>
      val rows = vs.zipWithIndex.map { case (v, i) => TopIn(v, i.toLong) }
      val agg = new TopKAggregator(k)
      val (l, r) = rows.splitAt((rows.length * cut).toInt)
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      val expect = rows.sortBy(t => (-t.value, t.key)).take(k)
      agg.merge(bufL, bufR).items == expect &&
        agg.merge(bufR, bufL).items == expect
    }
  }

  // SCD2 merge invariants under arbitrary two-batch update sequences:
  // exactly one open row per key, validity intervals chain with no
  // gaps/overlaps, version count = 1 + number of actual attribute
  // changes (identical snapshots add no churn).
  property("scd2 one open row per key, chaining intervals, no churn") = {
    import graft.operators.Upsert
    val d0 = java.sql.Date.valueOf("2020-01-01")
    val d1 = java.sql.Date.valueOf("2021-01-01")
    val d2 = java.sql.Date.valueOf("2022-01-01")
    val attrGen = Gen.listOfN(3, Gen.oneOf("a", "b", "c"))
    Prop.forAll(attrGen, attrGen) { (a1, a2) =>
      val base = a1.indices.map(i => (i.toLong, "z", d0, null: java.sql.Date))
        .toDF("id", "attr", "valid_from", "valid_to")
      val u1 = a1.zipWithIndex.map { case (a, i) => (i.toLong, a, d1) }
        .toDF("id", "attr", "effective")
      val u2 = a2.zipWithIndex.map { case (a, i) => (i.toLong, a, d2) }
        .toDF("id", "attr", "effective")
      val out = Upsert.scd2Merge(
        Upsert.scd2Merge(base, u1, Seq("id")), u2, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDate(2), Option(r.getDate(3)))).toSeq
      a1.indices.forall { i =>
        val rows = out.filter(_._1 == i.toLong).sortBy(_._3.toString)
        val opens = rows.filter(_._4.isEmpty)
        val expectVersions =
          1 + (if (a1(i) != "z") 1 else 0) +
            (if (a2(i) != a1(i)) 1 else 0)
        val chains = rows.sliding(2).forall {
          case Seq(p, n) => p._4.contains(n._3)
          case _ => true
        }
        opens.size == 1 && rows.size == expectVersions && chains &&
          opens.head._2 == a2(i)
      }
    }
  }

  // q122's prefix-filtered containment is LOSSLESS on arbitrary
  // corpora: a tiny shared alphabet forces dense shingle collisions,
  // and the prefix probe must still find exactly the brute-force
  // directed pairs at 5i >= 4*na.
  property("containment prefix filter lossless on random corpora") = {
    val tokGen = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.chooseNum(3, 14).flatMap(n => Gen.listOfN(n, tokGen))
    Prop.forAll(Gen.chooseNum(3, 7).flatMap(k => Gen.listOfN(k, docGen))) {
      docsT =>
        val rows = docsT.zipWithIndex.map { case (tk, i) =>
          (i.toLong, tk.mkString(" "))
        }
        val df = rows.toDF("doc_id", "text")
        val got = graft.text.TextQueries.containmentPairsOf(df, 4, 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sets = rows.map { case (id, text) =>
          val tk = text.split(" ", -1)
          id -> (0 to tk.length - 3)
            .map(i => tk.slice(i, i + 3).mkString(" ")).toSet
        }.filter(_._2.nonEmpty)
        val want = (for {
          (a, sa) <- sets; (b, sb) <- sets if a != b
          if 5L * (sa & sb).size >= 4L * sa.size
        } yield (a, b)).toSet
        got == want
    }
  }

  // The count-min sketch's two contracts on arbitrary corpora and
  // geometries: estimates are one-sided (>= the exact count for every
  // vocab token, even when w << vocab forces collisions), and cells
  // are LINEAR (grid of a union == merged grids of the parts — the
  // property the streaming monitor's correctness rests on).
  property("CMS one-sided and linear on random corpora") = {
    val tokGen = Gen.chooseNum(0, 30).map(i => s"t$i")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val corpusGen = Gen.chooseNum(2, 6).flatMap(k => Gen.listOfN(k, docGen))
    Prop.forAll(corpusGen, Gen.oneOf(4, 16)) { (docsT, w) =>
      val rows = docsT.zipWithIndex.map { case (tk, i) =>
        (i.toLong, tk.mkString(" "))
      }
      val df = rows.toDF("doc_id", "text")
      val cells = graft.text.Cms.cells(df, d = 2, w = w)
      val exact = docsT.flatten.groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val est = graft.text.Cms.estimates(cells,
          exact.keys.toSeq.toDF("t"), d = 2, w = w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val oneSided = exact.forall { case (t, c) => est(t) >= c }
      // linearity: split the corpus in two, merge the per-part grids
      val (x, y) = rows.partition(_._1 % 2 == 0)
      def grid(part: Seq[(Long, String)]) =
        if (part.isEmpty) cells.limit(0)
        else graft.text.Cms.cells(part.toDF("doc_id", "text"), d = 2, w = w)
      val merged = graft.text.Cms.merge(grid(x).unionByName(grid(y)))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val whole = cells
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      oneSided && merged == whole
    }
  }

  // Bloom semi-join pruning: members ALWAYS pass the probe (no false
  // negatives — the property the q129 exact-equality rests on), for
  // arbitrary member sets and filters squeezed down to pathological
  // sizes; and the pruned exact join equals the unpruned one.
  property("bloom prune: no false negatives at any filter size") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.identifier),
      Gen.listOf(Gen.identifier),
      Gen.oneOf(64L, 512L, 1L << 14)) { (members0, probes0, bits) =>
      val members = members0.distinct
      val bloom = graft.text.BloomPrune.buildBloom(
        members.toDF("k"), col("k"), expectedItems = 1 << 10, numBits = bits)
      val probes = (members ++ probes0).distinct.toDF("k")
      val passed = probes
        .filter(graft.text.BloomPrune.mightContain(bloom, col("k")))
        .as[String].collect().toSet
      // membership is never pruned…
      members.toSet.subsetOf(passed) && {
        // …so bloom-prune + exact join ≡ exact join
        val exact = probes.join(members.toDF("k"), Seq("k"), "left_semi")
          .as[String].collect().toSet
        val pruned = probes
          .filter(graft.text.BloomPrune.mightContain(bloom, col("k")))
          .join(members.toDF("k"), Seq("k"), "left_semi")
          .as[String].collect().toSet
        exact == pruned
      }
    }
}
