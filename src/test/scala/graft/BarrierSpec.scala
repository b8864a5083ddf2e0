package graft

/** [[Barrier]] — the configurable storage strategy behind the
  * corpus-scale cache barriers (q96/q97/q98-style token and gram
  * frames). The barrier is a performance device, never a semantic one:
  * every strategy, including NONE (recompute per consumer), must
  * produce identical results.
  */
class BarrierSpec extends SparkSpec {

  test("barrier storage strategy does not change results") {
    // the two heaviest barrier users: gram semi-join + edge/label reuse
    val names = Seq("q96_dupgram_coverage", "q98_leakproof_split")
    val prev = spark.conf.getOption(Barrier.ConfKey)
    def runAll(mode: String): Seq[Seq[Seq[Any]]] = {
      spark.conf.set(Barrier.ConfKey, mode)
      try names.map(n =>
        SparkEntry.queries(n)(spark, SparkSpec.Sf0001)
          .collect().map(_.toSeq).toSeq)
      finally {
        Barrier.release(spark)
        spark.catalog.clearCache()
      }
    }
    try {
      val base = runAll("MEMORY_AND_DISK")
      Seq("DISK_ONLY", "LOCAL_CHECKPOINT", "NONE").foreach { m =>
        assert(runAll(m) === base, s"strategy $m diverged")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(Barrier.ConfKey, v)
      case None => spark.conf.unset(Barrier.ConfKey)
    }
  }

  test("release unpersists registered barriers") {
    import spark.implicits._
    spark.conf.set(Barrier.ConfKey, "MEMORY_AND_DISK")
    val df = Barrier(Seq(1, 2, 3).toDF("x"))
    assert(df.count() === 3)
    assert(df.storageLevel.useMemory || df.storageLevel.useDisk)
    Barrier.release(spark)
    // unpersist(blocking = false) is async on blocks but the level
    // flips immediately
    assert(!df.storageLevel.useMemory && !df.storageLevel.useDisk)
  }
}
