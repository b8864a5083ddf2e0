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
      spark.conf.set(Barrier.CheckpointDirKey,
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      Seq("DISK_ONLY", "LOCAL_CHECKPOINT", "RELIABLE_CHECKPOINT", "NONE")
        .foreach { m =>
          assert(runAll(m) === base, s"strategy $m diverged")
        }
    } finally prev match {
      case Some(v) => spark.conf.set(Barrier.ConfKey, v)
      case None => spark.conf.unset(Barrier.ConfKey)
    }
  }

  test("RELIABLE_CHECKPOINT cut writes fault-tolerant checkpoint files") {
    import spark.implicits._
    val prev = spark.conf.getOption(Barrier.ConfKey)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cut")
    val prevScDir = spark.sparkContext.getCheckpointDir
    try {
      spark.sparkContext.setCheckpointDir(null) // force re-wiring from conf
      spark.conf.set(Barrier.ConfKey, "RELIABLE_CHECKPOINT")
      spark.conf.set(Barrier.CheckpointDirKey, dir.toString)
      val df = Barrier.cut(Seq(1, 2, 3).toDF("x")
        .withColumn("y", $"x" * 2))
      assert(df.collect().map(_.getInt(1)).sorted.toSeq == Seq(2, 4, 6))
      // the plan was cut to a scan of the checkpointed RDD…
      assert(df.queryExecution.analyzed.collectLeaves().size == 1)
      // …whose blocks live in the REAL checkpoint dir, not executor
      // memory: reliable-checkpoint files exist under the conf'd path
      def files(p: java.io.File): Seq[java.io.File] =
        Option(p.listFiles).toSeq.flatten
          .flatMap(f => if (f.isDirectory) files(f) else Seq(f))
      assert(files(dir.toFile).nonEmpty, "no checkpoint files written")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Barrier.ConfKey, v)
        case None => spark.conf.unset(Barrier.ConfKey)
      }
      spark.sparkContext.setCheckpointDir(prevScDir.orNull)
    }
  }

  test("RELIABLE_CHECKPOINT without a checkpoint dir fails loudly") {
    import spark.implicits._
    val prev = spark.conf.getOption(Barrier.ConfKey)
    val prevScDir = spark.sparkContext.getCheckpointDir
    try {
      spark.sparkContext.setCheckpointDir(null)
      spark.conf.set(Barrier.ConfKey, "RELIABLE_CHECKPOINT")
      spark.conf.unset(Barrier.CheckpointDirKey)
      val e = intercept[IllegalStateException] {
        Barrier.cut(Seq(1).toDF("x"))
      }
      assert(e.getMessage.contains(Barrier.CheckpointDirKey))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Barrier.ConfKey, v)
        case None => spark.conf.unset(Barrier.ConfKey)
      }
      spark.sparkContext.setCheckpointDir(prevScDir.orNull)
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
