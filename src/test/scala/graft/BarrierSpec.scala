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
    val prevCkptConf = spark.conf.getOption(Barrier.CheckpointDirKey)
    val prevScDir = spark.sparkContext.getCheckpointDir
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt")
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
      spark.conf.set(Barrier.CheckpointDirKey, ckptDir.toString)
      Seq("DISK_ONLY", "LOCAL_CHECKPOINT", "RELIABLE_CHECKPOINT", "NONE")
        .foreach { m =>
          assert(runAll(m) === base, s"strategy $m diverged")
        }
    } finally {
      // restore EVERYTHING this test touched — the checkpoint-dir conf
      // and the SparkContext checkpoint dir leak into the shared-session
      // suite otherwise — and delete the temp checkpoint files.
      prev match {
        case Some(v) => spark.conf.set(Barrier.ConfKey, v)
        case None => spark.conf.unset(Barrier.ConfKey)
      }
      prevCkptConf match {
        case Some(v) => spark.conf.set(Barrier.CheckpointDirKey, v)
        case None => spark.conf.unset(Barrier.CheckpointDirKey)
      }
      spark.sparkContext.setCheckpointDir(prevScDir.orNull)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(): Unit
      }
      rm(ckptDir.toFile)
    }
  }

  test("RELIABLE_CHECKPOINT cut writes fault-tolerant checkpoint files") {
    import spark.implicits._
    val prev = spark.conf.getOption(Barrier.ConfKey)
    val prevCkptConf = spark.conf.getOption(Barrier.CheckpointDirKey)
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
      prevCkptConf match {
        case Some(v) => spark.conf.set(Barrier.CheckpointDirKey, v)
        case None => spark.conf.unset(Barrier.CheckpointDirKey)
      }
      spark.sparkContext.setCheckpointDir(prevScDir.orNull)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }

  test("RELIABLE_CHECKPOINT chain rotates old rounds' checkpoint files") {
    import spark.implicits._
    val prev = spark.conf.getOption(Barrier.ConfKey)
    val prevCkptConf = spark.conf.getOption(Barrier.CheckpointDirKey)
    val prevScDir = spark.sparkContext.getCheckpointDir
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-rot")
    try {
      spark.sparkContext.setCheckpointDir(null)
      spark.conf.set(Barrier.ConfKey, "RELIABLE_CHECKPOINT")
      spark.conf.set(Barrier.CheckpointDirKey, dir.toString)
      // setCheckpointDir nests a per-context UUID dir — search the tree
      def rddDirs: Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          Option(f.listFiles).toSeq.flatten.filter(_.isDirectory)
            .flatMap(d => d +: walk(d))
        walk(dir.toFile).filter(_.getName.startsWith("rdd-"))
      }
      val rounds = Barrier.chain()
      var df = Seq(1, 2, 3).toDF("x")
      (1 to 5).foreach { _ => df = rounds.cut(df.withColumn("x", $"x" + 1)) }
      // 5 rounds leave only the newest CutCheckpointsKept rdd-N dirs…
      assert(rddDirs.size === Barrier.CutCheckpointsKept,
        s"checkpoint dir grew O(rounds): ${rddDirs.map(_.getName)}")
      // …and the surviving newest round is still readable
      assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(6, 7, 8))
      // release (between-queries contract) deletes the rest
      Barrier.release(spark)
      assert(rddDirs.isEmpty, "release left cut checkpoints behind")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Barrier.ConfKey, v)
        case None => spark.conf.unset(Barrier.ConfKey)
      }
      prevCkptConf match {
        case Some(v) => spark.conf.set(Barrier.CheckpointDirKey, v)
        case None => spark.conf.unset(Barrier.CheckpointDirKey)
      }
      spark.sparkContext.setCheckpointDir(prevScDir.orNull)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(): Unit
      }
      rm(dir.toFile)
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
