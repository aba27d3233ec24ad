package graft

import org.apache.spark.sql.SparkSession

/** Builds a session WITH the extensions installed (sharing the JVM's
  * SparkContext) and uses the injected functions from plain SQL with no
  * imperative registration.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injects the native functions into SQL") {
    spark // force the shared session (and its context) to exist
    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne spark) // a genuinely new session, same SparkContext

      val r = s2.sql(
        """SELECT rolling_hash('hello world') AS rh,
          |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
        .collect()(0)
      assert(r.getLong(0) === 234728892L)
      assert(r.getDouble(1) === 11.0)

      val agg = s2.sql(
        """SELECT simhash64(h) AS sig, size(minhash128(h)) AS n
          |FROM VALUES (42L) AS t(h)""".stripMargin).collect()(0)
      assert(agg.getLong(0) === 42L) // single-feature simhash = the hash
      assert(agg.getInt(1) === 128)

      // EVERY builder reaches SQL through the extensions path — the two
      // registration routes share one list, and this query would throw
      // Undefined function if any entry went missing again (the round-5
      // additions had reached only the session path for a while)
      val r5 = s2.sql(
        """SELECT ngrams(array('a','b','c'), 2) AS ng,
          |  md5_lower64('abc') AS h,
          |  top_cells(array(1.0d, 0.0d), array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 1) AS tc,
          |  pq_encode(array(1.0d, 0.0d), array(array(array(1.0d, 0.0d), array(0.0d, 1.0d)))) AS pq,
          |  ngram_stats(array('a','b','a','b','a'), 2) AS st
          |""".stripMargin).collect()
      assert(r5.map(_.getString(0)).toSeq === Seq("a b", "b c"))
      assert(r5.head.getLong(1) === 8250560606382298838L)
      assert(r5.head.getSeq[Int](2) === Seq(0))
      assert(r5.head.getSeq[Int](3) === Seq(0))
      // "a b","b a","a b","b a" → 4 total, 2 distinct, top multiplicity 2
      val st = r5.head.getStruct(4)
      assert((st.getLong(0), st.getLong(1), st.getLong(2)) === ((4L, 2L, 2L)))

      // ngram_counts is a second generator → its own query
      val nc = s2.sql(
        "SELECT ngram_counts(array('a','b','a','b','a'), 2) AS (g, c)")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(nc === Seq(("a b", 2L), ("b a", 2L)))

      // token_windows is a third generator → its own query
      val tw = s2.sql(
        "SELECT token_windows('a b c d', 3) AS (i, win)")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(tw === Seq((1L, "a b c"), (2L, "b c d")))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }


  test("SlotGroupPruning derives partition pruning from bare slot predicates") {
    import org.apache.spark.sql.functions.col
    import graft.ingest.{CardanoWriter, Extract, Fixture}
    import spark.implicits._
    // slot-partitioned table on disk (groups 0 and 200000)
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    CardanoWriter.write(Extract.tx(Extract.parse(Fixture.blocks.toDF("json"))), dir, "tx")

    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      // filter ONLY on slot — no manual slot_group predicate
      val pruned = s2.read.parquet(s"$dir/tx").filter(col("slot") >= 240000L)
      assert(pruned.count() === 2)
      val scanned = pruned.queryExecution.executedPlan.collectLeaves().flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray.toSeq.map(_.filePath.toString)
        case _ => Seq.empty
      }
      assert(scanned.nonEmpty)
      assert(scanned.forall(_.contains("slot_group=200000")), scanned.mkString(","))

      // control: the shared session (no extension) scans both groups
      val unpruned = spark.read.parquet(s"$dir/tx").filter(col("slot") >= 240000L)
      unpruned.count()
      val all = unpruned.queryExecution.executedPlan.collectLeaves().flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray.toSeq.map(_.filePath.toString)
        case _ => Seq.empty
      }
      assert(all.exists(_.contains("slot_group=0")), "control should scan group 0")

      // contract gate: a table whose slot_group is an ORDINARY column
      // with an unrelated meaning (slot % 7 here) must NOT receive
      // derived predicates — before the gate, the rule would imply
      // slot_group >= 200000 and silently return zero rows
      val foreignDir = java.nio.file.Files.createTempDirectory("graft-foreign").toString
      import s2.implicits._
      Seq((250000L, 250000L % 7), (260000L, 260000L % 7))
        .toDF("slot", "slot_group")
        .write.mode("overwrite").parquet(foreignDir)
      val foreign = s2.read.parquet(foreignDir).filter(col("slot") >= 240000L)
      assert(foreign.count() === 2, "non-contract table lost rows to pruning")

      // kill-switch: contract table, pruning disabled by conf → both
      // groups scanned again
      s2.conf.set("spark.graft.slotGroupPruning", "false")
      try {
        val off = s2.read.parquet(s"$dir/tx").filter(col("slot") >= 240000L)
        off.count()
        val offScanned = off.queryExecution.executedPlan.collectLeaves().flatMap {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.toPartitionArray.toSeq.map(_.filePath.toString)
          case _ => Seq.empty
        }
        assert(offScanned.exists(_.contains("slot_group=0")),
          "kill-switch should disable derived pruning")
      } finally s2.conf.set("spark.graft.slotGroupPruning", "true")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }
}
