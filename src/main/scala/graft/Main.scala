package graft

import org.apache.spark.sql.SparkSession

import graft.api.TokenAnalytics
import graft.ingest.{CardanoWriter, Extract}

/** CLI entry points — the analogue of the reference's `main.py`
  * (/root/reference/main.py:69-133):
  *
  *   extract <blockJsonDir> <tablesDir>   one-shot batch ingestion:
  *     every json/jsonl file under blockJsonDir (one block per line)
  *     → the 11 slot-group-partitioned Cardano tables
  *   query <tablesDir> [minFeeLovelace]   the high-fee report: top-100
  *     transactions by fee plus the 4-way fee aggregate
  *   token <tablesDir> <policyIdHex> <assetNameHex> [minSlot] [maxSlot]
  *     token ownership-transfer analysis + fee statistics
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "extract" :: blocksDir :: tablesDir :: Nil =>
      val spark = session()
      val raw = spark.read.text(blocksDir).toDF("json")
      val parsed = Extract.parse(raw).cache()
      Extract.allTables(parsed).foreach { case (t, df) =>
        CardanoWriter.write(df, tablesDir, t)
        println(s"wrote $t")
      }
      spark.stop()

    case "query" :: tablesDir :: rest if rest.length <= 1 =>
      val spark = session()
      val minFee = rest.headOption.map(_.toLong).getOrElse(2000000L)
      val tx = CardanoWriter.read(spark, tablesDir, "tx")
      println(s"Top transactions with fee > $minFee lovelace:")
      TokenAnalytics.highFeeTransactions(tx, minFee).show(100, truncate = false)
      println("Fee statistics:")
      TokenAnalytics.feeStatistics(tx, minFee).show(truncate = false)
      spark.stop()

    case "token" :: tablesDir :: policy :: asset :: rest if rest.length <= 2 =>
      val spark = session()
      val tx = CardanoWriter.read(spark, tablesDir, "tx")
      val assetDf = CardanoWriter.read(spark, tablesDir, "asset")
      val minSlot = rest.headOption.map(_.toLong)
      val maxSlot = rest.drop(1).headOption.map(_.toLong)
      val assetName = if (asset.isEmpty) None else Some(asset)
      println("Ownership-changing transactions:")
      TokenAnalytics
        .findTokenTransfers(tx, assetDf, policy, assetName, minSlot, maxSlot)
        .show(50, truncate = false)
      val stats = TokenAnalytics
        .analyzeTokenFees(tx, assetDf, policy, assetName, minSlot, maxSlot)
      println(s"transactions=${stats.totalTransactions} " +
        s"totalFeesLovelace=${stats.totalFeesLovelace} " +
        s"avgFeeLovelace=${stats.avgFeeLovelace} " +
        s"slotRange=${stats.minSlot.getOrElse(-1L)}..${stats.maxSlot.getOrElse(-1L)}")
      spark.stop()

    case _ =>
      System.err.println(
        """usage:
          |  graft.Main extract <blockJsonDir> <tablesDir>
          |  graft.Main query <tablesDir> [minFeeLovelace]
          |  graft.Main token <tablesDir> <policyIdHex> <assetNameHex> [minSlot] [maxSlot]""".stripMargin)
      sys.exit(2)
  }
}
