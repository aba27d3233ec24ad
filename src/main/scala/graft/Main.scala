package graft

import org.apache.spark.sql.SparkSession

import graft.api.{Registry, TokenAnalytics}
import graft.ingest.{CardanoWriter, ChainPoints, Extract}
import graft.io.Tables

/** CLI entry points — the analogue of the reference's `main.py`
  * (/root/reference/main.py:69-133):
  *
  *   extract <blockJsonDir> <tablesDir> [--from <preset|slot>] [--to <preset|slot>]
  *     one-shot batch ingestion: every json/jsonl file under
  *     blockJsonDir (one block per line) → the 11 slot-group-partitioned
  *     Cardano tables. --from/--to bound the run by chain points —
  *     a preset name (config.py:32-73, e.g. `last_byron`) or a bare
  *     slot; start-exclusive / stop-inclusive, the find_intersection
  *     cursor semantics (ogmios_parquet.py:635-651).
  *   query <tablesDir> [minFeeLovelace]   the high-fee report: top-100
  *     transactions by fee plus the 4-way fee aggregate
  *   compact <tablesDir> [--target-bytes <n>]   merge each slot group's
  *     accumulated micro-batch files (the reference's merge phase)
  *   rollback <tablesDir> <slot>   truncate every table to slot <= N
  *     (manual chain-reorg remedy; the streaming path applies this
  *     automatically on rollback messages)
  *   token <tablesDir> <name | policyIdHex assetNameHex> [minSlot] [maxSlot]
  *         [--output <csvDir>]
  *     token ownership-transfer analysis + fee statistics. The first
  *     form resolves a well-known token name ("snek", "hosky") via the
  *     curated registry (token_fee_analysis.py:283-307); --output saves
  *     the detailed transfer frame as CSV (:346-350).
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

  /** Split `--flag value` pairs from positional arguments. Unknown
    * flags and a trailing valueless flag are ERRORS (Left with a
    * message), not silently ignored — a typo'd `--form` must not fall
    * through to an unbounded extraction run.
    */
  private[graft] def splitArgs(args: List[String],
      allowed: Set[String]): Either[String, (List[String], Map[String, String])] = {
    @annotation.tailrec
    def go(xs: List[String], pos: List[String],
        flags: Map[String, String]): Either[String, (List[String], Map[String, String])] =
      xs match {
        case f :: _ if f.startsWith("--") && !allowed.contains(f.drop(2)) =>
          Left(s"unknown flag $f (allowed: ${allowed.toSeq.sorted.map("--" + _).mkString(", ")})")
        case f :: v :: _ if f.startsWith("--") && v.startsWith("--") =>
          // `--from --to x` must not consume `--to` as from's value
          Left(s"flag $f requires a value, got flag $v")
        case f :: v :: t if f.startsWith("--") => go(t, pos, flags + (f.drop(2) -> v))
        case f :: Nil if f.startsWith("--") => Left(s"flag $f requires a value")
        case x :: t => go(t, pos :+ x, flags)
        case Nil => Right((pos, flags))
      }
    go(args, Nil, Map.empty)
  }

  private def splitArgsOrUsage(args: List[String],
      allowed: Set[String]): (List[String], Map[String, String]) =
    splitArgs(args, allowed) match {
      case Right(r) => r
      case Left(msg) => System.err.println(msg); usage()
    }

  private def cursor(flags: Map[String, String], key: String): Option[ChainPoints.ChainPoint] =
    flags.get(key).map { v =>
      ChainPoints.resolve(v).getOrElse {
        System.err.println(s"unknown chain point '$v' — presets: " +
          ChainPoints.Presets.keys.toSeq.sorted.mkString(", "))
        sys.exit(2)
      }
    }

  def main(args: Array[String]): Unit = args.toList match {
    case "extract" :: rest =>
      val (pos, flags) = splitArgsOrUsage(rest, Set("from", "to"))
      pos match {
        case blocksDir :: tablesDir :: Nil =>
          val spark = session()
          val from = cursor(flags, "from")
          val to = cursor(flags, "to")
          val raw = spark.read.text(blocksDir).toDF("json")
          val parsed = Extract.parse(raw)
            .filter(ChainPoints.slotBounds(from, to)(
              org.apache.spark.sql.functions.col("slot")))
            .cache()
          Extract.allTables(parsed).foreach { case (t, df) =>
            CardanoWriter.write(df, tablesDir, t)
            println(s"wrote $t")
          }
          spark.stop()
        case _ => usage()
      }

    case "compact" :: rest =>
      val (pos, flags) = splitArgsOrUsage(rest, Set("target-bytes"))
      pos match {
        case tablesDir :: Nil =>
          val target = flags.get("target-bytes") match {
            case None => 128L * 1024 * 1024
            case Some(v) => v.toLongOption.filter(_ > 0).getOrElse {
              System.err.println(s"--target-bytes must be a positive integer, got '$v'")
              usage()
            }
          }
          val spark = session()
          Extract.tableNames.foreach { t =>
            CardanoWriter.compact(spark, tablesDir, t, target)
            println(s"compacted $t")
          }
          spark.stop()
        case _ => usage()
      }

    case "rollback" :: tablesDir :: slotArg :: Nil if slotArg.toLongOption.isDefined =>
      val spark = session()
      val slot = slotArg.toLong
      Extract.tableNames.foreach { t =>
        CardanoWriter.rollbackTo(spark, tablesDir, t, slot)
        println(s"rolled back $t to slot <= $slot")
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

    case "token" :: rest =>
      val (pos, flags) = splitArgsOrUsage(rest, Set("output"))
      resolveTokenArgs(pos) match {
        case Some((tablesDir, policy, assetName, tail))
            if tail.length <= 2 && tail.forall(_.toLongOption.isDefined) =>
          val spark = session()
          val tx = CardanoWriter.read(spark, tablesDir, "tx")
          val assetDf = CardanoWriter.read(spark, tablesDir, "asset")
          val minSlot = tail.headOption.map(_.toLong)
          val maxSlot = tail.drop(1).headOption.map(_.toLong)
          val transfers = TokenAnalytics
            .findTokenTransfers(tx, assetDf, policy, assetName, minSlot, maxSlot)
            .cache()
          println("Ownership-changing transactions:")
          TokenAnalytics.transfersForCsv(transfers).show(50, truncate = false)
          flags.get("output").foreach { out =>
            Tables.writeCsv(TokenAnalytics.transfersForCsv(transfers), out)
            println(s"Detailed results saved to $out")
          }
          println("Fee breakdown by transfer type:")
          TokenAnalytics.transferTypeBreakdown(transfers).show(truncate = false)
          val stats = TokenAnalytics.feeStats(transfers)
          println(s"transactions=${stats.totalTransactions} " +
            s"totalFeesLovelace=${stats.totalFeesLovelace} " +
            s"avgFeeLovelace=${stats.avgFeeLovelace} " +
            s"slotRange=${stats.minSlot.getOrElse(-1L)}..${stats.maxSlot.getOrElse(-1L)}")
          spark.stop()
        case _ => usage()
      }

    case _ => usage()
  }

  /** Resolve `token` positionals: `<tablesDir>` then either a
    * registry name or `<policyHex> <assetHex>`, then optional numeric
    * `[minSlot] [maxSlot]` → (tablesDir, policyHex, assetNameHex, tail).
    */
  private[graft] def resolveTokenArgs(
      pos: List[String]): Option[(String, String, Option[String], List[String])] =
    pos match {
      case tablesDir :: name :: tail if Registry.tokenInfo(name).isDefined =>
        val t = Registry.tokenInfo(name).get
        Some((tablesDir, t.policyIdHex, Some(t.assetNameHex), tail))
      case tablesDir :: policy :: asset :: tail if policy.toLongOption.isEmpty =>
        Some((tablesDir, policy,
          if (asset.isEmpty) None else Some(asset), tail))
      case _ => None
    }

  private def usage(): Nothing = {
    System.err.println(
      """usage:
        |  graft.Main extract <blockJsonDir> <tablesDir> [--from <preset|slot>] [--to <preset|slot>]
        |  graft.Main query <tablesDir> [minFeeLovelace]
        |  graft.Main token <tablesDir> <name | policyIdHex assetNameHex> [minSlot] [maxSlot] [--output <csvDir>]
        |  graft.Main compact <tablesDir> [--target-bytes <n>]
        |  graft.Main rollback <tablesDir> <slot>""".stripMargin)
    sys.exit(2)
  }
}
