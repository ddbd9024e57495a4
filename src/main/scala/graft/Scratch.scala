package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Profiling, Similarity, TextAnalysis}

/** Dev scratchpad — ad-hoc timing probes for whatever operator is
  * under the knife this round. Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      var best = 1e9
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime(); val c = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        if (c < 0) println("")
      }
      println(f"[scr] $label%-24s $best%7.3f s")
    }
    // ts_anomaly decomposition: census hist re-agg, stats fold, join
    def events = graft.sources.Tables.load(spark, sfDir, "events")
    def base = events.select(col("user_id").as("key"),
      col("event_id").as("id"),
      floor(col("value") * 100).cast("long").as("v"))
    def hist = events
      .select(col("user_id").as("key"),
        floor(col("value") * 100).cast("long").as("v"))
      .groupBy("key", "v").agg(count(lit(1)).as("__c"))
    t("hist-agg") { hist.count() }
    t("stats-folds") {
      val h = hist.filter(col("v").isNotNull)
      h.groupBy("key")
        .agg(sort_array(collect_list(struct(col("v"), col("__c"))))
            .as("__h"),
          sum("__c").as("__n"))
        .select(col("key"), expr(
          """transform(array(aggregate(__h,
            |  named_struct('run', 0L, 'th', cast(null as bigint)),
            |  (acc, x) -> named_struct('run', acc.run + x.__c,
            |    'th', if(acc.run * 2 < __n, x.v, acc.th))).th),
            | med -> med)[0]""".stripMargin).as("med")).count()
    }
    t("stats-both-folds") {
      val h = hist.filter(col("v").isNotNull)
      h.groupBy("key")
        .agg(sort_array(collect_list(struct(col("v"), col("__c"))))
            .as("__h"),
          sum("__c").as("__n"))
        .select(col("key"), expr(
          """transform(array(aggregate(__h,
            |  named_struct('run', 0L, 'th', cast(null as bigint)),
            |  (acc, x) -> named_struct('run', acc.run + x.__c,
            |    'th', if(acc.run * 2 < __n, x.v, acc.th))).th),
            | med -> named_struct('med', med, 'mad',
            |   aggregate(array_sort(transform(__h,
            |       x -> named_struct('v', abs(x.v - med), '__c', x.__c))),
            |     named_struct('run', 0L, 'th', cast(null as bigint)),
            |     (acc, x) -> named_struct('run', acc.run + x.__c,
            |       'th', if(acc.run * 2 < __n, x.v, acc.th))).th))[0]"""
            .stripMargin).as("__s"))
        .select(col("key"), col("__s.med").as("med"),
          col("__s.mad").as("mad")).count()
    }
    t("base-scan") { base.count() }
    t("full-madOutliers") {
      Profiling.madOutliersFromHist(base, hist, mult = 3).count()
    }
    t("full-query") {
      SparkEntry.queries("ts_anomaly")(spark, sfDir).count()
    }
    // one-exchange variant: skip the (key,v) pre-merge, collect the
    // census rows directly per key — med fold tolerates adjacent dups
    def census = events
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("v"))
      .groupBy("user_id", "event_type", "v").agg(count(lit(1)).as("c"))
    t("one-exchange-hist") {
      Profiling.madOutliersFromHist(base,
        census.select(col("user_id").as("key"), col("v"),
          col("c").as("__c")), mult = 3).count()
    }
    spark.stop()
  }
}
