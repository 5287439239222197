package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe: cost of DataFrameReader construction — schema
  * inference + file listing per spark.read.parquet call — vs a read
  * with an explicit schema. Not part of the driver contract. */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("lineitem", "orders", "customer", "part", "events")
    def round(label: String)(mk: String => org.apache.spark.sql.DataFrame): Unit = {
      // warm
      tables.foreach(t => mk(s"$sfDir/$t.parquet"))
      val t0 = System.nanoTime()
      val n = 40
      for (_ <- 1 to n; t <- tables) mk(s"$sfDir/$t.parquet")
      val ms = (System.nanoTime() - t0) / 1e6 / (n * tables.size)
      println(f"[readprobe] $label: $ms%7.2f ms per construction")
    }
    round("infer (spark.read.parquet)") { p =>
      val df = spark.read.parquet(p); df.schema; df
    }
    val schemas = tables.map(t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").schema).toMap
    // basename match, not substring (r19 ADVICE): an sfDir containing
    // a table name — e.g. .../partitioned/sf1 matching "part" — would
    // pick the wrong schema or .get-throw
    def tableOf(p: String): String =
      tables.find(t => p.endsWith(s"/$t.parquet")).getOrElse(
        sys.error(s"no known table basename in $p"))
    round("explicit schema") { p =>
      val df = spark.read.schema(schemas(tableOf(p))).parquet(p); df.schema; df
    }
    // and the cost of one trivial action on each (plan+run floor)
    def actionRound(label: String)(mk: String => org.apache.spark.sql.DataFrame): Unit = {
      tables.foreach(t => mk(s"$sfDir/$t.parquet")
        .limit(1).write.format("noop").mode("overwrite").save())
      val t0 = System.nanoTime()
      val n = 10
      for (_ <- 1 to n; t <- tables)
        mk(s"$sfDir/$t.parquet").limit(1)
          .write.format("noop").mode("overwrite").save()
      val ms = (System.nanoTime() - t0) / 1e6 / (n * tables.size)
      println(f"[readprobe] $label: $ms%7.2f ms per limit(1) action")
    }
    actionRound("infer+action") { p =>
      spark.read.parquet(p)
    }
    actionRound("schema+action") { p =>
      spark.read.schema(schemas(tableOf(p))).parquet(p)
    }
    spark.stop()
  }
}
