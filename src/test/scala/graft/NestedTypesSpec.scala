package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{TxSql, TxTable}

/** Nested-type audit across the lakehouse DDL surface (r16 verdict
  * item #3: "the behavior is undefined-by-omission — audit + refuse
  * or support"). The supported surface, now pinned:
  *
  *   - struct/array COLUMNS (top-level, nested type) are fully
  *     supported: reads, writes, DML, SQL nested-field access,
  *     ADD COLUMN of a struct, rename/drop OF THE COLUMN (metadata
  *     only, mapping handles the name — nested contents ride along);
  *   - nested FIELDS are not addressable by any DDL/index entry
  *     point: field rename/drop, stats/value sets/blooms, and
  *     partition sources on a dotted path all refuse with named
  *     errors (never silent misbehavior);
  *   - CHECK constraints MAY reference nested paths (in-plan
  *     enforcement evaluates any expression), and rename/drop of the
  *     ROOT column refuses while such a constraint stands.
  */
class NestedTypesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_nested_").toString

  private def structDf(rows: (Long, String, Long)*) =
    rows.toDF("k", "a", "b")
      .select($"k", struct($"a", $"b").as("s"))

  test("struct columns round-trip: write, read, DML, SQL nested access") {
    val root = freshRoot()
    val dir = s"$root/t"
    TxTable.overwrite(structDf((1L, "x", 10L), (2L, "y", 20L)), dir)
    TxTable.append(structDf((3L, "z", 30L)), dir)
    assert(TxTable.read(spark, dir).select($"k", $"s.a", $"s.b")
      .as[(Long, String, Long)].collect().sorted.toSeq ===
      Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L)))
    // copy-on-write DML keyed on the flat column leaves structs intact
    TxTable.deleteWhere(spark, dir, Seq(("k", 2.0, 2.0)))
    assert(TxTable.read(spark, dir).count() === 2L)
    // SQL nested-field access + predicate
    TxSql.installCatalog(spark, "txns", root)
    assert(spark.sql("SELECT s.b FROM txns.t WHERE s.a = 'z'")
      .as[Long].head() === 30L)
  }

  test("ADD COLUMN of a struct type; rename of a struct-typed column is metadata-only") {
    val root = freshRoot()
    val dir = s"$root/t"
    TxSql.installCatalog(spark, "txna", root)
    spark.sql("CREATE TABLE txna.t (k BIGINT)")
    spark.sql("INSERT INTO txna.t VALUES (1)")
    spark.sql("ALTER TABLE txna.t ADD COLUMN meta STRUCT<src: STRING, n: BIGINT>")
    // old rows read null for the struct; the next write populates
    assert(spark.sql("SELECT k, meta FROM txna.t").count() === 1L)
    TxTable.append(Seq(2L).toDF("k")
      .select($"k", struct(lit("web").as("src"), lit(5L).as("n"))
        .as("meta")), dir)
    assert(spark.sql(
      "SELECT k, meta.src FROM txna.t WHERE meta.n = 5")
      .as[(Long, String)].collect().toSeq === Seq((2L, "web")))
    // renaming the struct COLUMN is one metadata commit
    val files = TxTable.snapshot(spark, dir).get.files
    spark.sql("ALTER TABLE txna.t RENAME COLUMN meta TO info")
    assert(TxTable.snapshot(spark, dir).get.files === files)
    assert(spark.sql("SELECT info.n FROM txna.t WHERE k = 2")
      .as[Long].head() === 5L)
    // time travel below the rename serves the OLD column name (API
    // read resolves the union footer schema; the SQL path's
    // one-footer heuristic + head-declared sidecar is separately
    // documented behavior for evolved-then-renamed snapshots)
    assert(TxTable.read(spark, dir, asOf = Some(3L), mergeSchema = true)
      .columns.contains("meta"))
  }

  test("nested FIELDS refuse at every DDL/index entry point, loudly") {
    val root = freshRoot()
    val dir = s"$root/t"
    TxTable.overwrite(structDf((1L, "x", 10L)), dir)
    TxSql.installCatalog(spark, "txnr", root)
    // API rename/drop of a dotted path: named error, not silence
    val e1 = intercept[Exception] {
      TxTable.renameColumn(spark, dir, "s.a", "s.z") }
    assert(e1.getMessage.contains("no column 's.a'"))
    val e2 = intercept[Exception] { TxTable.dropColumn(spark, dir, "s.a") }
    assert(e2.getMessage.contains("no column 's.a'"))
    // SQL field rename/drop: refused by the catalog (multi-part name)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE txnr.t RENAME COLUMN s.a TO z") }
    assert(e3.getMessage.contains("unsupported ALTER") ||
      e3.getMessage.toLowerCase.contains("rename"))
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE txnr.t DROP COLUMN s.a") }
    assert(e4.getMessage.contains("unsupported ALTER") ||
      e4.getMessage.toLowerCase.contains("drop"))
    // index metadata on a nested path: named refusal
    val e5 = intercept[IllegalArgumentException] {
      TxTable.overwriteIndexedMulti(
        TxTable.read(spark, dir), dir, statCols = Seq("s.b")) }
    assert(e5.getMessage.contains("top-level"))
    val e6 = intercept[IllegalArgumentException] {
      TxTable.overwriteIndexedBloom(
        TxTable.read(spark, dir), dir, "s.a") }
    assert(e6.getMessage.contains("top-level"))
    // partition source on a nested path: named refusal
    val e7 = intercept[IllegalArgumentException] {
      TxTable.declarePartitions(spark, dir, Seq("s.a")) }
    assert(e7.getMessage.contains("nested field"))
    val e8 = intercept[IllegalArgumentException] {
      TxTable.declarePartitions(spark, dir, Seq("days(s.a)")) }
    assert(e8.getMessage.contains("nested field"))
  }

  test("CHECK constraints on nested paths enforce in-plan and guard the root") {
    val root = freshRoot()
    val dir = s"$root/t"
    TxTable.overwrite(structDf((1L, "x", 10L)), dir)
    TxTable.addConstraint(spark, dir, "b_pos", "s.b > 0")
    // enforcement: a violating struct write fails the action
    val bad = intercept[Exception] {
      TxTable.append(structDf((2L, "y", -5L)), dir) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(bad).exists(_.contains("b_pos")))
    assert(TxTable.read(spark, dir).count() === 1L)
    // the ROOT column is guarded while the constraint stands
    val er = intercept[Exception] {
      TxTable.renameColumn(spark, dir, "s", "payload") }
    assert(er.getMessage.contains("b_pos"))
    TxTable.dropConstraint(spark, dir, "b_pos")
    // rename of the struct COLUMN itself now works, contents intact
    TxTable.renameColumn(spark, dir, "s", "payload")
    assert(TxTable.read(spark, dir).select($"payload.b")
      .as[Long].head() === 10L)
  }
}
