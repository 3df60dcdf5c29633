package graft.sql

import graft.SparkSpec
import graft.lake.LakehouseTable
import org.apache.hadoop.fs.Path

/** `CALL graft.system.*` maintenance procedures: each drives the same
  * native path the DataFrame API uses and reports one summary row.
  */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): String = {
    n += 1
    val cat = s"gproc$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir("gproc-wh"))
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
    cat
  }

  private def lt(cat: String, tbl: String = "ticks"): LakehouseTable =
    LakehouseTable.load(spark,
      new Path(spark.conf.get(s"spark.sql.catalog.$cat.warehouse"), s"gold/$tbl"))

  /** Seed a table with `appends` one-file commits of 3 rows each. */
  private def mkTicks(cat: String, appends: Int): Unit = {
    spark.sql(s"""CREATE TABLE $cat.gold.ticks
      (sym STRING, ts_us BIGINT, px DOUBLE) PARTITIONED BY (sym)""")
    val t = lt(cat)
    (0 until appends).foreach(i =>
      t.append(Seq(("a", i * 3L, 1.0), ("a", i * 3L + 1, 2.0), ("b", i * 3L + 2, 3.0))
        .toDF("sym", "ts_us", "px").coalesce(1)))
  }

  test("rewrite_data_files compacts and reports the file delta") {
    val cat = freshCatalog()
    mkTicks(cat, appends = 4) // 2 partition dirs × 4 files
    val r = spark.sql(
      s"CALL $cat.system.rewrite_data_files(table => 'gold.ticks')").head()
    assert(r.getInt(0) == 8 && r.getInt(1) == 2, s"unexpected report $r")
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks").head().getLong(0) == 12L)
  }

  test("expire_snapshots honors retention and keep_last; positional args work") {
    val cat = freshCatalog()
    mkTicks(cat, appends = 4) // 4 append snapshots (+1 compaction none)
    val r = spark.sql(
      s"CALL $cat.system.expire_snapshots('gold.ticks', 0, 2)").head()
    assert(r.getInt(0) == 2, s"expected 2 expired, got $r") // 4 snaps, keep newest 2
    assert(r.getInt(2) == 2)
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks").head().getLong(0) == 12L)
  }

  test("rollback_to_snapshot restores an earlier head") {
    val cat = freshCatalog()
    mkTicks(cat, appends = 3)
    val first = lt(cat).snapshots.head.id
    val r = spark.sql(
      s"CALL $cat.system.rollback_to_snapshot('gold.ticks', $first)").head()
    assert(r.getLong(1) == first)
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks").head().getLong(0) == 3L)
  }

  test("zorder compacts on the declared columns; maintain runs the property cycle") {
    val cat = freshCatalog()
    mkTicks(cat, appends = 5)
    val rz = spark.sql(
      s"CALL $cat.system.zorder('gold.ticks', 'ts_us,px', 1)").head()
    // range partitioning targets nDirs*target tasks; a range boundary may
    // straddle a dir, so the bound is approximate — but far below the 10
    // input files
    assert(rz.getInt(0) <= 4, s"expected ~1 file per dir, got $rz")
    // property-driven cycle: nothing left to compact, expiry fires
    lt(cat).setProperty("retention.ms", "0")
    val rm = spark.sql(s"CALL $cat.system.maintain('gold.ticks')").head()
    assert(!rm.getBoolean(0) && rm.getInt(2) > 0, s"unexpected maintain report $rm")
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks").head().getLong(0) == 15L)
  }

  test("rewrite_manifests folds the chain; remove_orphan_files reaps strays") {
    val cat = freshCatalog()
    mkTicks(cat, appends = 3)
    spark.sql(s"CALL $cat.system.rewrite_manifests('gold.ticks')")
    val t = lt(cat)
    assert(t.log.readManifestList(t.metadata.currentSnapshot.get).size == 1)
    // plant an orphan where data files live
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val orphan = new java.io.File(s"$wh/gold/ticks/data/sym=a/orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val r = spark.sql(s"CALL $cat.system.remove_orphan_files('gold.ticks')").head()
    assert(r.getInt(0) >= 1 && !orphan.exists())
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks").head().getLong(0) == 9L)
  }

  test("ALTER COLUMN TYPE widens through SQL; narrowing refused") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.gold.w (k BIGINT, qty INT, px FLOAT)")
    Seq((1L, 2, 1.5f), (2L, 3, 2.5f)).toDF("k", "qty", "px")
      .createOrReplaceTempView("w_src")
    spark.sql(s"INSERT INTO $cat.gold.w SELECT * FROM w_src")
    spark.sql(s"ALTER TABLE $cat.gold.w ALTER COLUMN qty TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.gold.w ALTER COLUMN px TYPE DOUBLE")
    val row = spark.sql(s"SELECT sum(qty), sum(px) FROM $cat.gold.w").head()
    assert(row.getLong(0) == 5L && row.getDouble(1) == 4.0)
    assert(spark.table(s"$cat.gold.w").schema("qty").dataType ==
      org.apache.spark.sql.types.LongType)
    // narrowing dies in Spark's own analyzer (only up-casts reach the
    // catalog at all)
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.gold.w ALTER COLUMN qty TYPE INT"))
    assert(e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e1.getMessage)
    // int->double passes Spark's up-cast check but is NOT in the
    // lossless metadata-only promotion set — widenColumn refuses it
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.gold.w ALTER COLUMN k TYPE DOUBLE"))
    val messages = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_: Any)).mkString("\n")
    assert(messages.contains("lossless"), messages)
  }

  test("branch/tag DDL procedures run the WAP cycle in pure SQL") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.gold.ticks (sym STRING, ts_us BIGINT, px DOUBLE)")
    Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("sym", "ts_us", "px")
      .createOrReplaceTempView("wap_base")
    spark.sql(s"INSERT INTO $cat.gold.ticks SELECT * FROM wap_base")

    val cb = spark.sql(
      s"CALL $cat.system.create_branch(table => 'gold.ticks', branch => 'audit')").head()
    assert(cb.getString(0) == "audit")
    assert(lt(cat).branches.get("audit").contains(cb.getLong(1)))

    // INSERT under spark.graft.wap.branch stages on the branch
    Seq(("c", 3L, 3.0)).toDF("sym", "ts_us", "px").createOrReplaceTempView("wap_stage")
    spark.conf.set("spark.graft.wap.branch", "audit")
    try spark.sql(s"INSERT INTO $cat.gold.ticks SELECT * FROM wap_stage")
    finally spark.conf.unset("spark.graft.wap.branch")
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks").head().getLong(0) == 2L,
      "staged insert must not publish to main")
    // branch-name time travel sees the staged union
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks VERSION AS OF 'audit'")
      .head().getLong(0) == 3L)

    val ff = spark.sql(s"CALL $cat.system.fast_forward('gold.ticks', 'audit')").head()
    assert(ff.getLong(1) == lt(cat).metadata.currentSnapshotId.get)
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks").head().getLong(0) == 3L)
    spark.sql(s"CALL $cat.system.drop_branch('gold.ticks', 'audit')")
    assert(lt(cat).branches.isEmpty)

    // tag pins the published state; tag-name time travel reads it back
    val ct = spark.sql(
      s"CALL $cat.system.create_tag(table => 'gold.ticks', tag => 'published')").head()
    assert(ct.getLong(1) == lt(cat).metadata.currentSnapshotId.get)
    spark.sql(s"INSERT INTO $cat.gold.ticks SELECT sym, ts_us + 10, px FROM wap_base")
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks VERSION AS OF 'published'")
      .head().getLong(0) == 3L)
    spark.sql(s"CALL $cat.system.drop_tag('gold.ticks', 'published')")
    assert(lt(cat).tags.isEmpty)
    // an unknown name now resolves to nothing — and says so
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.gold.ticks VERSION AS OF 'published'").collect())
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_: Any)).mkString("\n")
    assert(messages.contains("neither a snapshot id, a tag, nor a branch"), messages)
  }

  test("row-level SQL writes refuse under spark.graft.wap.branch instead of bypassing the audit") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.gold.ticks (sym STRING, ts_us BIGINT, px DOUBLE)")
    Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("sym", "ts_us", "px")
      .createOrReplaceTempView("wapguard_src")
    spark.sql(s"INSERT INTO $cat.gold.ticks SELECT * FROM wapguard_src")
    spark.sql(s"CALL $cat.system.create_branch(table => 'gold.ticks', branch => 'audit')")
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      // a branch stages APPEND-shaped commits only — UPDATE/DELETE/
      // MERGE/TRUNCATE under the conf would write straight to main
      // while the user believes everything is staging
      def refuses(sql: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(String.valueOf(_: Any)).mkString("\n")
        assert(msgs.contains("spark.graft.wap.branch"), s"$sql: $msgs")
      }
      refuses(s"UPDATE $cat.gold.ticks SET px = px + 1.0 WHERE sym = 'a'")
      refuses(s"DELETE FROM $cat.gold.ticks WHERE sym = 'a'")
      refuses(s"""MERGE INTO $cat.gold.ticks t
                 |USING (SELECT 'c' AS sym, CAST(3 AS BIGINT) AS ts_us, 3.0 AS px) s
                 |ON t.sym = s.sym
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      refuses(s"TRUNCATE TABLE $cat.gold.ticks")
      // a by-reference import is the same bypass class (ADVICE r10):
      // it commits straight to main while the user believes everything
      // is staging on the branch
      val stagedWap = tmpDir("wap-addfiles")
      Seq(("c", 3L, 3.0)).toDF("sym", "ts_us", "px")
        .coalesce(1).write.mode("overwrite").parquet(stagedWap)
      refuses(s"CALL $cat.system.add_files(table => 'gold.ticks', source_dir => '$stagedWap')")
      // main is untouched; appends still stage on the branch
      assert(spark.sql(s"SELECT sum(px) FROM $cat.gold.ticks").head().getDouble(0) == 3.0)
    } finally spark.conf.unset("spark.graft.wap.branch")
    spark.sql(s"CALL $cat.system.drop_branch('gold.ticks', 'audit')")
    // without the conf the same statements run fine
    spark.sql(s"UPDATE $cat.gold.ticks SET px = px + 1.0 WHERE sym = 'a'")
    assert(spark.sql(s"SELECT sum(px) FROM $cat.gold.ticks").head().getDouble(0) == 4.0)
  }

  test("a tag and a branch cannot share a VERSION AS OF name") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.gold.ticks (sym STRING, px DOUBLE)")
    Seq(("a", 1.0)).toDF("sym", "px").createOrReplaceTempView("collide_src")
    spark.sql(s"INSERT INTO $cat.gold.ticks SELECT * FROM collide_src")
    spark.sql(s"CALL $cat.system.create_branch(table => 'gold.ticks', branch => 'x')")
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.create_tag(table => 'gold.ticks', tag => 'x')"))
    assert(String.valueOf(e.getMessage).contains("branch named 'x' already exists"),
      e.getMessage)
    spark.sql(s"CALL $cat.system.create_tag(table => 'gold.ticks', tag => 'y')")
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.create_branch(table => 'gold.ticks', branch => 'y')"))
    assert(String.valueOf(e2.getMessage).contains("tag named 'y' already exists"),
      e2.getMessage)
  }

  test("add_files imports partition-laid-out parquet by reference") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.gold.ticks (sym STRING, ts_us BIGINT, px DOUBLE) " +
      "PARTITIONED BY (sym)")
    val staged = tmpDir("addfiles-staged")
    Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)).toDF("sym", "ts_us", "px")
      .coalesce(1).write.mode("overwrite").partitionBy("sym").parquet(staged)
    val r = spark.sql(
      s"CALL $cat.system.add_files(table => 'gold.ticks', source_dir => '$staged')").head()
    assert(r.getInt(0) == 2 && r.getLong(1) == 3L, s"unexpected report $r")
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.ticks WHERE sym = 'a'")
      .head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT sum(px) FROM $cat.gold.ticks").head().getDouble(0) == 6.0)
  }

  test("unknown procedure and bad namespace fail loudly; SHOW PROCEDURES lists all") {
    val cat = freshCatalog()
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.no_such_proc('x')"))
    // Spark wraps the catalog's error in FAILED_TO_LOAD_ROUTINE; our
    // actionable message (with the available list) rides the cause chain
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("FAILED_TO_LOAD_ROUTINE") ||
      messages.contains("no such procedure"), messages)
    val listed = spark.sql(s"SHOW PROCEDURES IN $cat.system")
      .collect().map(_.toString).mkString
    GraftProcedures.all.map(_._1).foreach(p =>
      assert(listed.contains(p), s"missing $p in SHOW PROCEDURES"))
  }
}
