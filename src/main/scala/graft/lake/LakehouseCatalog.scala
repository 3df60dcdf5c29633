package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.Serialization

/** Namespace/table registry over a warehouse directory — the engine's
  * equivalent of the reference's SQLite-backed PyIceberg catalog
  * (`/root/reference/lakehouse_pipeline.py:78, 303-318`): resolves
  * `namespace.table` → table directory, with idempotent namespace and
  * table creation. Registry state is one tiny JSON file; all table state
  * lives in each table's own snapshot log.
  */
final case class CatalogEntry(identifier: String, location: String, createdAtMs: Long)
final case class CatalogState(namespaces: Seq[String], tables: Seq[CatalogEntry])

final class LakehouseCatalog(val spark: SparkSession, val warehouseDir: String) {
  private implicit val fmts: Formats = DefaultFormats
  private val whPath = new Path(warehouseDir)
  private def conf = spark.sessionState.newHadoopConf()
  private def fs = whPath.getFileSystem(conf)
  private val registryFile = new Path(whPath, "catalog.json")

  // synchronized with the mutators: AtomicState.read PROMOTES a .tmp
  // when the main file is missing, so an unsynchronized reader landing
  // inside writeState's delete→rename window would race the writer's
  // own rename (parallel symbol ingest reads and writes concurrently)
  private def readState(): CatalogState = synchronized {
    AtomicState.read(fs, registryFile)
      .map(Serialization.read[CatalogState])
      .getOrElse(CatalogState(Nil, Nil))
  }

  private def writeState(st: CatalogState): Unit =
    AtomicState.write(fs, registryFile, Serialization.writePretty(st))

  /** CREATE NAMESPACE IF NOT EXISTS (reference `:314-318`). Mutations
    * synchronize on the catalog instance: registry updates are
    * read-modify-write, and parallel symbol ingest (IngestConfig
    * .symbolParallelism) registers tables from several threads.
    */
  def createNamespaceIfNotExists(ns: String): Unit = synchronized {
    val st = readState()
    if (!st.namespaces.contains(ns)) {
      fs.mkdirs(new Path(whPath, ns))
      writeState(st.copy(namespaces = st.namespaces :+ ns))
    }
  }

  def tableExists(identifier: String): Boolean =
    readState().tables.exists(_.identifier == identifier)

  def listTables(ns: String): Seq[String] =
    readState().tables.map(_.identifier).filter(_.startsWith(ns + "."))

  private def tableDir(identifier: String): Path = {
    val Array(ns, name) = identifier.split("\\.", 2)
    new Path(new Path(whPath, ns), name)
  }

  /** CREATE TABLE IF NOT EXISTS: registers + creates the snapshot log with
    * the schema frozen from the first batch (reference `:275-284, :372`).
    */
  def createTableIfNotExists(
      identifier: String,
      schema: StructType,
      partitionSource: Option[String],
      granularity: String = "year"): LakehouseTable = synchronized {
    val dir = tableDir(identifier)
    val table = LakehouseTable.createIfNotExists(spark, dir, schema, partitionSource, granularity)
    val st = readState()
    if (!st.tables.exists(_.identifier == identifier))
      writeState(st.copy(tables = st.tables :+
        CatalogEntry(identifier, dir.toString, System.currentTimeMillis())))
    table
  }

  /** Resolve an identifier → table handle (reference `load_table`, `:385`). */
  def loadTable(identifier: String): LakehouseTable = {
    val entry = readState().tables.find(_.identifier == identifier).getOrElse(
      throw new NoSuchElementException(s"table not found in catalog: $identifier"))
    LakehouseTable.load(spark, new Path(entry.location))
  }
}
