package graft.sources

import java.io.InputStreamReader
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S2 (Angelo_ETL_Task.py:21-26, :144-145): ZIP-entry → CSV →
  * DataFrame. The reference unzips in driver memory
  * (`ZipFile(BytesIO(resp)).open(name)` → `pd.read_csv`); here the
  * unzip is distributed: each zip file is one `binaryFile` row, its
  * entry is expanded on an executor, and the CSV stream is parsed
  * there with univocity — the same parser Spark's CSV source uses —
  * so RFC-4180 quoted fields with embedded newlines and `""` escapes
  * parse exactly like the reference's pandas path. At scale each
  * archive is one task — reading 10k zips fans out over the cluster
  * with no driver materialization and no schema-inference pass.
  */
object ZipSource {

  /** Read the named CSV entry from every zip under `path`.
    *
    * @param entryName  entry to extract (exact match, e.g. "Loinc.csv");
    *                   null/empty picks the first `.csv` entry
    * @param schema     explicit column schema, matched positionally;
    *                   the header record of each file is dropped, short
    *                   records pad with null, empty fields read as null
    */
  def zipEntryCsv(spark: SparkSession, path: String, entryName: String,
                  schema: StructType): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
    val records = bin.flatMap { bytes =>
      val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      Iterator
        .continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .find(e => !e.isDirectory &&
          (if (entryName == null || entryName.isEmpty)
            e.getName.toLowerCase.endsWith(".csv")
          else e.getName == entryName))
        .map { _ =>
          val settings = new CsvParserSettings()
          settings.setMaxCharsPerColumn(-1)
          settings.setLineSeparatorDetectionEnabled(true)
          settings.setNumberOfRowsToSkip(1) // header; schema is explicit
          // one parser instance per entry, records streamed through it
          new CsvParser(settings)
            .iterate(new InputStreamReader(zin, StandardCharsets.UTF_8))
            .iterator.asScala.map(_.toSeq)
        }
        .getOrElse(Iterator.empty)
    }
    records.toDF("__fields").select(
      schema.fields.zipWithIndex.map { case (f, i) =>
        // `get` is null (not an ANSI error) past the end of short rows;
        // try_cast keeps a malformed typed cell null (pandas/PERMISSIVE
        // semantics) instead of failing the job under ANSI mode
        get(col("__fields"), lit(i)).try_cast(f.dataType).as(f.name)
      }: _*)
  }
}
