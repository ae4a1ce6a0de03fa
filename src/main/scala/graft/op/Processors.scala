package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-row processor library. Each reference processor mutates one
  * message in place on the ring (pipe-s `pkg/core/component.go:23-26`);
  * here each is a pure `DataFrame => DataFrame` so Catalyst fuses the whole
  * chain into one whole-stage-codegen'd pass — no per-row dispatch, no UDFs.
  */
object Processors {

  /** P1 `MysqlDMLFilter` (`pkg/processor/filter/mysqldml.go:50-63`):
    * keep the event iff the full table name matches the regex AND the
    * operation is in the allowed set. Declarative filter → pushed by
    * Catalyst below later projections and into scans where possible. */
  def dmlFilter(tablePattern: String, ops: Seq[String])(df: DataFrame): DataFrame =
    df.filter(concat_ws(".", col("db"), col("tbl")).rlike(tablePattern) &&
      col("op").isin(ops: _*))

  /** P2 `MysqlDMLToDBChangeConverter` (`dml_to_dbchange.go:30-74`):
    * positional row arrays + schema column names → named map. Built-in
    * `map_from_arrays`; arity mismatch surfaces as a null map (the
    * reference hard-errors — callers can assert with a filter). */
  def positionalToNamed(colNames: Seq[String], arrCol: String, outCol: String)(df: DataFrame): DataFrame =
    df.withColumn(outCol,
      map_from_arrays(typedlit(colNames), col(arrCol).cast("array<string>")))

  /** P3 `DBChangeMappingProcessor` (`pkg/processor/mapping/dbchange.go`):
    * db/table/column renames + operation remap. Column rename on a
    * map-typed row image is a `transform_keys`; on the flat schema it is
    * `withColumnRenamed`. Operation remap `insert→update` etc. with the
    * old/new row swap rules of `dbchange.go:239-269`. */
  def remapOperation(mapping: Map[String, String])(df: DataFrame): DataFrame = {
    val m = typedlit(mapping)
    df.withColumn("op", coalesce(element_at(m, col("op")), col("op")))
  }

  def renameMapKeys(rowCol: String, renames: Map[String, String])(df: DataFrame): DataFrame = {
    val m = typedlit(renames)
    df.withColumn(rowCol,
      transform_keys(col(rowCol), (k, _) => coalesce(element_at(m, k), k)))
  }

  def renameTable(dbMap: Map[String, String], tblMap: Map[String, String])(df: DataFrame): DataFrame =
    df.withColumn("db", coalesce(element_at(typedlit(dbMap), col("db")), col("db")))
      .withColumn("tbl", coalesce(element_at(typedlit(tblMap), col("tbl")), col("tbl")))

  /** P3 logical-name indirection (`dbchange.go:166-219`): when a
    * logical-name variable is configured, the mapping is looked up by the
    * LOGICAL name (from [[nameCatcher]]) and applied to the PHYSICAL name
    * by first-occurrence substring replace — `sbtest42` with
    * `sbtest → test` becomes `test42`, the shard suffix surviving
    * (`strings.Replace(physical, logical, target, 1)` in the reference).
    * Unmapped logical names and non-occurring substrings pass through. */
  def renameTableLogical(tblMap: Map[String, String],
      logicalCol: String = "logical_table", tblCol: String = "tbl")(df: DataFrame): DataFrame = {
    val target = element_at(typedlit(tblMap), col(logicalCol))
    val pos = instr(col(tblCol), col(logicalCol))
    val replaced = concat(
      col(tblCol).substr(lit(1), pos - 1),
      target,
      col(tblCol).substr(pos + length(col(logicalCol)), length(col(tblCol))))
    df.withColumn(tblCol,
      when(target.isNotNull && pos > 0, replaced).otherwise(col(tblCol)))
  }

  /** P4 `DBTableNameCatcher` (`pkg/processor/value/dbtablename.go:62-87`):
    * regex-capture the logical table from a sharded physical name
    * (`sbtest42` → `sbtest`). The reference stashes it in a per-message
    * variable side-channel; a derived column IS the side channel here. */
  def nameCatcher(pattern: String, outCol: String = "logical_table")(df: DataFrame): DataFrame =
    df.withColumn(outCol, regexp_extract(col("tbl"), pattern, 1))

  /** P5 `ColumnValueProcessor` (`pkg/processor/value/columnvalue.go:38-52`):
    * pick a configured column per logical table as the partition key
    * (used downstream as the Kafka message key). Config lookup compiles to
    * a literal-map lookup + `element_at` on the row image — codegen'd, no
    * UDF. */
  def columnValue(keyColPerTable: Map[String, String], rowCol: String,
      outCol: String = "partition_key")(df: DataFrame): DataFrame = {
    val m = typedlit(keyColPerTable)
    df.withColumn(outCol, element_at(col(rowCol), element_at(m, col("logical_table"))))
  }

  /** P6 `ValueMapper` (`pkg/processor/value/valuemapper.go:38-47`):
    * static dictionary lookup, e.g. logical table → Kafka topic. */
  def valueMap(mapping: Map[String, String], inCol: String, outCol: String)(df: DataFrame): DataFrame =
    df.withColumn(outCol, element_at(typedlit(mapping), col(inCol)))

  /** P7 `JsonMarshaller`/`DBChangeUnmarshaller` (`pkg/processor/json/`):
    * event → JSON bytes and back. Pure built-ins; the round trip is the
    * wire format for the Kafka path (K4 sink / S3 source). */
  def marshal(outCol: String = "json")(df: DataFrame): DataFrame =
    df.withColumn(outCol, to_json(struct(df.columns.map(col): _*)))

  def unmarshal(jsonCol: String, schema: org.apache.spark.sql.types.StructType)(df: DataFrame): DataFrame =
    df.select(from_json(col(jsonCol), schema).as("e")).select("e.*")

  /** K1 routing (`pkg/output/mysql/stream/streamoutput.go:136-162`): the
    * reference FNV-hashes (db,table,pk) onto N worker queues so per-key
    * order survives parallelism. Spark-side the same contract is
    * `repartition(n, keys) + sortWithinPartitions(seq)`: one shuffle,
    * order within key guaranteed inside each partition. */
  def route(n: Int, keys: Seq[String])(df: DataFrame): DataFrame =
    df.repartition(n, keys.map(col): _*).sortWithinPartitions(col("seq"))
}
