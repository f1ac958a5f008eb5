package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Add-only schema evolution for stored tables — the engine analog of
  * the reference's runtime migrations (migrate_schema.py:15-42 probes
  * PRAGMA table_info and ALTER TABLE ADD COLUMN;
  * main_scraper.py:245-251 and update_playlists_metadata.py:44-52 do
  * the same ad hoc before writes). Semantics: a merge may ADD columns
  * (old rows read as null) and may OMIT stored columns (incoming rows
  * get null); it never drops or retypes a stored column — name
  * collisions cast the incoming side to the STORED type, keeping the
  * table schema authoritative exactly like ALTER TABLE ADD COLUMN
  * keeps existing columns intact.
  */
object SchemaEvolution {

  /** Widen `stored` and `incoming` to the union schema: stored column
    * order first (incoming cast to stored types, null where absent),
    * then genuinely new incoming columns appended (null-filled on the
    * stored side). Both outputs have identical schemas, ready for any
    * keyed merge. */
  def align(stored: DataFrame, incoming: DataFrame): (DataFrame, DataFrame) = {
    val storedFields = stored.schema.fields
    val storedNames = storedFields.map(_.name).toSet
    val newFields = incoming.schema.fields.filterNot(f => storedNames.contains(f.name))
    val incomingNames = incoming.schema.fields.map(_.name).toSet

    val storedOut = stored.select(
      storedFields.map(f => col(f.name)) ++
        newFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val incomingOut = incoming.select(
      storedFields.map { f =>
        if (incomingNames.contains(f.name)) {
          val inc = incoming.schema(incoming.schema.fieldIndex(f.name)).dataType
          // equal modulo nullability: parquet bytes cannot tell the
          // forms apart, and the nullable→non-null direction is a
          // REFUSED narrowing cast (a streamed frame arrives forced
          // nullable-up) — keep the column as-is
          if (relax(inc) == relax(f.dataType)) col(f.name).as(f.name)
          else col(f.name).cast(f.dataType).as(f.name)
        } else lit(null).cast(f.dataType).as(f.name)
      } ++
        newFields.map(f => col(f.name)): _*)
    (storedOut, incomingOut)
  }

  /** Recursive nullable-up (the `asNullable` Spark keeps
    * `private[spark]`): every field nullable, every array
    * containsNull, every map valueContainsNull. Types equal after
    * relaxing are byte-identical in parquet. */
  def relax(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = relax(f.dataType), nullable = true)))
    case a: ArrayType =>
      a.copy(elementType = relax(a.elementType), containsNull = true)
    case m: MapType =>
      m.copy(valueType = relax(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** True when a merge of `incoming` into `stored` needs alignment. */
  def differs(stored: DataFrame, incoming: DataFrame): Boolean =
    stored.schema != incoming.schema
}
