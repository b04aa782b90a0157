package graft.sources.pagedjson

import org.apache.spark.sql.sources.DataSourceRegister

/** Registers the short name so users can write
  * `spark.read.format("paged-json")` (META-INF/services wiring). */
class PagedJsonSourceRegister extends PagedJsonSource with DataSourceRegister {
  override def shortName(): String = "paged-json"
}
