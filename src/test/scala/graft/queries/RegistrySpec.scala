package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.SparkSpec

/** Catalog-cache lifecycle (ADVICE r5): rewriting parquet under a
  * cached dir must be observable after `invalidate`, and the cache must
  * not serve a plan pinned to the old file listing afterwards.
  */
class RegistrySpec extends SparkSpec {

  test("invalidate(dir) makes a rewritten table visible") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-registry").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/tbl.parquet")
    assert(Registry.t(spark, dir, "tbl").count() === 2L)
    // rewrite with different contents; cached plan pins the old files
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/tbl.parquet")
    Registry.invalidate(dir)
    assert(Registry.t(spark, dir, "tbl").count() === 3L)
  }
}
