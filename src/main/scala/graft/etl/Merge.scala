package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split/union and the reference's two-stage "flexible" join.
  *
  * The reference loops over every Grammy song row in the driver,
  * trying an exact (artist, track) match first and falling back to a
  * prefix match (dags/etl_grammy_spotify.py:224-248). That is O(n·m)
  * driver work; here both stages are declarative left joins and the
  * priority is a `coalesce`, so Catalyst plans them as two hash joins
  * (broadcast when the catalog side is small).
  */
object Merge {

  /** `pd.concat` analog with schema safety. */
  def unionSplits(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)

  /** Two-stage enrichment: try `exactKey`, fall back to `fuzzyKey`.
    *
    * `exactCatalog` / `fuzzyCatalog` must be 1-row-per-key with
    * columns (`key`, payload...). Payload columns are suffixed
    * `_exact` / `_fuzzy`; callers coalesce by priority.
    *
    * No broadcast hint here: the CALLER knows whether a catalog is
    * dimension-sized (wrap it in `broadcast(...)`) or fact-sized (let
    * the planner pick sort-merge). A forced hint is honored past
    * `autoBroadcastJoinThreshold` and would OOM the driver on a
    * catalog that grows with the data. Catalog key columns are
    * dropped BY REFERENCE so a request column with the same name
    * survives.
    */
  def twoStageJoin(
      requests: DataFrame,
      exactCatalog: DataFrame,
      exactKey: (String, String),
      fuzzyCatalog: DataFrame,
      fuzzyKey: (String, String)): DataFrame = {
    val ec = exactCatalog.columns.foldLeft(exactCatalog)((d, c) =>
      if (c == exactKey._2) d else d.withColumnRenamed(c, s"${c}_exact"))
    val fc = fuzzyCatalog.columns.foldLeft(fuzzyCatalog)((d, c) =>
      if (c == fuzzyKey._2) d else d.withColumnRenamed(c, s"${c}_fuzzy"))
    requests
      .join(ec, requests(exactKey._1) === ec(exactKey._2), "left")
      .drop(ec(exactKey._2))
      .join(fc, requests(fuzzyKey._1) === fc(fuzzyKey._2), "left")
      .drop(fc(fuzzyKey._2))
  }
}
