package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog application — the lakehouse MERGE/time-travel pair
  * (Delta/Iceberg "table state AS OF version k" reconstructed from a
  * base snapshot plus a keyed changelog of U/D operations):
  *
  *   - [[latestState]] collapses the whole changelog latest-wins and
  *     merges over base (q51's consumption shape);
  *   - [[asOfVersion]] is the time-travel READ: the same collapse
  *     over the changelog PREFIX `ver <= k` — the state exactly as
  *     of version k (q63). `asOfVersion(b, cl, Long.MaxValue)` ==
  *     `latestState(b, cl)` by construction (ChangeLogSpec pins it,
  *     along with monotonicity: replaying prefixes k-1 → k applies
  *     exactly version k's ops).
  *
  * Contract shape: base (keyCol, valCol); changelog (keyCol, verCol,
  * opCol ∈ {'U','D'}, newValCol). Upserts override base values,
  * deletes drop the key, keys absent from base insert. `action`
  * labels the provenance (base / updated / inserted) — presence in
  * base is detected by a join-side marker, never by valCol
  * NULL-ness, so a base row whose value IS NULL still reads 'base' /
  * 'updated' correctly.
  *
  * NULL semantics (documented contract): an 'U' entry whose
  * newValCol is NULL is a "touch" — the key survives with its base
  * value (coalesce(new, base)); a key inserted by such an entry
  * carries a NULL value. Version ties (two changelog entries with
  * the same (key, ver)) are resolved deterministically: op DESC
  * NULLS LAST ('U' over 'D'), then newValCol DESC NULLS LAST — a
  * malformed feed cannot flip the merge between runs.
  *
  * Scale shape: ONE window over the changelog partitioned by key (at
  * rest a changelog is stored sorted by (key, ver), making this a
  * merge pass) + one full-outer shuffle join on the key — both linear;
  * the output is snapshot-sized, never |base|·|versions|.
  */
object ChangeLog {

  def latestState(base: DataFrame, changelog: DataFrame,
                  keyCol: String = "k", verCol: String = "ver",
                  opCol: String = "op", valCol: String = "price",
                  newValCol: String = "new_price"): DataFrame = {
    val wv = Window.partitionBy(keyCol).orderBy(col(verCol).desc,
      col(opCol).desc_nulls_last, col(newValCol).desc_nulls_last)
    val latest = changelog.withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col(keyCol), col(opCol), col(newValCol))
    base.withColumn("__in_base", lit(1))
      .join(latest, Seq(keyCol), "full_outer")
      .filter(coalesce(col(opCol), lit("")) =!= "D")
      .select(col(keyCol),
        coalesce(col(newValCol), col(valCol)).as(valCol),
        when(col(opCol).isNull, "base")
          .when(col("__in_base").isNull, "inserted")
          .otherwise("updated").as("action"))
  }

  /** Snapshot time travel: table state AS OF version `k` — replay
    * only changelog entries with `ver <= k`. A key whose entries are
    * ALL beyond k contributes nothing (its base row, if any, shows
    * as 'base'), which is exactly the lakehouse read semantics.
    */
  def asOfVersion(base: DataFrame, changelog: DataFrame, k: Long,
                  keyCol: String = "k", verCol: String = "ver",
                  opCol: String = "op", valCol: String = "price",
                  newValCol: String = "new_price"): DataFrame =
    latestState(base, changelog.filter(col(verCol) <= k),
      keyCol, verCol, opCol, valCol, newValCol)

  /** Delta CDF's four-way change typing over the store's raw feed:
    * [[graft.sources.TableLog.readChangeFeed]] emits file-level
    * inserts/deletes (plus row-exact DV deletes), so an UPDATE — a
    * merge suppressing a key's old row and writing its new state —
    * surfaces as a delete AND an insert of the same key at the same
    * version. Delta's `table_changes` reports that pair as
    * `update_preimage`/`update_postimage`; this reclassifies exactly
    * those pairs (key present on BOTH sides of one version) and
    * leaves pure inserts/deletes untouched. One grouped aggregate +
    * broadcast-or-shuffle join on (version, key) — linear in the
    * feed, which is itself churn-sized, never table-sized. A key the
    * feed sees N>1 times on one side (a multi-row key) reclassifies
    * every row — the store's merge contract is primary-keyed, so
    * that arises only from caller-side key reuse.
    */
  def updateImages(feed: DataFrame, keyCol: String): DataFrame = {
    val sides = feed.groupBy(col("_commit_version").as("__v"),
        col(keyCol).as("__k"))
      .agg(
        max(when(col("_change_type") === "insert", 1).otherwise(0)).as("__hi"),
        max(when(col("_change_type") === "delete", 1).otherwise(0)).as("__hd"))
    // null-SAFE join: groupBy keeps a null key as its own group, but
    // an equality join would drop every null-key feed row on the
    // floor — they must pass through (classified by their own group's
    // sides like any other key), never vanish from the feed
    feed.join(sides, col("_commit_version") <=> col("__v") &&
        col(keyCol) <=> col("__k"))
      .withColumn("_change_type",
        when(col("__hi") === 1 && col("__hd") === 1,
          when(col("_change_type") === "insert", "update_postimage")
            .otherwise("update_preimage"))
          .otherwise(col("_change_type")))
      .drop("__v", "__k", "__hi", "__hd")
  }
}
