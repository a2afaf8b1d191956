package graft.ops

import org.apache.spark.sql.DataFrame

/** Keyed upsert (J7, MERGE-by-key) — the reference's id-sync rewrite
  * (/root/reference/src/fix_id_mapping.py:85-207: fetch doc, fix the key
  * field, re-index over the same id) as a declarative merge: rows of
  * `existing` whose key appears in `updates` are replaced, everything else
  * is kept, new keys are appended. Equivalent to SQL MERGE ... WHEN MATCHED
  * UPDATE WHEN NOT MATCHED INSERT with whole-row updates.
  *
  * Plan shape: one left-anti join on the key + a union — both sides shuffle
  * once on the key; with `updates` small (the usual id-fix case) the
  * anti-join broadcasts and the merge is map-side.
  */
object Merge {

  def upsertByKey(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(existing.columns.sameElements(updates.columns),
      s"upsert schema mismatch: ${existing.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    existing.join(updates.select(key), Seq(key), "left_anti")
      .unionByName(updates)
  }
}
