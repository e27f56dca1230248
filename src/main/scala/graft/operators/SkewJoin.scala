package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: detect the hot keys with bounded state, then
  * salt-split them so no single reducer owns a hot key's full row set.
  *
  * Why this exists when AQE has OptimizeSkewedJoin: AQE splits an
  * already-materialized skewed SHUFFLE PARTITION of a sort-merge join,
  * which (a) only fires when the join's output partitioning may be
  * destroyed — a join feeding a `groupBy` on the same key keeps its
  * partitioning and AQE must leave it alone, (b) still makes one task
  * read every block of the hot partition's small side, and (c) happens
  * after the skewed shuffle files are already written. Salting changes
  * the KEY DOMAIN itself — `(key, salt)` — so every exchange downstream
  * of the join sees a balanced domain from the start. The cost is
  * replicating the hot keys' right-side rows `salt` times, which is why
  * only provably-hot keys (bounded Misra-Gries detection, never a full
  * `groupBy.count` over the key dictionary) take the salted path; the
  * cold majority joins untouched.
  *
  * Result is EXACTLY `left.join(right, left(lk) === right(rk), joinType)`:
  * the salt is an extra conjunct that each (left-row, right-row) pair
  * satisfies for exactly one salt value (the left row's deterministic
  * salt; the right row is replicated to all of them), so pair
  * multiplicity is preserved. Null left keys route to the cold branch,
  * where the ordinary join already implements their semantics (dropped
  * for inner/semi, null-extended for left, kept for anti).
  *
  * Supported join types: `inner`, `left`/`left_outer`, `left_semi`,
  * `left_anti` — the types where right-side replication cannot
  * manufacture rows. RIGHT/FULL outer would emit one null-extended copy
  * of an unmatched hot right row PER SALT; flip the sides for those.
  *
  * The left salt is `xxhash64` over all left columns (deterministic —
  * a recomputed task re-derives identical salts, so shuffle replays
  * stay consistent; identical duplicate rows share a bucket, which only
  * matters if the skew IS duplicate rows — dedup first in that case).
  *
  * Column names must be disjoint across the two frames (the usual
  * equi-join hygiene; the gate and spec join on differently-named keys).
  *
  * At 100 TB: detection is two bounded passes (Misra-Gries partials +
  * a candidate recount, ≤ hotK·partitions rows ever collected), hot
  * keys are ≤ hotK literals pushed to the scans as OR-of-equals (both
  * branches prune at the parquet reader), and the driver never holds
  * more than the hot-key list.
  */
object SkewJoin {

  /** Join `left` to `right` on `left(leftKey) === right(rightKey)`,
    * salt-splitting keys whose left-side frequency exceeds n/hotK.
    *
    * @param hotK  hotness threshold: keys with freq > n/hotK are salted
    *              (and at most hotK-1 can exist, bounding driver state)
    * @param salt  salt fan-out for hot keys; right hot rows replicate
    *              this many times
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      joinType: String = "inner",
      hotK: Int = 64,
      salt: Int = 16): DataFrame = {
    val jt = joinType.toLowerCase match {
      case "inner" => "inner"
      case "left" | "left_outer" | "leftouter" => "left"
      case "left_semi" | "leftsemi" => "left_semi"
      case "left_anti" | "leftanti" => "left_anti"
      case other => throw new IllegalArgumentException(
        s"skew join supports inner/left/left_semi/left_anti (flip sides for right/full), got $other")
    }
    require(salt >= 2, s"salt must be >= 2, got $salt")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: ${overlap.mkString(", ")}")

    def plain(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, l(leftKey) === r(rightKey), jt)

    // bounded hot-key detection: ≤ hotK-1 candidates ever leave the
    // executors (Sketches.heavyHitters collects k·partitions partials)
    val keyType = left.schema(leftKey).dataType
    val hotStrs: Seq[String] =
      Sketches.heavyHitters(left.select(col(leftKey)), leftKey, hotK)
        .select("item").collect().map(_.getString(0)).toSeq
    if (hotStrs.isEmpty) return plain(left, right)

    // hot-key literals back in the key's native type; OR-of-equals keeps
    // the predicate scan-pushable on both sides
    val hotLits = hotStrs.map(s => lit(s).cast(keyType))
    def isHot(k: org.apache.spark.sql.Column) =
      hotLits.map(k === _).reduce(_ || _)

    // null keys: IS NOT TRUE routes them cold, where join semantics
    // already handle them; hot branch takes only provably-hot rows
    val coldL = left.where(not(coalesce(isHot(col(leftKey)), lit(false))))
    val coldR = right.where(not(coalesce(isHot(col(rightKey)), lit(false))))
    val hotL = left.where(isHot(col(leftKey)))
      .withColumn("__graft_salt", pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)))
    val hotR = right.where(isHot(col(rightKey)))
      .withColumn("__graft_rsalt",
        explode(array((0 until salt).map(i => lit(i.toLong)): _*)))

    val hotJoined = hotL
      .join(hotR, hotL(leftKey) === hotR(rightKey) &&
        hotL("__graft_salt") === hotR("__graft_rsalt"), jt)
      .drop("__graft_salt", "__graft_rsalt")
    hotJoined.unionByName(plain(coldL, coldR))
  }
}
