package graft.operators

/** Threshold dials that turn the persisted indexes' `health()`
  * measurements into maintenance actions — the policy half of the
  * measure/act split: [[IvfIndex.health]]/[[MinHashIndex.health]]
  * measure, [[IvfIndex.maintain]]/[[MinHashIndex.maintain]] act, and
  * the streaming probes ([[graft.streaming.StreamingIvfProbe]],
  * [[graft.streaming.StreamingIndexProbe]]) evaluate the policy every
  * `checkEvery` committed batches so a long-running ingest
  * self-maintains instead of degrading until an operator notices.
  *
  * Dials (all "exceed ⇒ act"):
  *  - `checkEvery`: batches between health evaluations. health() costs
  *    one scan over the index data — meaningful beside a micro-batch —
  *    so the cadence is a dial, not per-batch.
  *  - `maxTombstonePermille`: compact/fold when pending tombstones
  *    exceed this fraction of live rows (deleted rows still occupy
  *    files and, on the IVF side, subtract from pruning counts at
  *    every search).
  *  - `maxDuplicatePermille`: compact/fold when duplicate-id rows (the
  *    crashed-then-retried append fingerprint) exceed this fraction.
  *  - `maxImbalance`: IVF only — retrain when the max/mean cluster-size
  *    factor exceeds this (drifting ingest under the frozen assignment
  *    skews lists, degrading pruning; MinHash bands have no
  *    equivalent, so [[MinHashIndex.maintain]] ignores it).
  *  - `minRows`: below this corpus size nothing fires — rewriting a
  *    tiny index costs more than the degradation it heals, and
  *    early-ingest cluster shapes read as imbalance without being
  *    drift.
  *  - `targetListSize` (IVF only): the FIXED-LIST-SIZE dial — the one
  *    that makes streaming per-batch search cost genuinely flat. A
  *    streaming index freezes k at bootstrap, so mean list size n/k
  *    grows with every ingested batch and search candidates
  *    (nprobe·n/k per probe) grow with the corpus; at k = √n they
  *    still grow as √n. With a target L, once the mean list exceeds
  *    2·L the index retrains with k = ⌈n/L⌉, restoring ~L-row lists —
  *    per-probe candidates stay nprobe·L, a CONSTANT, between
  *    retrains, and the doubling trip point means O(log n) retrains
  *    amortize over an unbounded ingest. MinHash bands have no list
  *    equivalent, so [[MinHashIndex.maintain]] ignores it.
  *
  * Defaults are deliberate: 10% tombstones / 5% duplicates match the
  * usual LSM/vacuum dead-row thresholds, imbalance 4.0 only fires on
  * real drift (uniform corpora sit near 1–2), checkEvery 16 prices
  * the health scan at ~6% of batch throughput in the worst case, and
  * targetListSize defaults OFF (a deployment picks L from its latency
  * budget: candidates/probe = nprobe·L). */
final case class MaintenancePolicy(
    checkEvery: Int = 16,
    maxTombstonePermille: Int = 100,
    maxDuplicatePermille: Int = 50,
    maxImbalance: Double = 4.0,
    minRows: Long = 1024L,
    targetListSize: Option[Long] = None) {
  require(checkEvery > 0, s"checkEvery must be positive: $checkEvery")
  require(maxTombstonePermille >= 0 && maxDuplicatePermille >= 0,
    "permille dials must be non-negative")
  require(maxImbalance >= 1.0, s"imbalance factor is >= 1: $maxImbalance")
  require(targetListSize.forall(_ > 0),
    s"targetListSize must be positive: $targetListSize")
}
