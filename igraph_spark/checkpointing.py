"""Superstep runner: caching, lineage truncation, checkpoint + resume.

The reference's iterative solvers double-buffer two dense state vectors
(/root/reference/src/structural_properties.c:1429-1480).  The Spark
analog (north rule): an iterative loop over immutable vertex-state
DataFrames, where each superstep

  * truncates lineage EVERY superstep (``localCheckpoint``) and
    unpersists the caller's cache of the superseded state — see the
    comment in ``advance`` for why per-round truncation beats periodic
    truncation + CacheManager reliance in between,
  * optionally writes a durable checkpoint: state parquet +
    ``manifest.json`` carrying the superstep id, per-partition lineage
    (row count + order-insensitive xxhash64 digest per partition) and
    the convergence-metric history — enough to resume mid-run and to
    audit that a resumed run is bit-identical.

Algorithms drive it as:

    runner = SuperstepRunner(spark, run_dir=..., checkpoint_every=10)
    state, start, hist = runner.start(init_df, params={...})
    for step in range(start, max_iter):
        new = body(state)
        state = runner.advance(step, new, metrics={"delta": d})
        if d < tol: break
    runner.finish(state)
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

MANIFEST = "manifest.json"


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition (count, digest) fingerprint of a state DataFrame.

    Digest is an order-insensitive sum of per-row xxhash64 over all
    columns — stable across executor scheduling, so an interrupted and
    a resumed run can be compared partition-by-partition.
    """
    cols = [F.col(c) for c in df.columns]
    rows = (df.select(F.spark_partition_id().alias("pid"),
                      F.xxhash64(*cols).alias("h"))
              .groupBy("pid")
              .agg(F.count("*").alias("rows"), F.sum("h").alias("digest"))
              .orderBy("pid")
              .collect())
    return [{"pid": int(r.pid), "rows": int(r.rows), "digest": int(r.digest)}
            for r in rows]


class SuperstepRunner:
    def __init__(self, spark: SparkSession, run_dir: str | None = None,
                 checkpoint_every: int = 5,
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                 lineage_fingerprint: bool = False,
                 fused_eval: bool = False):
        """``fused_eval=True`` switches ``advance`` to a LAZY
        localCheckpoint: the caller's very next action (every BSP loop
        here runs its convergence aggregate right after ``advance``)
        materializes the superstep AND truncates lineage in ONE job,
        instead of an eager-checkpoint job followed by a second
        cached-scan job.  Contract: the caller MUST run an action on
        the returned state before building the next superstep on it —
        otherwise lineage compounds exactly like the pre-round-4 code.
        Only the non-durable path is fused (a durable checkpoint's
        parquet write is already the materializing action)."""
        self.spark = spark
        self.run_dir = run_dir
        self.checkpoint_every = max(1, int(checkpoint_every))
        self.storage = storage
        self.lineage_fingerprint = lineage_fingerprint
        self.fused_eval = bool(fused_eval)
        self.history: list[dict] = []
        self._prev: DataFrame | None = None
        self._defer_unpersist: DataFrame | None = None
        self._t0 = time.monotonic()

    # ------------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.run_dir, MANIFEST)

    def _read_manifest(self) -> dict | None:
        if not self.run_dir:
            return None
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _write_manifest(self, step: int, state_path: str,
                        lineage: list[dict], params: dict,
                        extra: dict | None = None) -> None:
        doc = {
            "superstep": step,
            "state_path": state_path,
            "partitions": lineage,
            "history": self.history,
            "params": params,
        }
        if extra:
            doc.update(extra)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic: never half-written

    # ------------------------------------------------------------------
    def start(self, init_df: DataFrame, params: dict | None = None
              ) -> tuple[DataFrame, int, list[dict]]:
        """Return (state, first_superstep, history), resuming from the
        manifest when the run_dir holds one with matching params."""
        self._params = params or {}
        man = self._read_manifest()
        if (man is not None and man.get("params") == self._params
                and not man.get("completed", False)):
            state = self.spark.read.parquet(man["state_path"])
            # a manifest written by an older code version can match on
            # params yet hold a state parquet with a different schema
            # (e.g. pagerank's (id, pr) -> (id, pr, dangling, reset));
            # resuming would then fail mid-loop on unresolved columns.
            # Validate the column set against the caller's init_df and
            # fall back to a fresh run on mismatch.
            if set(state.columns) == set(init_df.columns):
                self.history = man["history"]
                state = state.persist(self.storage)
                self._prev = state
                return state, man["superstep"] + 1, self.history
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
        state = init_df.persist(self.storage)
        self._prev = state
        return state, 0, self.history

    def advance(self, step: int, new_state: DataFrame,
                metrics: dict | None = None) -> DataFrame:
        """Register the new state for superstep ``step``; handles
        persist/unpersist rotation, lineage truncation, durable
        checkpointing."""
        rec = {"superstep": step,
               "elapsed_sec": round(time.monotonic() - self._t0, 4)}
        if metrics:
            rec.update(metrics)
        self.history.append(rec)

        durable = self.run_dir and (step + 1) % self.checkpoint_every == 0
        if durable:
            path = os.path.join(self.run_dir, f"state_{step:06d}")
            new_state.write.mode("overwrite").parquet(path)
            reloaded = self.spark.read.parquet(path).persist(self.storage)
            lineage = (partition_lineage(reloaded)
                       if self.lineage_fingerprint else [])
            self._write_manifest(step, path, lineage, self._params)
            # the caller-persisted input is superseded by the reload —
            # drop it here, or one cached DF leaks per durable round
            new_state.unpersist()
            self._prune_states(keep=path)
            out = reloaded
        else:
            # lineage truncation EVERY superstep.  Relying on persist +
            # CacheManager between periodic checkpoints looks cheaper
            # but is not: once a state plan's leaf is a localCheckpoint
            # LogicalRDD, the CacheManager's sameResult lookup fails on
            # re-reference (the self-join dedup re-instances the leaf
            # and its outputPartitioning doesn't canonicalize), so each
            # post-checkpoint superstep silently recomputed every
            # shuffle back to the last checkpoint.  Event-log profile
            # at 10M edges: shuffle/superstep grew 128->256->384->513->
            # 641 MB across supersteps 5-9 under every-5th truncation;
            # truncating every round holds it flat at 128 MB and runs
            # 10 pagerank supersteps in 29 s vs 44-69 s (and removes
            # the GC amplification that made bench samples swing 2x).
            # The extra cost is one cache->RDD copy of the O(V) state.
            # With fused_eval the checkpoint is LAZY: the caller's
            # convergence aggregate (always the immediately following
            # statement in the BSP loops) computes the superstep and
            # stores the truncated RDD in one job — halves the
            # jobs/superstep without giving up per-round truncation.
            out = new_state.localCheckpoint(eager=not self.fused_eval)
            if new_state.storageLevel != StorageLevel.NONE:
                new_state.unpersist()
        if self.fused_eval and not durable:
            # the previous state's blocks feed the (not yet run)
            # materializing action — defer its unpersist one round
            if self._defer_unpersist is not None:
                self._defer_unpersist.unpersist()
            self._defer_unpersist = self._prev
        elif self._prev is not None:
            self._prev.unpersist()
        self._prev = out
        return out

    def update_metrics(self, step: int, metrics: dict) -> None:
        """Attach metrics measured AFTER advance() to that superstep's
        history record, and rewrite the manifest when the step was
        durably checkpointed.

        The advance-then-measure pattern (the runner's eager checkpoint
        is the superstep's one full execution; the convergence aggregate
        then reads the checkpointed RDD) means delta/changed are only
        known after advance() has already serialized history into the
        durable manifest — patching ``runner.history[-1]`` alone would
        leave persisted manifests permanently missing the metric for
        exactly the checkpointed supersteps, so a resumed run's history
        would diverge from a straight run's (the manifest's stated audit
        contract).

        Only records up to the manifest's own superstep are ever
        persisted: the manifest must describe the state it points at,
        and writing later steps' records would hand a resumed run
        pre-existing history for the supersteps it is about to re-run,
        duplicating them (the run resumes from the manifest's step, so
        anything after it in history is provisional).  A later step's
        metric stays in the in-memory history and reaches the manifest
        with the next durable checkpoint's serialization.
        """
        for rec in reversed(self.history):
            if rec["superstep"] == step:
                rec.update(metrics)
                break
        else:
            return
        man = self._read_manifest()
        if (man is not None and man.get("params") == self._params
                and step <= man.get("superstep", -1)):
            man["history"] = [r for r in self.history
                              if r["superstep"] <= man["superstep"]]
            tmp = self._manifest_path() + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(man, fh, indent=1)
            os.replace(tmp, self._manifest_path())

    def _prune_states(self, keep: str) -> None:
        """Delete superseded durable state_* directories once a newer
        checkpoint has been committed to the manifest (the manifest
        points at ``keep``; anything older is unreachable)."""
        import shutil
        base = os.path.basename(keep)
        for name in sorted(os.listdir(self.run_dir)):
            if name.startswith("state_") and name < base:
                shutil.rmtree(os.path.join(self.run_dir, name),
                              ignore_errors=True)

    def finish(self, result: DataFrame, completed: bool = True) -> None:
        """Record the run result.  ``completed=True`` marks the run
        converged (a later ``start`` begins fresh); an interrupted /
        max-iter-truncated run keeps ``completed=False`` so the
        manifest's last durable state remains resumable."""
        if not self.run_dir:
            return
        path = os.path.join(self.run_dir, "result_final")
        result.write.mode("overwrite").parquet(path)
        man = self._read_manifest() or {}
        step = man.get("superstep",
                       self.history[-1]["superstep"] if self.history else -1)
        self._write_manifest(
            step, man.get("state_path", ""), man.get("partitions", []),
            self._params,
            extra={"completed": bool(completed), "result_path": path})
