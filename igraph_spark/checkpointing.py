"""Superstep runner: caching, lineage truncation, checkpoint + resume.

The reference's iterative solvers double-buffer two dense state vectors
(/root/reference/src/structural_properties.c:1429-1480).  The Spark
analog (north rule): an iterative loop over immutable vertex-state
DataFrames, where each superstep

  * persists the new state and unpersists state from two rounds ago,
  * truncates lineage every ``checkpoint_every`` supersteps
    (``localCheckpoint`` — without it the plan grows linearly and the
    driver melts after ~50 rounds),
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
                 lineage_fingerprint: bool = False):
        self.spark = spark
        self.run_dir = run_dir
        self.checkpoint_every = max(1, int(checkpoint_every))
        self.storage = storage
        self.lineage_fingerprint = lineage_fingerprint
        self.history: list[dict] = []
        self._prev: DataFrame | None = None
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
        elif (step + 1) % self.checkpoint_every == 0:
            # a BSP round typically references the previous state more
            # than once (update + convergence metric), so the Catalyst
            # plan DOUBLES per un-truncated round; localCheckpoint every
            # checkpoint_every rounds caps the fan-out at
            # 2^checkpoint_every subtrees (keep it <= ~5)
            out = new_state.localCheckpoint(eager=True)
            new_state.unpersist()
        elif new_state.storageLevel != StorageLevel.NONE:
            # caller already persisted (and materialized via its own
            # convergence aggregate) — re-persisting would only emit
            # "already cached" noise and a redundant count
            out = new_state
        else:
            out = new_state.persist(self.storage)
            out.count()  # materialize so the old state can be dropped
        if self._prev is not None:
            self._prev.unpersist()
        self._prev = out
        return out

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
