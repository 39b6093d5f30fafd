"""Snapshot-table layer: Iceberg-shaped semantics on plain parquet.

The north rule calls for Iceberg tables with snapshot-based resume. The
sandbox image has no Iceberg jars (they need the runtime classpath), so this
module provides the same *semantics* behind a two-line abstraction:

* a table is a directory of parquet files plus ``_manifests/run-*.json``
  checkpoint manifests (run id, row count, files written, completion flag);
* ``append`` = parquet append + a manifest committed **after** the data (the
  manifest is the commit marker, like an Iceberg snapshot);
* ``read`` = read the parquet dir;
* resume = anti-join against the table's committed urls (the result cache
  J1/S2 of SURVEY.md — the output table *is* the cache).

On a cluster with Iceberg on the classpath, swap ``TableIO`` for
``spark.read.table`` / ``writeTo(...).append()`` — the pipeline only touches
this interface.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Manifest:
    run_id: str
    rows: int
    committed: bool
    # Relative paths of the data files this run wrote — the Iceberg-style
    # file ledger. None = unknown (legacy manifest): consumers must treat
    # ledger coverage as unverifiable, not as empty.
    files: list[str] | None = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)


class TableIO:
    """Parquet-backed table with manifest-committed appends."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.data_path = os.path.join(path, "data")
        self.manifest_dir = os.path.join(path, "_manifests")

    # -- metadata ---------------------------------------------------------
    def exists(self) -> bool:
        """True iff the table has any data files — deliberately NOT gated on
        a committed manifest: a crash between the data write and the
        manifest commit must still make the next run's anti-join see the
        orphaned rows (they are valid extractions), otherwise the rerun
        would duplicate them. Manifests are lineage, not the liveness
        signal."""
        if not os.path.isdir(self.data_path):
            return False
        try:
            return any(
                name.endswith(".parquet")
                for name in os.listdir(self.data_path)
            ) or any(
                f.endswith(".parquet")
                for _, _, files in os.walk(self.data_path)
                for f in files
            )
        except OSError:
            return False

    def manifests(self) -> list[Manifest]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as fh:
                    payload = json.load(fh)
                out.append(
                    Manifest(
                        payload["run_id"],
                        payload["rows"],
                        payload["committed"],
                        payload.get("files"),
                    )
                )
        return out

    def data_files(self) -> list[str]:
        """Relative paths of every parquet data file currently on disk."""
        out = []
        for root, _, files in os.walk(self.data_path):
            for f in files:
                if f.endswith(".parquet"):
                    out.append(
                        os.path.relpath(os.path.join(root, f), self.data_path)
                    )
        return sorted(out)

    def ledger_complete(self) -> bool:
        """True iff the committed manifests' file ledger EQUALS the set of
        data files on disk AND every committed manifest has a known row
        count. Disk ⊆ ledger rules out orphan files from a crash between a
        data write and its manifest commit; ledger ⊆ disk rules out the
        converse hole — a recorded file vacuumed/compacted/deleted after
        commit, which would leave ``sum(m.rows)`` over-counting the done
        side while the fast path still trusted it. Only under set equality
        is the ledger a faithful row accounting of the table."""
        manifests = [m for m in self.manifests() if m.committed]
        if not manifests:
            return False
        if any(m.rows < 0 or m.files is None for m in manifests):
            return False
        ledger = {f for m in manifests for f in m.files}
        return ledger == set(self.data_files())

    # -- IO ---------------------------------------------------------------
    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)

    def append(
        self,
        df: DataFrame,
        run_id: str | None = None,
        partition_by: list[str] | None = None,
        rows: int = -1,
    ) -> Manifest:
        """Write data, then commit the manifest (write-then-commit ordering:
        a crash between the two leaves an uncommitted snapshot that the next
        run's anti-join silently resolves — the urls are present, so they are
        skipped; no duplicates, no loss). ``rows`` is lineage metadata the
        caller passes when it already knows the count (avoid a re-scan)."""
        run_id = run_id or uuid.uuid4().hex[:12]
        before = set(self.data_files()) if os.path.isdir(self.data_path) else set()
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.data_path)
        written = [f for f in self.data_files() if f not in before]
        manifest = Manifest(run_id=run_id, rows=rows, committed=True, files=written)
        return self._write_manifest(manifest)

    def amend_manifest(self, run_id: str, rows: int) -> Manifest:
        """Atomically enrich a committed manifest with the true row count
        (the count is only known after the post-write read-back; a crash
        between commit and amendment leaves ``rows=-1``, which consumers
        must treat as unknown, not negative). The file ledger from the
        original commit is preserved."""
        files = None
        for m in self.manifests():
            if m.run_id == run_id:
                files = m.files
                break
        manifest = Manifest(run_id=run_id, rows=rows, committed=True, files=files)
        return self._write_manifest(manifest)

    def compact(
        self,
        target_partitions: int = 1,
        partition_by: list[str] | None = None,
    ) -> Manifest:
        """Rewrite small data files into ``target_partitions`` larger ones
        AND commit a superseding manifest, so the resume fast path survives
        table maintenance (VERDICT r4 #4). This is the Iceberg
        rewrite-data-files + rewrite-manifests pair the catalog layer
        stands in for: without it, any file rewrite makes
        ``ledger_complete()``'s set-equality check (correctly) fail and
        permanently demotes the resume stat to the done-side count.

        Ordering (every crash window degrades to the slow path, never to
        wrong data):

        1. write the compacted copy to a scratch dir, count it (the exact
           row total the superseding manifest needs);
        2. swap the data dir (rename old away, rename scratch in, drop old);
        3. commit ONE superseding manifest owning every surviving file;
        4. remove the superseded run manifests.

        A crash before step 2 leaves the table untouched; between 2 and 4
        the ledger ≠ disk so ``ledger_complete()`` is False and resume
        falls back to counting the done side — exact, just slower. Only
        after step 4 does the fast path re-engage. On a real cluster this
        whole method is Iceberg's atomic ``rewrite_data_files`` +
        ``rewrite_manifests`` snapshot commit."""
        import shutil

        if not self.exists():
            raise ValueError(f"nothing to compact at {self.data_path}")
        if partition_by is None:
            # Preserve the on-disk layout: derive the Hive partition chain
            # from any data file's directory segments (col=value). Writing
            # a flat copy into a partitioned table would leave a mixed
            # layout later appends cannot coexist with.
            sample = next(iter(self.data_files()), "")
            partition_by = [
                seg.split("=", 1)[0]
                for seg in sample.split(os.sep)[:-1]
                if "=" in seg
            ]
        df = self.read()
        scratch = self.data_path + f".compact-{uuid.uuid4().hex[:8]}"
        if partition_by:
            # One task per partition value → one compacted file per value.
            writer = (
                df.repartition(*partition_by)
                .write.mode("overwrite")
                .partitionBy(*partition_by)
            )
        else:
            writer = df.coalesce(max(target_partitions, 1)).write.mode("overwrite")
        writer.parquet(scratch)
        rows = self.spark.read.parquet(scratch).count()

        old = self.data_path + f".pre-compact-{uuid.uuid4().hex[:8]}"
        os.rename(self.data_path, old)
        os.rename(scratch, self.data_path)
        shutil.rmtree(old)

        superseded = [
            name
            for name in os.listdir(self.manifest_dir)
            if name.endswith(".json")
        ] if os.path.isdir(self.manifest_dir) else []
        manifest = Manifest(
            run_id=f"compact-{uuid.uuid4().hex[:12]}",
            rows=rows,
            committed=True,
            files=self.data_files(),
        )
        self._write_manifest(manifest)
        own = f"run-{manifest.run_id}.json"
        for name in superseded:
            if name != own:
                os.remove(os.path.join(self.manifest_dir, name))
        return manifest

    def _write_manifest(self, manifest: Manifest) -> Manifest:
        os.makedirs(self.manifest_dir, exist_ok=True)
        tmp = os.path.join(self.manifest_dir, f".run-{manifest.run_id}.json.tmp")
        final = os.path.join(self.manifest_dir, f"run-{manifest.run_id}.json")
        with open(tmp, "w") as fh:
            fh.write(manifest.to_json())
        os.replace(tmp, final)  # atomic commit marker
        return manifest
