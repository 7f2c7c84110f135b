"""Versioned snapshot store with atomic multi-table commit.

The reference's durability story is per-file: stream to ``.tmp`` then
``remove``+``rename`` (rewrite_post_views_file,
buzzdb_lab1.cpp:1032-1059); its crash test (Test 11,
buzzdb_lab1.cpp:1603-1648) asserts a reader never sees a torn file.
But its multi-table mutation (updateUserName, :775-963) renames the
three files *separately* — a crash between renames leaves cross-table
inconsistency.

This store is strictly stronger: every commit writes a complete new
version directory (any subset of tables; unchanged tables carry
forward by reference) and publishes it by atomically renaming a
pointer file. Readers resolve the pointer once and then read immutable
parquet — the lock-free equivalent of the reference's
snapshot-build-then-swap load protocol (buzzdb_lab1.cpp:308-315).

At cluster scale the same design maps onto an object store: version
directories are immutable prefixes, the pointer is a small manifest
(this is the essence of the Iceberg/Delta commit protocol, reduced to
the single-writer case the reference supports).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Directory layout::

        root/
          _CURRENT              # json: {"version": N}
          v00001/
            _MANIFEST.json      # {"tables": {"name": "path"}}
            users/ ...parquet
          v00002/
            _MANIFEST.json      # may point back into v00001 for
            posts/ ...          # tables unchanged by the commit
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointer ----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return 0

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.root, f"v{version:05d}", "_MANIFEST.json")) as f:
            return json.load(f)

    # -- read -------------------------------------------------------------
    def tables(self) -> dict[str, str]:
        v = self.current_version()
        if v == 0:
            return {}
        return self._manifest(v)["tables"]

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.tables()[name])

    def read_all(self) -> dict[str, DataFrame]:
        return {n: self.spark.read.parquet(p) for n, p in self.tables().items()}

    # -- write ------------------------------------------------------------
    def commit(self, changed: dict[str, DataFrame]) -> int:
        """Write ``changed`` tables into a new version and publish it
        atomically. Tables not in ``changed`` carry forward from the
        current manifest by path reference (no rewrite — the
        copy-on-write half of copy-on-write)."""
        old_tables = self.tables()
        version = self.current_version() + 1
        vdir = os.path.join(self.root, f"v{version:05d}")
        os.makedirs(vdir, exist_ok=True)

        new_tables = dict(old_tables)
        for name, df in changed.items():
            path = os.path.join(vdir, name)
            df.write.mode("overwrite").parquet(path)
            new_tables[name] = path

        with open(os.path.join(vdir, "_MANIFEST.json"), "w") as f:
            json.dump({"version": version, "tables": new_tables}, f)
            f.flush()
            os.fsync(f.fileno())
        # Sync the version dir too, so the manifest's directory entry
        # is durable before the pointer can reference it.
        dfd = os.open(vdir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

        # Atomic publish: write-tmp + rename, same primitive the
        # reference uses per data file (buzzdb_lab1.cpp:1053-1057),
        # but applied once to the pointer so the multi-table commit
        # is all-or-nothing.
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_CURRENT.")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())
        return version
