"""IceliteCatalog — named tables over a root directory, and the SQL
surface that hangs off it.

A deployment rarely has one table: the migration workload creates 15,
rollups create more, and jobs want to reference them by NAME, not path.
The catalog is deliberately thin — a root directory where every child
holding Icelite metadata IS a table — because the table format already
owns atomicity (pointer hard-links); the catalog adds no second
metadata store to keep consistent (the same reasoning as Hadoop
path-based catalogs / Delta's path tables; Iceberg's HadoopCatalog is
the public analog).

``register_views`` projects every table (or a chosen subset) into the
session as temp views of its CURRENT snapshot, so plain ``spark.sql``
works across lake tables — joins, aggregates, anything Catalyst can
plan — with each view carrying the table's full read semantics
(max-seq dedup over MoR deltas, field-id column resolution, tombstone
filtering left to the query). Views are snapshot-pinned at registration
(re-register to see new commits), which is exactly the isolation
contract ``read()`` gives.

Reference analog: the reference addresses its 15 sinks by table name
through one Postgres connection (example/src/main.rs:489-510); here the
lake root plays the database and Spark SQL plays the query engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_rust_spark.lake.format import _MANIFEST_DIR, IceliteTable


class IceliteCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name: {name!r}")
        return os.path.join(self.root, name)

    def list_tables(self) -> list[str]:
        """Every child dir holding Icelite metadata, sorted."""
        out = []
        for n in sorted(os.listdir(self.root)):
            if os.path.isdir(os.path.join(self.root, n, _MANIFEST_DIR)):
                out.append(n)
        return out

    def create_table(self, name: str, schema: T.StructType, **kwargs) -> IceliteTable:
        """Create ``name`` under the root (kwargs = IceliteTable.create's:
        key_cols, bucket_key, n_buckets, order_cols, seq_col, ...)."""
        return IceliteTable.create(self.spark, self._path(name), schema, **kwargs)

    def load(self, name: str) -> IceliteTable:
        p = self._path(name)
        if not os.path.isdir(os.path.join(p, _MANIFEST_DIR)):
            raise FileNotFoundError(f"no table {name!r} in catalog {self.root}")
        return IceliteTable.load(self.spark, p)

    def drop_table(self, name: str) -> None:
        """Remove the table's directory entirely (data + metadata)."""
        import shutil

        self.load(name)  # existence check with the clear error
        shutil.rmtree(self._path(name))

    def register_views(
        self,
        names: list[str] | None = None,
        prefix: str = "",
        as_of=None,
        tag: str | None = None,
    ) -> list[str]:
        """Expose tables as session temp views (``prefix + name``) of
        their CURRENT snapshot, enabling plain ``spark.sql`` across the
        lake. Returns the registered view names; re-register after new
        commits to advance the snapshot.

        ``as_of`` (datetime-UTC / epoch seconds) or ``tag`` registers
        HISTORICAL views instead — every named table projected at the
        same wall-clock instant (per-table ``seq_as_of``) or at its
        snapshot carrying the named tag: "query the lake exactly as the
        March training run saw it" in plain SQL, across joins. Tables
        created after the instant (or missing the tag) fail loud rather
        than silently contributing current data to a historical query."""
        if as_of is not None and tag is not None:
            raise ValueError("pass as_of OR tag, not one of each")
        registered = []
        for n in names if names is not None else self.list_tables():
            view = f"{prefix}{n}"
            t = self.load(n)
            if tag is not None:
                df = t.read(tag=tag)
            elif as_of is not None:
                df = t.read(as_of=as_of)
            else:
                df = t.read()
            df.createOrReplaceTempView(view)
            registered.append(view)
        return registered

    def export(
        self,
        dest_root: str,
        as_of=None,
        names: list[str] | None = None,
    ) -> dict[str, int]:
        """Consistent multi-table export — the catalog-level DR/backup
        move composing ``IceliteTable.clone``: every table (or the
        ``names`` subset) cloned under ``dest_root`` as an independent
        table, each at ONE pinned snapshot.

        With ``as_of`` (datetime-UTC / epoch seconds) each table
        exports at ``seq_as_of(as_of)`` — a cross-table-consistent cut
        by the commit clock, the same pin ``register_views(as_of=)``
        queries through: "back up the lake exactly as it stood at
        02:00". Tables created after the instant are skipped (they did
        not exist at the cut). Without ``as_of`` each table pins its
        current snapshot at call time — fine for quiesced writers, NOT
        a consistent cut under concurrent commits (pass an instant for
        that). Hard-linked data + carried ledgers per ``clone``, so an
        export is metadata-priced and feeds can resume against the
        restored tables. Returns {name: exported source seq}."""
        out: dict[str, int] = {}
        for n in names if names is not None else self.list_tables():
            t = self.load(n)
            if as_of is not None:
                try:
                    seq = t.seq_as_of(as_of)
                except ValueError:
                    continue  # table born after the cut
            else:
                seq = t.current_seq()
            t.clone(os.path.join(os.path.abspath(dest_root), n), seq=seq)
            out[n] = seq
        return out

    def fsck(
        self, deep: bool = False, names: list[str] | None = None
    ) -> dict:
        """Catalog-wide integrity check — the verify step of the DR loop
        (``export`` → restore → ``fsck``): runs ``IceliteTable.fsck``
        on every table (or the ``names`` subset) and aggregates.
        Read-only, reports instead of raising (an unloadable table
        becomes its own error finding rather than aborting the sweep).
        Returns ``{"ok": bool, "tables": {name: per-table report}}``;
        ``ok`` is the AND over all tables."""
        tables: dict[str, dict] = {}
        for n in names if names is not None else self.list_tables():
            try:
                tables[n] = self.load(n).fsck(deep=deep)
            except Exception as e:  # unloadable table: a finding, not a crash
                tables[n] = {
                    "ok": False,
                    "errors": [f"table unloadable: {e}"],
                    "warnings": [],
                    "checked": {},
                }
        return {"ok": all(r["ok"] for r in tables.values()), "tables": tables}

    def sql(self, query: str, **register_kwargs) -> DataFrame:
        """Convenience: register all views (current, ``as_of=`` instant,
        or ``tag=`` pin), then run ``spark.sql(query)``."""
        self.register_views(**register_kwargs)
        return self.spark.sql(query)
