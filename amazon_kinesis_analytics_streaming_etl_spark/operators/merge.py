"""CDC snapshot merge — the ``MERGE INTO`` analog for plain parquet
snapshots.

Training-data and warehouse pipelines re-materialize large snapshots by
applying a (much smaller) changeset of inserts/updates/deletes. Without
a table format that supports row-level merge, the scalable pattern is
two set operations:

    result = (snapshot ANTI-JOIN changed-keys) UNION upserted-rows

One shuffle for the anti join (broadcast when the changeset is small —
the common case), one optional windowed dedup when the changeset
carries multiple versions per key. No driver-side loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_changes"]


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a CDC changeset to a snapshot.

    ``changes`` carries the snapshot's columns plus ``op_col`` with
    values ``'I'``/``'U'`` (upsert — replace-or-insert the row) or
    ``'D'`` (delete the key). When ``seq_col`` is given, the latest
    change per key (max seq) wins; otherwise the changeset must hold at
    most one row per key.

    ``broadcast_changes`` hints the anti join to broadcast the changed
    keys — right for the overwhelmingly common small-changeset case;
    disable for changesets comparable to the snapshot (falls back to a
    shuffle join that AQE can still plan well).
    """
    latest = changes
    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        latest = (
            changes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    changed_keys = latest.select(*key_cols).distinct()
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)

    untouched = snapshot.join(changed_keys, key_cols, "left_anti")
    upserts = latest.where(F.col(op_col) != "D").drop(
        *( [op_col, seq_col] if seq_col else [op_col] )
    )
    return untouched.unionByName(upserts)
