"""Corpus snapshot diffing — the change-data-capture primitive a
training-data pipeline needs between crawl/curation snapshots: which
documents were added, removed, or changed since the last version, so
downstream stages (dedup state, embeddings, indexes) reprocess only
the delta instead of the whole corpus.

100 TB shape: each snapshot is first projected to ``(key, md5
fingerprint)`` — a map-side hash over the content columns, so the
only shuffle carries two narrow columns per row, never the payloads —
then ONE full-outer equi-join on the snapshot key classifies every
row. With both snapshots bucketed by the key the join plans with zero
Exchange (the layout the incremental pipeline would maintain anyway).
Payload columns rejoin to the classified keys on demand
(``include_payload``), touching only the delta.

Determinism: the fingerprint is ``md5(concat_ws(sep, coalesce(cast(
col AS string), null_sentinel) ...))`` with a 0x1f unit separator and
an explicit NULL sentinel, so NULL never collides with '' and both
engines (Spark, DuckDB) compute identical digests from identical
column orders.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["content_fingerprint", "snapshot_diff", "snapshot_apply"]

#: unit separator between content columns; a sentinel distinguishes
#: NULL from empty string (concat_ws would silently skip NULLs)
_SEP = "\x1f"
_NULL = "\x00N"


def content_fingerprint(cols: Sequence[str]) -> Column:
    """md5 digest over the given columns, NULL-safe and
    order-sensitive — the row's content identity for diffing."""
    if not cols:
        raise ValueError("content_fingerprint: cols must be non-empty")
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str] | str,
    content_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
    include_payload: bool = False,
) -> DataFrame:
    """Classify every key across two corpus snapshots as ``added``
    (key only in ``new``), ``removed`` (only in ``old``) or
    ``changed`` (present in both, content fingerprint differs);
    ``include_unchanged=True`` keeps the ``unchanged`` rows too.

    ``content_cols`` defaults to every non-key column the snapshots
    share (column order taken from ``new``). Output:
    ``key_cols + (change_type, old_fp, new_fp)``; with
    ``include_payload=True`` the new-side content columns (old-side
    for ``removed`` rows) are attached by a second join that touches
    only the emitted delta keys.

    The snapshot key must be unique per snapshot (a corpus identity —
    doc_id, url...); duplicate keys make "changed" ill-defined and a
    full-outer join would pair them quadratically.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if content_cols is None:
        shared = [c for c in new.columns if c in set(old.columns)]
        content_cols = [c for c in shared if c not in set(keys)]
        if not content_cols:
            raise ValueError(
                "snapshot_diff: no shared non-key columns to fingerprint; "
                "pass content_cols explicitly"
            )
    content_cols = list(content_cols)

    fp = content_fingerprint(content_cols)
    o = old.select(*keys, fp.alias("old_fp"))
    n = new.select(*keys, fp.alias("new_fp"))
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, change.alias("change_type"), "old_fp", "new_fp")
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    if include_payload:
        # delta-bounded payload attach: new-side content for
        # added/changed/unchanged, old-side for removed
        n_pay = new.select(*keys, *content_cols)
        o_pay = old.select(
            *keys, *[F.col(c).alias(c) for c in content_cols]
        )
        pay = n_pay.unionByName(
            o_pay.join(n_pay.select(*keys), keys, "left_anti")
        )
        out = out.join(pay, keys, "left")
    return out


def snapshot_apply(
    old: DataFrame,
    diff: DataFrame,
    key_cols: Sequence[str] | str,
    content_cols: Sequence[str],
) -> DataFrame:
    """Reconstruct the NEW snapshot from the old one plus a
    payload-carrying diff (``snapshot_diff(..., include_payload=True)``)
    — the closure property ``apply(old, diff(old, new)) == new`` that
    makes the delta a faithful replication log. Output columns:
    ``key_cols + content_cols``.

    Scale shape: one anti-join on the snapshot key (old rows whose key
    appears in the diff drop out — removed and changed alike) plus a
    union with the diff's added/changed payload rows; both legs are
    key-partitioned, nothing is collected, and the diff side is
    delta-sized when the diff was built without ``include_unchanged``.

    A diff built with ``include_unchanged=True`` also works: the
    anti-join drops every diff key, so ``unchanged`` rows must be (and
    are) re-added from the diff's payload — which equals the old row
    by definition of unchanged. Without this the rebuilt snapshot
    would silently lose every unchanged document.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    content_cols = list(content_cols)
    missing = [c for c in content_cols if c not in diff.columns]
    if missing:
        raise ValueError(
            f"snapshot_apply: diff lacks payload columns {missing}; build it "
            "with snapshot_diff(..., include_payload=True)"
        )
    survivors = old.select(*keys, *content_cols).join(
        diff.select(*keys), keys, "left_anti"
    )
    upserts = diff.where(
        F.col("change_type").isin("added", "changed", "unchanged")
    ).select(*keys, *content_cols)
    return survivors.unionByName(upserts)
