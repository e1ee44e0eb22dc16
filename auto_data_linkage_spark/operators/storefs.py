"""Filesystem seam + torn-compaction repair for the persisted bucket
stores (the ANN index's ``coded/cell=N`` dirs, the lexical index's
``postings|terms/bucket=N`` dirs, and the edge store's ``bucket=N``
dirs).

Every directory-swap a compaction performs goes through ONE
implementation here (:func:`swap_dir`), and every load/compaction runs
the matching crash-repair sweep (:func:`repair_swept_dirs`) first — so
the torn-swap failure mode has a single definition, a single repair,
and a single test surface instead of three slightly-different copies.

**Durability contract.** A swap is two renames::

    os.rename(cur, cur + "__old")   # (1) park the live dir
    os.rename(new, cur)             # (2) promote the rewritten dir
    shutil.rmtree(cur + "__old")    # (3) drop the parked original

A crash leaves exactly one of two torn states, both repairable from a
single ``listdir`` because the parked ORIGINAL and the promoted
REWRITE each hold the bucket's complete logical content:

- between (1) and (2): live dir missing, ``__old`` present → restore
  the original (``rename`` it back); the abandoned rewrite tree is
  disposable and is removed.
- between (2) and (3): both present → the promotion completed; the
  ``__old`` leftover is removed (leaving it would double-count the
  bucket via parquet partition discovery and break the next
  compaction's rename).

**Single-writer / POSIX assumption.** Swaps rely on directory
``os.rename`` being atomic — true on POSIX filesystems, NOT on object
stores (S3/GCS have no atomic rename; "rename" is copy+delete).
Compaction and repair also assume ONE writer: a concurrent appender
can land files in a dir after it is parked as ``__old`` (they are
dropped with it), and a concurrent reader that resolved paths before
the swap can read a parked dir. Loads that only READ (no ``__old``
present) are unaffected — the repair sweep is a no-op ``listdir``
then.

**For object stores or concurrently-served indexes, build the store
with ``layout="manifest"`` instead** (:mod:`.manifestfs`): immutable
``gen=N`` data directories plus a manifest log committed by
conditional create — zero renames, atomic multi-directory cutover,
snapshot-pinned readers, and no torn states to repair. This module
remains the POSIX-local default (no indirection, inline reclamation).

No reference analogue (the reference persists nothing; stores are
LLM-brief scope). Public-knowledge design: the two-rename swap +
leftover sweep is the classic POSIX "rename trick" (e.g. how
Hadoop's FileOutputCommitter v1 promotes task dirs).
"""

from __future__ import annotations

import os
import shutil

OLD_SUFFIX = "__old"
TMP_SUFFIX = "__compact"

__all__ = [
    "swap_dir",
    "remove_dir",
    "repair_swept_dirs",
    "repair_swapped_dir",
    "local_path",
]


def local_path(path: str) -> str:
    """Strip a ``file://`` scheme so ``os`` calls work on the path."""
    return path[7:] if path.startswith("file://") else path


def swap_dir(cur: str, new: str) -> None:
    """Promote rewritten directory ``new`` over live directory ``cur``
    with the two-rename swap (atomic at directory granularity on POSIX;
    see the module docstring for the crash states and their repair)."""
    old = cur + OLD_SUFFIX
    os.rename(cur, old)
    os.rename(new, cur)
    shutil.rmtree(old)


def remove_dir(cur: str) -> None:
    """Crash-safe directory removal (a compaction purged every row of
    the bucket): park-then-delete so a crash mid-``rmtree`` never
    leaves a silently PARTIAL live dir — the repair sweep restores the
    parked original instead (conservative: the restored rows are
    still masked by whatever made them purgeable)."""
    old = cur + OLD_SUFFIX
    os.rename(cur, old)
    shutil.rmtree(old)


def repair_swapped_dir(live: str, *, tmp_roots: tuple[str, ...] = ()) -> dict:
    """:func:`repair_swept_dirs`' decision applied to ONE (live,
    ``live__old``) pair — for whole-directory swaps (index rebuilds)
    where sweeping the PARENT would touch sibling paths that are not
    ours. Same crash states, same resolution: live missing + parked
    present → restore; both present → drop the leftover."""
    restored: list[str] = []
    removed: list[str] = []
    parked = live + OLD_SUFFIX
    if os.path.isdir(parked):
        if os.path.isdir(live):
            shutil.rmtree(parked)
            removed.append(parked)
        else:
            os.rename(parked, live)
            restored.append(live)
    for tmp in tmp_roots:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
            removed.append(tmp)
    return {"restored": restored, "removed": removed}


def repair_swept_dirs(root: str, *, tmp_roots: tuple[str, ...] = ()) -> dict:
    """Detect and repair torn :func:`swap_dir` leftovers under ``root``
    (one ``listdir`` when the store is healthy — cheap enough to run on
    every load). ``tmp_roots`` are the compaction's scratch trees
    (``*__compact``); any found are removed — their content is either a
    pre-swap rewrite (regenerable) or a post-swap partial, never the
    only copy of anything.

    Returns ``{"restored": [...], "removed": [...]}`` naming the
    directories acted on (empty lists when the store was healthy).
    """
    restored: list[str] = []
    removed: list[str] = []
    if os.path.isdir(root):
        for entry in sorted(os.listdir(root)):
            if not entry.endswith(OLD_SUFFIX):
                continue
            parked = os.path.join(root, entry)
            if not os.path.isdir(parked):
                continue
            live = os.path.join(root, entry[: -len(OLD_SUFFIX)])
            if os.path.isdir(live):
                # promotion completed before the crash: live dir is the
                # finished rewrite; the parked original is a leftover.
                shutil.rmtree(parked)
                removed.append(parked)
            else:
                # crash between the renames: the parked original is the
                # only copy — restore it.
                os.rename(parked, live)
                restored.append(live)
    for tmp in tmp_roots:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
            removed.append(tmp)
    return {"restored": restored, "removed": removed}
