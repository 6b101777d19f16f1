"""S5/K6/R6 — the backup flow, storage-agnostic.

The reference's backup flow (`/root/reference/myfitnesspaw/flows.py:
167-189`) is three tasks against the Dropbox SDK: upload a datestamped
copy of the warehouse file (`tasks.py:753-765`), list the backup
directory (`tasks.py:768-776`), and FIFO-delete everything beyond the
newest five (`tasks.py:780-795`, selection in `_utils.py:43-62`).

The engine-grade shape is a three-method ``BackupStore`` protocol —
``list_files`` / ``upload`` / ``delete`` — with the flow logic
(datestamped naming, overwrite mode, FIFO selection) written once
against the protocol.  :class:`LocalDirBackupStore` is the
filesystem implementation used in-container and in tests; a Dropbox
(or S3/GCS) store implements the same three calls over its SDK and
the flow runs unchanged.  The FIFO selection keeps the reference's
exact contract: parse the date after the third underscore of
``mfp_db_backup_YYYY-MM-DD``, keep the newest ``max_num`` by that
date, return the rest oldest-first.
"""

from __future__ import annotations

import datetime
import os
import shutil
from typing import Protocol

BACKUP_PREFIX = "mfp_db_backup"
DEFAULT_KEEP = 5


class BackupStore(Protocol):
    """The three object-store calls the reference flow makes."""

    def list_files(self) -> list[str]: ...

    def upload(self, local_path: str, dest_name: str) -> str: ...

    def delete(self, name: str) -> str: ...


class LocalDirBackupStore:
    """Filesystem implementation — one backup dir, overwrite-on-upload
    (the reference uses Dropbox ``WriteMode.overwrite``)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def list_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, f))
        )

    def upload(self, local_path: str, dest_name: str) -> str:
        shutil.copyfile(local_path, os.path.join(self.root, dest_name))
        return dest_name

    def delete(self, name: str) -> str:
        os.remove(os.path.join(self.root, name))
        return name


def backup_name(now: datetime.date | None = None) -> str:
    """K6 naming: ``mfp_db_backup_YYYY-MM-DD`` (`tasks.py:760-762`)."""
    d = now or datetime.date.today()
    return f"{BACKUP_PREFIX}_{d.strftime('%Y-%m-%d')}"


def make_backup(
    store: BackupStore, source_path: str, now: datetime.date | None = None
) -> str:
    """K6: upload a datestamped copy; same-day re-runs overwrite."""
    return store.upload(source_path, backup_name(now))


def select_fifo_backups_to_delete(
    max_num_backups: int, files_list: list[str]
) -> list[str]:
    """R6 selection, reference-exact (`_utils.py:43-62`): sort by the
    datestamp after the third underscore, return the oldest names
    beyond ``max_num_backups`` (empty when at or under the cap).

    Non-backup names (a stray file in the backup dir, a suffixed or
    unparseable variant) are IGNORED rather than crashing the rotation
    — and, never being selected, can never be deleted by it.  The
    LISTED names are returned, never reconstructed ones, so a selected
    name always exists in the store."""

    def _stamp(name: str):
        parts = name.split("_")
        if len(parts) != 4 or "_".join(parts[:3]) != BACKUP_PREFIX:
            return None
        try:
            return datetime.datetime.strptime(parts[3], "%Y-%m-%d")
        except ValueError:
            return None

    dated = sorted(
        (ts, name)
        for name, ts in ((f, _stamp(f)) for f in files_list)
        if ts is not None
    )
    if len(dated) <= max_num_backups:
        return []
    cut = len(dated) - max_num_backups
    return [name for _, name in dated[:cut]]


def apply_backup_rotation(
    store: BackupStore, files_list: list[str], keep: int = DEFAULT_KEEP
) -> list[str]:
    """R6 apply: FIFO-delete and return the deleted names
    (`tasks.py:780-795`)."""
    return [store.delete(name) for name in
            select_fifo_backups_to_delete(keep, files_list)]


def run_backup_flow(
    store: BackupStore,
    source_path: str,
    keep: int = DEFAULT_KEEP,
    now: datetime.date | None = None,
) -> dict:
    """The composed S5→K6→R6 flow (`flows.py:180-188`): upload, list,
    rotate.  Returns ``{"uploaded", "available", "deleted"}`` where
    ``available`` is the POST-rotation listing — every listed name
    exists when the caller receives it."""
    uploaded = make_backup(store, source_path, now)
    deleted = apply_backup_rotation(store, store.list_files(), keep)
    return {
        "uploaded": uploaded,
        "available": store.list_files(),
        "deleted": deleted,
    }
