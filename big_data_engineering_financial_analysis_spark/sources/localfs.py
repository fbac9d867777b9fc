"""Driver-local path contract, in one place.

Several store layers (the incremental-dedup signature store, the cluster
label store, snapshot manifests) do their discovery, replay markers, and
manifest swaps through ``os``-level IO: correct and atomic on one shared
filesystem, silently wrong on an object store (an ``s3://`` URI would
"look empty" to ``os.listdir`` every time, quietly disabling whatever
history the store carries).  Every such layer validates through this one
helper so the rule — and any future path-scheme nuance — lives in exactly
one place.
"""

from __future__ import annotations


def recover_aside_swap(live: str, aside: str) -> None:
    """Heal a crashed two-rename swap (stage → rename live aside → rename
    stage in): only-aside-exists means the crash hit between the renames —
    restore the aside as live; both-exist means the crash hit after the
    swap — the aside is superseded, delete it.  The one protocol shared
    by every directory-swap writer (dataset compaction, signature-store
    compaction); keep the semantics here so the copies cannot drift."""
    import os
    import shutil

    if os.path.exists(aside):
        if os.path.exists(live):
            shutil.rmtree(aside)
        else:
            os.rename(aside, live)


def check_local(path: str, what: str, why: str | None = None) -> str:
    """Fail fast on scheme-qualified remote paths; return the bare local
    path (``file://`` prefix stripped).  ``what`` names the caller for the
    error message; ``why`` optionally explains the consequence."""
    if "://" in path and not path.startswith("file://"):
        detail = f" ({why})" if why else ""
        raise ValueError(
            f"{what} requires a driver-local path; got {path!r}{detail}"
        )
    return path.removeprefix("file://")
