"""Shared helpers for the tools_scale_* certification scripts (r9
review: the staging-key and best-of-2 idioms were hand-copied across
four scripts — one definition keys every certification corpus the
same way)."""

import hashlib
import time


def keyed_stage_dir(base: str, generator_sql: str) -> str:
    """Staged dirs are KEYED ON the generator SQL (ADVICE r8 #3): an
    edited generator can never silently re-certify against a stale
    /tmp corpus built by an older version of the script."""
    return f"{base}_{hashlib.md5(generator_sql.encode()).hexdigest()[:8]}"


def best2(fn):
    """Best-of-2 wall: one warm-up-absorbing repeat, min recorded."""
    ts = []
    for _ in range(2):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 2))
    return min(ts)
