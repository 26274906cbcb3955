"""Reboot-proof fixture resolution (VERDICT r4 weak #5).

Parity fixtures and semitrained licensing checkpoints historically lived
only under /tmp/kdpc_train_parity; the round-4 host reboot wiped them
mid-round and forced a multi-hour regeneration (the torch overfit
trajectory is an ~2 h stubbed-CUDA run). Expensive artifacts are now
PERSISTED in-repo under evidence/fixtures/ and this resolver treats /tmp
as a cache:

    path = fixture_path("overfit.npz")   # /tmp copy, hydrated from
                                         # evidence/fixtures if needed

Resolution order: /tmp cache hit → copy from evidence/fixtures into /tmp →
None (caller regenerates and should then call persist_fixture so the next
wipe is survivable).
"""

from __future__ import annotations

import os
import os.path as osp
import shutil

CACHE_DIR = "/tmp/kdpc_train_parity"
_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
EVIDENCE_DIR = osp.join(_REPO, "evidence", "fixtures")
# legacy round-4 location (semitrained_teacher.msgpack lives here)
CHECKPOINT_DIR = osp.join(_REPO, "evidence", "checkpoints")


def fixture_path(name: str, cache_dir: str = CACHE_DIR) -> "str | None":
    """Absolute path of fixture `name` in the /tmp cache, hydrating it from
    the in-repo evidence copy when the cache is cold. None if neither
    exists (caller regenerates)."""
    cached = osp.join(cache_dir, name)
    if osp.exists(cached):
        return cached
    for src_dir in (EVIDENCE_DIR, CHECKPOINT_DIR):
        persisted = osp.join(src_dir, name)
        if osp.exists(persisted):
            os.makedirs(cache_dir, exist_ok=True)
            shutil.copy2(persisted, cached)
            return cached
    return None


def persist_fixture(name: str, cache_dir: str = CACHE_DIR) -> str:
    """Copy a (re)generated fixture from the /tmp cache into
    evidence/fixtures/ so it survives host wipes. Returns the evidence
    path."""
    os.makedirs(EVIDENCE_DIR, exist_ok=True)
    src = osp.join(cache_dir, name)
    dst = osp.join(EVIDENCE_DIR, name)
    shutil.copy2(src, dst)
    return dst
