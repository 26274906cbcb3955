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
# legacy round-4 location (the ROUND-4 6k-step semitrained_teacher.msgpack
# lives here — a DIFFERENT regime than the round-5 18k teacher)
CHECKPOINT_DIR = osp.join(_REPO, "evidence", "checkpoints")

# Cache names whose authoritative evidence copy is committed under a
# different file name. "semitrained_teacher.msgpack" is the round-5 18k
# teacher (the licensing/selftest regime); without this alias the resolver
# would fall through to CHECKPOINT_DIR's round-4 6k checkpoint of the SAME
# NAME and silently gate metrics on the wrong regime after a /tmp wipe.
_ALIASES = {"semitrained_teacher.msgpack": "semitrained_teacher_18k.msgpack"}


def _same_file(a: str, b: str) -> bool:
    sa, sb = os.stat(a), os.stat(b)
    # copy2 preserves mtime, so (size, mtime) identity is a faithful cheap
    # proxy for "this cache entry came from that evidence copy"
    return sa.st_size == sb.st_size and int(sa.st_mtime) == int(sb.st_mtime)


def fixture_path(name: str, cache_dir: str = CACHE_DIR) -> "str | None":
    """Absolute path of fixture `name` in the /tmp cache, hydrating it from
    the in-repo evidence copy when the cache is cold OR STALE. None if
    neither exists (caller regenerates).

    The evidence copy is authoritative for readers: a /tmp cache entry that
    does not (size, mtime)-match it is refreshed, so a pre-existing stale
    cache from an older run cannot silently shadow a newer committed
    fixture (licensing deltas would otherwise be computed on the wrong
    checkpoint while logging a correct-looking path). Regenerators write to
    the cache and must persist_fixture() immediately — an unpersisted
    regenerated fixture is otherwise treated as stale by the next reader."""
    cached = osp.join(cache_dir, name)
    # direct evidence name first (a freshly persisted regeneration wins),
    # then the alias, then the legacy checkpoint store
    for src_dir, src_name in ((EVIDENCE_DIR, name),
                              (EVIDENCE_DIR, _ALIASES.get(name, name)),
                              (CHECKPOINT_DIR, name)):
        persisted = osp.join(src_dir, src_name)
        if osp.exists(persisted):
            if not (osp.exists(cached) and _same_file(cached, persisted)):
                os.makedirs(cache_dir, exist_ok=True)
                shutil.copy2(persisted, cached)
            return cached
    if osp.exists(cached):      # cache-only fixture (never persisted)
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
