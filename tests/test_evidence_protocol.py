"""Protocol tests for the round-4 evidence harness (scripts/evidence_data.py).

The KD-effectiveness and semitrained-checkpoint claims rest on both arms /
all runs seeing EXACTLY the same scene splits and batch streams; these tests
pin that contract on the bundled KITTI data.
"""

import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts"))

from evidence_data import (EVAL_BS, N_POINTS, N_TRAIN_SCENES,
                           build_scene_bank, make_batches, mean_epe,
                           sample_pair)

KITTI_AVAILABLE = osp.isdir("/root/reference/datasets/kitti_processed")


@pytest.fixture(scope="module")
def bank():
    if not KITTI_AVAILABLE:
        pytest.skip("bundled KITTI not present")
    from kd_pointcloud_tpu.data import KITTI, ProcessData

    ds = KITTI(train=False, transform=ProcessData(num_points=N_POINTS))
    assert len(ds) > N_TRAIN_SCENES  # split leaves a held-out remainder
    return build_scene_bank(ds, range(3))


class TestSceneBank:
    def test_rows_stay_aligned(self, bank):
        # sf = pc2 - pc1 must be a row-wise correspondence: both clouds of a
        # scene keep identical row counts through masking
        for pc1, pc2 in bank:
            assert pc1.shape == pc2.shape
            assert pc1.dtype == np.float32
            assert pc1.shape[0] > N_POINTS // 2  # masked clouds stay large

    def test_depth_mask(self, bank):
        for pc1, pc2 in bank:
            assert pc1[:, 2].max() < 35.0 and pc2[:, 2].max() < 35.0


class TestSampling:
    def test_sample_pair_is_no_corr(self, bank):
        pc1, pc2 = bank[0]
        rng = np.random.default_rng(0)
        p1, p2, sf = sample_pair(pc1, pc2, rng)
        assert p1.shape == (N_POINTS, 3) and p2.shape == (N_POINTS, 3)
        # flow rows correspond to p1's sample rows: p1 + sf lands on pc2 rows
        assert sf.shape == (N_POINTS, 3)
        # no-corr: p2 is an independent resample, not pc2[idx1]
        warped = p1 + sf
        assert not np.allclose(warped, p2)

    def test_seeded_stream_is_reproducible(self, bank):
        a = make_batches(bank, [0, 1, 2], np.random.default_rng(11), 3)
        b = make_batches(bank, [0, 1, 2], np.random.default_rng(11), 3)
        assert len(a) == len(b) == 1
        for k in ("pos1", "pos2", "flow"):
            np.testing.assert_array_equal(np.asarray(a[0][k]),
                                          np.asarray(b[0][k]))

    def test_batches_drop_ragged_tail(self, bank):
        # 3 scenes at bs=2 -> one batch of 2, scene 2 dropped (exact batches
        # keep the jitted step's shapes static)
        batches = make_batches(bank, [0, 1, 2], np.random.default_rng(0), 2)
        assert len(batches) == 1
        assert batches[0]["pos1"].shape == (2, N_POINTS, 3)

    def test_eval_split_constants(self):
        # 142 mapped scenes: 100 train / 42 held-out = 7 exact EVAL_BS=6
        # batches — the held-out eval sees every scene exactly once
        assert (142 - N_TRAIN_SCENES) % EVAL_BS == 0


class TestMeanEpe:
    def test_averages_per_scene(self, bank):
        batches = make_batches(bank, [0, 1], np.random.default_rng(0), 2)

        def fake_eval_step(variables, b):
            # per-scene EPEs 1.0 and 3.0 -> mean 2.0
            return np.asarray([1.0, 3.0]), None, None

        assert mean_epe(fake_eval_step, None, batches) == pytest.approx(2.0)


class TestFixtureResolver:
    """utils/fixtures.py: evidence/fixtures is the durable store, /tmp the
    cache (VERDICT r4 weak #5 — the round-4 host reboot wiped /tmp
    mid-round and cost a multi-hour fixture regeneration)."""

    def test_roundtrip(self, tmp_path, monkeypatch):
        from kd_pointcloud_tpu.utils import fixtures

        cache = tmp_path / "cache"
        evid = tmp_path / "evidence"
        evid.mkdir()
        monkeypatch.setattr(fixtures, "EVIDENCE_DIR", str(evid))
        monkeypatch.setattr(fixtures, "CHECKPOINT_DIR",
                            str(tmp_path / "none"))

        # miss everywhere
        assert fixtures.fixture_path("a.npz", str(cache)) is None

        # generate into cache, persist, wipe cache, hydrate back
        cache.mkdir()
        (cache / "a.npz").write_bytes(b"payload")
        dst = fixtures.persist_fixture("a.npz", str(cache))
        assert osp.exists(dst)
        (cache / "a.npz").unlink()
        p = fixtures.fixture_path("a.npz", str(cache))
        assert p is not None and open(p, "rb").read() == b"payload"

    def test_stale_cache_refreshed_from_evidence(self, tmp_path,
                                                 monkeypatch):
        """Round-5 review finding #1: a pre-existing stale /tmp cache must
        not shadow a newer committed evidence fixture — licensing deltas
        would be computed on the wrong checkpoint while logging a
        correct-looking path."""
        from kd_pointcloud_tpu.utils import fixtures

        cache = tmp_path / "cache"
        evid = tmp_path / "evidence"
        cache.mkdir(), evid.mkdir()
        monkeypatch.setattr(fixtures, "EVIDENCE_DIR", str(evid))
        monkeypatch.setattr(fixtures, "CHECKPOINT_DIR",
                            str(tmp_path / "none"))

        (cache / "a.npz").write_bytes(b"stale-old-run")
        (evid / "a.npz").write_bytes(b"committed")
        p = fixtures.fixture_path("a.npz", str(cache))
        assert open(p, "rb").read() == b"committed"
        # and the refreshed cache now (size, mtime)-matches → no re-copy
        # churn on subsequent lookups (mtime preserved by copy2)
        s = osp.getmtime(p)
        assert fixtures.fixture_path("a.npz", str(cache)) == p
        assert osp.getmtime(p) == s

    def test_alias_resolves_and_direct_name_wins(self, tmp_path,
                                                 monkeypatch):
        """The semitrained_teacher alias must resolve to the round-5 18k
        evidence fixture, NOT round-4's same-named 6k checkpoint in
        CHECKPOINT_DIR; a freshly persisted direct-name fixture takes
        precedence over the alias."""
        from kd_pointcloud_tpu.utils import fixtures

        cache = tmp_path / "cache"
        evid = tmp_path / "evidence"
        legacy = tmp_path / "legacy"
        cache.mkdir(), evid.mkdir(), legacy.mkdir()
        monkeypatch.setattr(fixtures, "EVIDENCE_DIR", str(evid))
        monkeypatch.setattr(fixtures, "CHECKPOINT_DIR", str(legacy))
        monkeypatch.setattr(fixtures, "_ALIASES",
                            {"t.msgpack": "t_18k.msgpack"})

        (legacy / "t.msgpack").write_bytes(b"round4-6k")
        (evid / "t_18k.msgpack").write_bytes(b"round5-18k")
        p = fixtures.fixture_path("t.msgpack", str(cache))
        assert open(p, "rb").read() == b"round5-18k"

        (evid / "t.msgpack").write_bytes(b"fresh-regen")
        p = fixtures.fixture_path("t.msgpack", str(cache))
        assert open(p, "rb").read() == b"fresh-regen"

    def test_real_evidence_store_resolves(self):
        """The semitrained licensing checkpoints are committed in-repo and
        must resolve via the fixture API — including the teacher alias to
        the round-5 18k regime (NOT round-4's same-named 6k checkpoint)."""
        from kd_pointcloud_tpu.utils.fixtures import (_ALIASES,
                                                      CHECKPOINT_DIR,
                                                      EVIDENCE_DIR)
        assert osp.exists(osp.join(CHECKPOINT_DIR,
                                   "semitrained_teacher.msgpack"))
        assert osp.exists(
            osp.join(EVIDENCE_DIR,
                     _ALIASES["semitrained_teacher.msgpack"]))
