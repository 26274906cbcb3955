"""Round-2 coverage: full-state checkpoint resume, multi-device (8-CPU mesh)
training/distill parity, uneven-batch guard, and the multiprocess loader.

VERDICT round-1 items #3/#4/#5/#10: the reference never saves optimizer
state (train_bid_pointconv.py:172-177) and its DataParallel path is gated but
untested; here resume is bit-identical and the mesh path is exercised in the
suite, not just the driver dryrun.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_pointcloud_tpu.data.loader import (DataLoader, PAD_PATH, pad_batch,
                                           valid_count)
from kd_pointcloud_tpu.models import BidPointFlowNet, tiny_config
from kd_pointcloud_tpu.parallel import (batch_sharding, data_parallel_sharding,
                                        make_mesh, replicate)
from kd_pointcloud_tpu.train import (TrainState, make_optimizer,
                                     make_train_step, set_learning_rate)
from kd_pointcloud_tpu.train.checkpoints import (full_state_tree,
                                                 restore_train_state,
                                                 save_checkpoint)

N = 256


def _batch(rng, b=2):
    mk = lambda: jnp.asarray(rng.randn(b, N, 3).astype(np.float32))
    pos1, pos2 = mk(), mk()
    return dict(pos1=pos1, pos2=pos2, norm1=pos1, norm2=pos2,
                flow=mk() * 0.1)


def _init(model, batch, seed=0):
    return jax.jit(lambda k: model.init(k, batch["pos1"], batch["pos2"],
                                        batch["norm1"], batch["norm2"],
                                        train=False))(jax.random.PRNGKey(seed))


def _leaves_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


class TestKillAndResume:
    def test_bit_identical_continuation(self, rng, tmp_path):
        """Save after 2 steps, restore into a FRESH state, run 2 more — the
        final params must be bit-identical to 4 uninterrupted steps (Adam
        moments + injected lr travel with the checkpoint)."""
        model = BidPointFlowNet(tiny_config("teacher"))
        batch = _batch(rng)
        tx = make_optimizer(1e-3)
        step = make_train_step(model, tx, donate=False)

        # uninterrupted run: 4 steps
        state_a = TrainState.create(_init(model, batch), tx)
        state_a = state_a.replace(
            opt_state=set_learning_rate(state_a.opt_state, 3e-4))
        for _ in range(4):
            state_a, _ = step(state_a, batch)

        # interrupted run: 2 steps, checkpoint, fresh state, restore, 2 steps
        state_b = TrainState.create(_init(model, batch), tx)
        state_b = state_b.replace(
            opt_state=set_learning_rate(state_b.opt_state, 3e-4))
        for _ in range(2):
            state_b, _ = step(state_b, batch)
        path = save_checkpoint(str(tmp_path), "T", 5, 0.5,
                               full_state_tree(state_b, 5, 0.5))

        fresh = TrainState.create(_init(model, batch, seed=9), tx)
        restored, epoch, best_epe, _ = restore_train_state(path, fresh)
        assert epoch == 5 and best_epe == pytest.approx(0.5)
        # injected lr travels inside opt_state
        assert float(restored.opt_state.hyperparams["lr"]) == \
            pytest.approx(3e-4)
        for _ in range(2):
            restored, _ = step(restored, batch)

        assert _leaves_equal(state_a.params, restored.params)
        assert _leaves_equal(state_a.opt_state, restored.opt_state)

    def test_bare_checkpoint_fallback(self, rng, tmp_path):
        """Weight-only checkpoints (converted reference .pth) restore params
        and fall back to filename-epoch semantics."""
        model = BidPointFlowNet(tiny_config("teacher"))
        batch = _batch(rng)
        tx = make_optimizer(1e-3)
        state = TrainState.create(_init(model, batch), tx)
        path = save_checkpoint(str(tmp_path), "T", 42, 0.1234,
                               {"params": state.params,
                                "batch_stats": state.batch_stats})
        fresh = TrainState.create(_init(model, batch, seed=9), tx)
        restored, epoch, best_epe, _ = restore_train_state(path, fresh)
        assert epoch == 42 and best_epe == float("inf")
        assert _leaves_equal(state.params, restored.params)

    def test_extra_trees_roundtrip(self, rng, tmp_path):
        """Bridge-mode checkpoints carry the bridge params/opt alongside."""
        model = BidPointFlowNet(tiny_config("teacher"))
        batch = _batch(rng)
        tx = make_optimizer(1e-3)
        state = TrainState.create(_init(model, batch), tx)
        extra = {"bridge_params": {"w": jnp.ones((3, 3))}}
        path = save_checkpoint(str(tmp_path), "S", 1, 0.9,
                               full_state_tree(state, 1, 0.9, extra=extra))
        fresh = TrainState.create(_init(model, batch, seed=9), tx)
        _, _, _, out = restore_train_state(
            path, fresh, extra={"bridge_params": {"w": jnp.zeros((3, 3))}})
        assert np.array_equal(np.asarray(out["bridge_params"]["w"]),
                              np.ones((3, 3)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
class TestMultiDevice:
    def test_sharded_train_matches_single(self, rng):
        """Same batch, same init: loss and gradients from the 8-way sharded
        step match the single-device step (psum-of-means == mean). Gradients,
        not post-Adam params — Adam's first update is ~sign(g)·lr, which
        amplifies reduction-order float noise in near-zero grads."""
        from kd_pointcloud_tpu.losses import multi_scale_loss

        model = BidPointFlowNet(tiny_config("teacher"))
        batch = _batch(rng, b=8)
        variables = _init(model, batch)

        @jax.jit
        def loss_and_grads(params, batch_stats, batch):
            def compute(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["pos1"], batch["pos2"], batch["norm1"],
                    batch["norm2"], train=True, mutable=["batch_stats"])
                return multi_scale_loss(out["flows"], batch["flow"],
                                        out["fps_idx1"])
            return jax.value_and_grad(compute)(params)

        loss1, g1 = loss_and_grads(variables["params"],
                                   variables["batch_stats"], batch)

        mesh = make_mesh()
        sh = batch_sharding(mesh)
        sharded = {k: jax.device_put(v, sh) for k, v in batch.items()}
        rep = replicate(mesh, variables)
        loss8, g8 = loss_and_grads(rep["params"], rep["batch_stats"], sharded)

        assert float(loss8) == pytest.approx(float(loss1), rel=1e-5)

        # per-sample forward outputs must agree tightly — this is the real
        # SPMD-correctness check (no cross-sample reductions involved)
        @jax.jit
        def flow0(variables, batch):
            out = model.apply(variables, batch["pos1"], batch["pos2"],
                              batch["norm1"], batch["norm2"], train=False)
            return out["flows"][0]

        f1 = np.asarray(flow0(variables, batch))
        f8 = np.asarray(flow0(rep, sharded))
        np.testing.assert_allclose(f1, f8, rtol=1e-4, atol=1e-5)

        # grads agree up to reduction-order noise. Per-leaf elementwise
        # compares are meaningless for near-cancelling leaves (rel error can
        # hit O(1) on a ~1e-4-norm leaf), so check the global gradient: the
        # whole-tree relative L2 must be tiny.
        x = np.concatenate([np.asarray(l).ravel()
                            for l in jax.tree_util.tree_leaves(g1)])
        y = np.concatenate([np.asarray(l).ravel()
                            for l in jax.tree_util.tree_leaves(g8)])
        rel = np.linalg.norm(x - y) / np.linalg.norm(x)
        assert rel < 5e-3, rel

    def test_sharded_distill_step(self, rng):
        """Two sharded distill steps run and produce finite losses with the
        teacher replicated and the batch split over the mesh
        (distilTrain.py:108-114 DataParallel parity)."""
        from kd_pointcloud_tpu.losses import bidirection_loss_ht
        from kd_pointcloud_tpu.train.distill import make_distill_step

        t_model = BidPointFlowNet(tiny_config("teacher"))
        s_model = BidPointFlowNet(tiny_config("teacher"))
        batch = _batch(rng, b=8)
        mesh = make_mesh()
        sh = batch_sharding(mesh)
        sharded = {k: jax.device_put(v, sh) for k, v in batch.items()}

        t_vars = replicate(mesh, _init(t_model, batch, 1))
        tx = make_optimizer(1e-3)
        state = TrainState.create(replicate(mesh, _init(s_model, batch)), tx)

        def loss_fn(s_out, t_out, b):
            return bidirection_loss_ht(
                s_out["flows"], s_out["feat1s"], s_out["feat2s"],
                s_out["fps_idx1"], b["flow"], t_out["flows"],
                t_out["feat1s"], t_out["feat2s"], gamma=0.3, beta=0.8,
                layer=1)

        step = make_distill_step(t_model, s_model, tx, loss_fn=loss_fn)
        for _ in range(2):
            state, loss = step(state, t_vars, sharded)
            assert np.isfinite(float(loss))
        assert int(state.step) == 2

    def test_uneven_batch_guard(self):
        """batch_size 3 does not divide 8 devices → explicit single-device
        fallback instead of a wrong-shape crash."""
        mesh, sharding = data_parallel_sharding(3)
        assert sharding is None
        mesh, sharding = data_parallel_sharding(8)
        assert sharding is not None

    def test_sharded_eval_matches_single(self, rng):
        """evaluate_model over an 8-way mesh reproduces the single-device
        sweep (per-sample metric rows, params replicated, pad masking)."""
        from kd_pointcloud_tpu.eval.runner import evaluate_model

        model = BidPointFlowNet(tiny_config("teacher"))
        batch = _batch(rng, b=8)
        variables = _init(model, batch)

        def fake_loader():
            np_b = [np.asarray(batch[k]) for k in
                    ("pos1", "pos2", "norm1", "norm2", "flow")]
            paths = [f"scene{i}" for i in range(8)]
            yield (*np_b, paths)

        single = evaluate_model(model, variables, fake_loader(),
                                with_2d=False)
        sharded = evaluate_model(model, variables, fake_loader(),
                                 with_2d=False, mesh=make_mesh())
        for k in single:
            assert single[k] == pytest.approx(sharded[k], rel=2e-4), k


# ---------------------------------------------------------------- loader

class SyntheticDataset:
    """Picklable dataset for process-pool loader tests."""

    def __init__(self, n=10, npts=32):
        self.n = n
        self.npts = npts
        self.seed = 0

    def reseed(self, seed):
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)   # content depends only on index
        pc = rng.standard_normal((self.npts, 3)).astype(np.float32)
        return pc, pc + 1, pc, pc + 1, np.ones_like(pc), f"scene{i}"


class TestLoader:
    def test_process_pool_contents(self):
        ds = SyntheticDataset(n=10)
        dl = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True,
                        num_workers=2)
        try:
            batches = list(dl)
            assert len(batches) == 3
            # deterministic content regardless of which worker loaded it
            ref = np.random.default_rng(4).standard_normal((32, 3))
            np.testing.assert_allclose(batches[1][0][1],
                                       ref.astype(np.float32), rtol=1e-6)
            assert batches[2][5] == ["scene6", "scene7", "scene8"]
            # pool reused across epochs
            assert len(list(dl)) == 3
        finally:
            dl.close()

    def test_pad_last_and_valid_count(self):
        ds = SyntheticDataset(n=10)
        dl = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                        pad_last=True, num_workers=0)
        batches = list(dl)
        assert len(batches) == 3
        last = batches[-1]
        assert last[0].shape[0] == 4
        assert valid_count(last) == 2
        assert last[5][2:] == [PAD_PATH, PAD_PATH]
        # padded rows repeat the final real sample
        np.testing.assert_array_equal(last[0][1], last[0][2])

    def test_early_abandonment_no_hang(self):
        """Abandoning the iterator mid-epoch must not leave a blocked
        producer (round-1 leak: blocking q.put never saw the stop event)."""
        import threading

        before = threading.active_count()
        ds = SyntheticDataset(n=40)
        dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        prefetch=1)
        it = iter(dl)
        next(it)
        it.close()   # generator finally -> stop.set()
        import time
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_pad_batch_noop_when_full(self):
        ds = SyntheticDataset(n=4)
        dl = DataLoader(ds, batch_size=2, shuffle=False, pad_last=True,
                        num_workers=0)
        for b in dl:
            assert valid_count(b) == 2


class TestMultichipRecipe:
    """Round-3 recipe machinery (VERDICT r2 #4): per-device batch scaling +
    padded data-parallel batches with loss masking."""

    def test_resolve_global_batch(self):
        from kd_pointcloud_tpu.parallel import resolve_global_batch

        assert resolve_global_batch(3, False) == 3
        assert resolve_global_batch(3, True, n_devices=8) == 24
        assert resolve_global_batch(8, True) == 8 * jax.device_count()

    def test_plan_pads_nondivisible(self):
        from kd_pointcloud_tpu.parallel import data_parallel_plan

        mesh, sharding, padded = data_parallel_plan(3)
        assert len(mesh.devices.flat) == 8
        assert sharding is not None, "bs=3 must stay data-parallel now"
        assert padded == 8
        _, _, padded_ok = data_parallel_plan(16)
        assert padded_ok == 16

    def test_padded_weighted_step_matches_single_device(self, rng):
        """The reference bs=3 recipe on the 8-device mesh: the padded,
        weight-masked sharded step computes the SAME loss and params as the
        identical padded batch on one device (exact), and the same loss as
        the unpadded bs=3 batch up to BN batch-stat contamination from the
        repeated pad rows (documented approximation)."""
        from kd_pointcloud_tpu.parallel import (batch_sharding, make_mesh,
                                                replicate)
        from kd_pointcloud_tpu.train.loop import batch_to_device

        model = BidPointFlowNet(tiny_config("teacher"))
        b3_np = tuple(
            rng.randn(3, N, 3).astype(np.float32) for _ in range(5))
        batch_np = b3_np + (["a", "b", "c"],)

        padded = batch_to_device(batch_np, pad_to=8)
        assert padded["pos1"].shape[0] == 8
        assert float(jnp.sum(padded["weight"])) == 3.0

        variables = _init(model, padded)
        tx = make_optimizer(1e-3)
        step = make_train_step(model, tx, donate=False)

        # single device, padded + masked
        state1 = TrainState.create(variables, tx)
        state1, loss1 = step(state1, padded)

        # 8-device mesh, same padded batch sharded
        mesh = make_mesh(8)
        sh = batch_sharding(mesh)
        sharded = {k: jax.device_put(v, sh) for k, v in padded.items()}
        state8 = TrainState.create(replicate(mesh, variables), tx)
        state8 = jax.device_put(state8, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        state8, loss8 = step(state8, sharded)

        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-6)
        # post-Adam params: reduction-order noise in the psum'd gradients
        # flips signs of near-zero grads, and a step-1 Adam update is
        # ±lr·m̂/√v̂ ≈ ±lr regardless of magnitude — so leaves can differ by
        # up to ~2·lr elementwise. Bound by the Adam step size; gradient
        # EQUALITY under sharding is pinned by
        # TestMultiDevice::test_sharded_train_matches_single.
        la = jax.tree_util.tree_leaves(state1.params)
        lb = jax.tree_util.tree_leaves(state8.params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2.5e-3, rtol=0)

        # vs the true unpadded bs=3 loss: identical up to BN batch stats
        unpadded = batch_to_device(batch_np)
        state3 = TrainState.create(variables, tx)
        _, loss3 = step(state3, unpadded)
        assert abs(float(loss1) - float(loss3)) / float(loss3) < 0.05
