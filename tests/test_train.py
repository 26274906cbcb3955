"""Train/distill step tests on tiny models (virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd_pointcloud_tpu.models import BidPointFlowNet, Bridge, tiny_config
from kd_pointcloud_tpu.train import (TrainState, make_optimizer,
                                     make_train_step, set_learning_rate,
                                     step_lr)
from kd_pointcloud_tpu.train.distill import (make_bridge_distill_step,
                                             make_distill_step,
                                             make_fast_distill_step)

N = 256


@pytest.fixture
def batch(rng):
    mk = lambda: jnp.asarray(rng.randn(2, N, 3).astype(np.float32))
    pos1, pos2 = mk(), mk()
    return dict(pos1=pos1, pos2=pos2, norm1=pos1, norm2=pos2, flow=mk() * 0.1)


def _init(model, batch, seed=0):
    return jax.jit(lambda k: model.init(k, batch["pos1"], batch["pos2"],
                                        batch["norm1"], batch["norm2"],
                                        train=False))(jax.random.PRNGKey(seed))


class TestSchedule:
    def test_step_lr(self):
        assert step_lr(1e-3, 0) == 1e-3
        assert step_lr(1e-3, 100) == 5e-4
        assert step_lr(1e-3, 250) == 2.5e-4
        assert step_lr(1e-3, 10_000) == 1e-5   # clip (train_bid_pointconv.py:126)


class TestTrainStep:
    def test_loss_decreases(self, batch):
        model = BidPointFlowNet(tiny_config("teacher"))
        variables = _init(model, batch)
        tx = make_optimizer(1e-3)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, donate=False)
        losses = []
        for _ in range(5):
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_lr_injection(self, batch):
        model = BidPointFlowNet(tiny_config("teacher"))
        tx = make_optimizer(1e-3)
        state = TrainState.create(_init(model, batch), tx)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 1e-5))
        assert float(state.opt_state.hyperparams["lr"]) == pytest.approx(1e-5)


class TestDistillSteps:
    def test_standard(self, batch):
        t_model = BidPointFlowNet(tiny_config("teacher"))
        s_model = BidPointFlowNet(tiny_config("teacher"))
        t_vars = _init(t_model, batch, 1)
        tx = make_optimizer(1e-3)
        state = TrainState.create(_init(s_model, batch), tx)
        # hint vs concat of teacher feats needs 2x width — use plain layers
        # via a custom loss; here exercise the default on width-matched feats
        from kd_pointcloud_tpu.losses import bidirection_loss_ht

        def loss_fn(s_out, t_out, b):
            return bidirection_loss_ht(
                s_out["flows"], s_out["feat1s"], s_out["feat2s"],
                s_out["fps_idx1"], b["flow"], t_out["flows"],
                t_out["feat1s"], t_out["feat2s"], gamma=0.3, beta=0.8,
                layer=1)

        step = make_distill_step(t_model, s_model, tx, loss_fn=loss_fn)
        state2, loss = step(state, t_vars, batch)
        assert np.isfinite(float(loss))
        # teacher variables untouched; student stepped
        assert int(state2.step) == 1

    def test_fast_iterative(self, batch):
        t_model = BidPointFlowNet(tiny_config("bifeat"))
        s_model = BidPointFlowNet(tiny_config("fg"))
        t_vars = _init(t_model, batch, 1)
        tx = make_optimizer(1e-3)
        state = TrainState.create(_init(s_model, batch), tx)
        step = make_fast_distill_step(t_model, s_model, tx, gamma=0.6,
                                      layers=(1, 2))
        state2, loss = step(state, t_vars, batch)
        assert np.isfinite(float(loss))

    def test_bridge(self, batch):
        t_model = BidPointFlowNet(tiny_config("teacher"))
        s_model = BidPointFlowNet(tiny_config("teacher"))
        t_vars = _init(t_model, batch, 1)
        tx = make_optimizer(1e-3)
        b_tx = make_optimizer(1e-3)
        state = TrainState.create(_init(s_model, batch), tx)

        layer = 3
        t_out = jax.eval_shape(lambda: t_model.apply(
            t_vars, batch["pos1"], batch["pos2"], batch["norm1"],
            batch["norm2"], train=False))
        feat_sh = t_out["feat1s"][layer].shape
        bridge = Bridge(feat_ch=feat_sh[-1])
        b_params = bridge.init(jax.random.PRNGKey(2),
                               jnp.zeros(feat_sh), jnp.zeros(feat_sh))["params"]
        b_opt = b_tx.init(b_params)

        step = make_bridge_distill_step(t_model, s_model, bridge, tx, b_tx,
                                        layer=layer)
        # b_params is donated by the step — snapshot to host first
        before = [np.asarray(p) for p in jax.tree_util.tree_leaves(b_params)]
        state2, b_params2, b_opt2, loss = step(state, b_params, b_opt,
                                               t_vars, batch)
        assert np.isfinite(float(loss))
        # the bridge trains through the hint loss (documented divergence)
        changed = any(
            not np.allclose(a, np.asarray(b))
            for a, b in zip(before, jax.tree_util.tree_leaves(b_params2)))
        assert changed


class TestMultichipEntry:
    def test_dryrun(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)

    def test_entry_shapes(self):
        import __graft_entry__ as g
        # compile-check on tiny shapes would need the full model; just check
        # the callable contract lazily via eval_shape on the returned fn
        fn, args = g.entry()
        out = jax.eval_shape(fn, *args)
        assert out.shape == (1, 8192, 3)


class TestCheckpoints:
    def test_roundtrip_and_naming(self, batch, tmp_path):
        from kd_pointcloud_tpu.train import (best_checkpoint, load_checkpoint,
                                             parse_epoch_from_name,
                                             save_checkpoint)
        model = BidPointFlowNet(tiny_config("teacher"))
        variables = _init(model, batch)
        tree = {"params": variables["params"],
                "batch_stats": variables["batch_stats"]}
        p1 = save_checkpoint(str(tmp_path), "PointConv", 7, 0.1234, tree)
        p2 = save_checkpoint(str(tmp_path), "PointConv", 9, 0.0777, tree)
        assert parse_epoch_from_name(p2) == 9
        assert best_checkpoint(str(tmp_path)) == p2

        restored = load_checkpoint(p1, tree)
        a = jax.tree_util.tree_leaves(tree["params"])
        b = jax.tree_util.tree_leaves(restored["params"])
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b))


class TestNaNRegression:
    def test_grad_finite_with_coincident_points(self, rng):
        """Regression: FPS-sampled sparse points are exact subsets of dense
        points, so upsample/warp hit zero distances; jax sqrt'(0)=inf would
        NaN every real training step (torch.norm has a 0 subgradient). Craft
        the worst case: pc2 == pc1 exactly, zero gt flow."""
        model = BidPointFlowNet(tiny_config("teacher"))
        pc = jnp.asarray(rng.randn(2, N, 3).astype(np.float32))
        batch = dict(pos1=pc, pos2=pc, norm1=pc, norm2=pc,
                     flow=jnp.zeros_like(pc))
        variables = _init(model, batch)
        tx = make_optimizer(1e-3)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, donate=False)
        for _ in range(2):
            state, loss = step(state, batch)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(np.isfinite(np.asarray(p)).all() for p in leaves)


class TestDistillExtras:
    def test_teacher_history_and_named_losses(self, batch, rng):
        from kd_pointcloud_tpu.train.distill_experiment import (
            compute_teacher_history, make_named_loss)
        from kd_pointcloud_tpu.utils import Config

        t_model = BidPointFlowNet(tiny_config("teacher"))
        t_vars = _init(t_model, batch, 1)
        fake_loader = [tuple(np.asarray(batch[k]) for k in
                             ("pos1", "pos2", "norm1", "norm2", "flow"))
                       + (["p"] * 2,)] * 3
        hist = compute_teacher_history(t_model, t_vars, fake_loader)
        assert len(hist) == 3 and all(np.isfinite(h) for h in hist)

        t_out = t_model.apply(t_vars, batch["pos1"], batch["pos2"],
                              batch["norm1"], batch["norm2"], train=False)
        s_out = t_out
        args = Config(dict(gamma=0.3, beta=0.8, hint_layers=[1]))
        for name in ("loss_fn_kd_2", "biDirectionLoss", "biDirection_loss_ht",
                     "cross_loss"):
            v = make_named_loss(name, args)(s_out, t_out, batch)
            assert np.isfinite(float(v)), name
        # identical batches give a constant history; perturb it (the
        # reference formula divides by max(hist)-min(hist))
        varied = [h * (1 + 0.1 * i) for i, h in enumerate(hist)]
        v = make_named_loss("attentiveImitationLoss", args)(
            s_out, t_out, batch, t_history=varied)
        assert np.isfinite(float(v))


class TestCustomLR:
    def test_schedule(self):
        from kd_pointcloud_tpu.train import custom_lr, lr_for_epoch
        from kd_pointcloud_tpu.utils import Config
        # cmd_args.py stores descending: lrs "1e-3,5e-4,1e-4" reversed
        lrs = [1e-4, 5e-4, 1e-3][::1]  # descending switch order
        lrs = [1e-4, 5e-4, 1e-3]
        switches = [200, 100, 0]
        assert custom_lr(0, lrs, switches) == 1e-3
        assert custom_lr(99, lrs, switches) == 1e-3
        assert custom_lr(100, lrs, switches) == 5e-4
        assert custom_lr(250, lrs, switches) == 1e-4
        args = Config(dict(custom_lr=True, lrs=lrs,
                           lr_switch_epochs=switches, learning_rate=1e-3))
        assert lr_for_epoch(args, 150) == 5e-4
        args2 = Config(dict(learning_rate=1e-3))
        assert lr_for_epoch(args2, 100) == 5e-4   # StepLR fallback
