"""Numeric parity of the KD loss library vs the ACTUAL reference
loss_functions.py (run on CPU torch with the CUDA calls stubbed).

Covers every loss whose reference implementation is runnable; documents the
two that are not parity-comparable:
  * flow_loss_ht — broken as committed (NameError: fps_idxs/loss1,
    loss_functions.py:98-120); asserted to raise, ours implements the intent.
  * att_iter/att_ht distil-ratio indexing — the reference permutes the
    stacked ratio tensor to (iters, layers, B) but then indexes it
    [layer][iter] (loss_functions.py:144-153), transposing layer and iter
    whenever the two counts coincide (and crashing otherwise); ours indexes
    ratios[layer][:, iter] per the evident intent. Parity is asserted
    against the reference WITH its transposition replicated on our side.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from kd_pointcloud_tpu import losses  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from make_parity_fixture import install_stubs  # noqa: E402

ALPHA = (0.02, 0.04, 0.08, 0.16)
SIZES = (64, 32, 16, 8)
B = 2


@pytest.fixture(scope="module")
def ref():
    install_stubs()
    # loss_functions calls .cuda() on tensors and modules — run on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import loss_functions
    return loss_functions


@pytest.fixture
def data(rng):
    def t(x):
        return torch.from_numpy(np.asarray(x))

    flows = [rng.randn(B, 3, n).astype(np.float32) for n in SIZES]
    t_flows = [rng.randn(B, 3, n).astype(np.float32) for n in SIZES]
    gt = rng.randn(B, SIZES[0], 3).astype(np.float32)
    fps1 = [rng.randint(0, SIZES[i], size=(B, SIZES[i + 1])).astype(np.int64)
            for i in range(3)]
    fps2 = [rng.randint(0, SIZES[i], size=(B, SIZES[i + 1])).astype(np.int64)
            for i in range(3)]
    feats = [rng.randn(B, 8, n).astype(np.float32) for n in SIZES]
    t_feats = [rng.randn(B, 8, n).astype(np.float32) for n in SIZES]
    feats2 = [rng.randn(B, 8, n).astype(np.float32) for n in SIZES]
    t_feats2 = [rng.randn(B, 8, n).astype(np.float32) for n in SIZES]
    return dict(
        # torch side: flows (B, 3, N) channels-first, feats (B, C, N)
        tt=dict(flows=[t(f) for f in flows], t_flows=[t(f) for f in t_flows],
                gt=t(gt), fps1=[t(i) for i in fps1], fps2=[t(i) for i in fps2],
                feats=[t(f) for f in feats], t_feats=[t(f) for f in t_feats],
                feats2=[t(f) for f in feats2],
                t_feats2=[t(f) for f in t_feats2]),
        # jax side: channels-last
        jx=dict(flows=[jnp.asarray(f.transpose(0, 2, 1)) for f in flows],
                t_flows=[jnp.asarray(f.transpose(0, 2, 1)) for f in t_flows],
                gt=jnp.asarray(gt),
                fps1=[jnp.asarray(i.astype(np.int32)) for i in fps1],
                fps2=[jnp.asarray(i.astype(np.int32)) for i in fps2],
                feats=[jnp.asarray(f.transpose(0, 2, 1)) for f in feats],
                t_feats=[jnp.asarray(f.transpose(0, 2, 1)) for f in t_feats],
                feats2=[jnp.asarray(f.transpose(0, 2, 1)) for f in feats2],
                t_feats2=[jnp.asarray(f.transpose(0, 2, 1))
                          for f in t_feats2]))


def _close(ours, theirs, rel=2e-5):
    assert float(ours) == pytest.approx(float(theirs), rel=rel)


class TestKDLossParity:
    def test_multiscale(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.multiScaleLoss(tt["flows"], tt["gt"], tt["fps1"])
        got = losses.multi_scale_loss(jx["flows"], jx["gt"], jx["fps1"])
        _close(got, want)

    def test_loss_fn_kd_2(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.loss_fn_kd_2(tt["flows"], tt["fps1"], tt["gt"],
                                tt["t_flows"], tt["fps1"], 0.7)
        got = losses.loss_fn_kd_2(jx["flows"], jx["fps1"], jx["gt"],
                                  jx["t_flows"], jx["fps1"], 0.7)
        _close(got, want)

    def test_attentive_imitation(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        hist = [0.5, 2.5, 1.0]
        want = ref.attentiveImitationLoss(tt["flows"], tt["fps1"], tt["gt"],
                                          tt["t_flows"], tt["fps1"],
                                          hist, 0.6)
        got = losses.attentive_imitation_loss(jx["flows"], jx["fps1"],
                                              jx["gt"], jx["t_flows"],
                                              jx["fps1"], hist, 0.6)
        _close(got, want)

    def test_bidirection(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.biDirectionLoss(tt["flows"], tt["fps1"], tt["fps2"],
                                   tt["gt"], tt["t_flows"], tt["fps1"],
                                   0.3, 0.6, 0.8)
        got = losses.bidirection_loss(jx["flows"], jx["fps1"], jx["fps2"],
                                      jx["gt"], jx["t_flows"], jx["fps1"],
                                      0.3, 0.6, 0.8)
        _close(got, want)

    def test_loss_fn_ht(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.loss_fn_ht(tt["flows"], tt["feats"], tt["fps1"],
                              tt["fps2"], tt["gt"], tt["t_flows"],
                              tt["t_feats"], tt["fps1"], 0.4, layer=1)
        got = losses.loss_fn_ht(jx["flows"], jx["feats"], jx["fps1"],
                                jx["gt"], jx["t_flows"], jx["t_feats"],
                                0.4, layer=1)
        _close(got, want)

    def test_bidirection_ht(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.biDirection_loss_ht(
            tt["flows"], tt["feats"], tt["feats2"], tt["fps1"], tt["fps2"],
            tt["gt"], tt["t_flows"], tt["t_feats"], tt["t_feats2"],
            tt["fps1"], tt["fps2"], 0.3, 0.8, layer=1)
        got = losses.bidirection_loss_ht(
            jx["flows"], jx["feats"], jx["feats2"], jx["fps1"], jx["gt"],
            jx["t_flows"], jx["t_feats"], jx["t_feats2"], 0.3, 0.8, layer=1)
        _close(got, want)

    def test_flow_loss_ht_reference_is_broken(self, ref, data):
        """Documents the justified divergence: the committed reference body
        references undefined names (loss_functions.py:101 `fps_idxs`)."""
        tt = data["tt"]
        with pytest.raises(NameError):
            ref.flow_loss_ht(tt["flows"], tt["feats"], tt["feats2"],
                             tt["fps1"], tt["fps2"], tt["gt"], tt["t_flows"],
                             tt["t_feats"], tt["t_feats2"], tt["fps1"],
                             tt["fps2"], 0.3, 0.8, layer=1)

    def test_cross_bidirection_ht(self, ref, data, rng):
        tt, jx = data["tt"], data["jx"]
        # student layer must be 2x teacher width for the concat hint
        wide_t = [torch.from_numpy(rng.randn(B, 16, n).astype(np.float32))
                  for n in SIZES]
        want = ref.cross_biDirection_loss_ht(
            tt["flows"], wide_t, tt["feats2"], tt["fps1"], tt["fps2"],
            tt["gt"], tt["t_flows"], tt["t_feats"], tt["t_feats2"],
            tt["fps1"], tt["fps2"], 0.3, 0.8, layer=(2, 3))
        got = losses.cross_bidirection_loss_ht(
            jx["flows"], [jnp.asarray(w.numpy().transpose(0, 2, 1))
                          for w in wide_t], jx["fps1"], jx["gt"],
            jx["t_flows"], jx["t_feats"], jx["t_feats2"], 0.3, 0.8,
            layer=(2, 3))
        _close(got, want)

    def test_cross_loss(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.cross_loss(tt["flows"], tt["feats"], tt["fps1"],
                              tt["fps2"], tt["gt"], tt["t_flows"],
                              tt["t_feats"], tt["fps1"], tt["fps2"],
                              0.3, 0.8)
        got = losses.cross_loss(jx["flows"], jx["feats"], jx["fps1"],
                                jx["gt"], jx["t_flows"], jx["t_feats"],
                                0.3, 0.8)
        _close(got, want)

    def test_bridge_ht(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.bridge_ht_loss(
            tt["flows"], tt["feats"], tt["feats2"], tt["fps1"], tt["fps2"],
            tt["gt"], tt["t_flows"], tt["t_feats"][3], tt["t_feats2"][3],
            tt["fps1"], tt["fps2"], 0.3, 0.8, layer=3)
        got = losses.bridge_ht_loss(
            jx["flows"], jx["feats"], jx["feats2"], jx["fps1"], jx["gt"],
            jx["t_flows"], jx["t_feats"][3], jx["t_feats2"][3], 0.3, 0.8,
            layer=3)
        _close(got, want)

    def test_bridge_ht_iter(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.bridge_ht_loss_iter(
            tt["flows"], tt["feats"], tt["feats2"], tt["fps1"], tt["fps2"],
            tt["gt"], tt["t_flows"],
            [tt["t_feats"][2], tt["t_feats"][3]],
            [tt["t_feats2"][2], tt["t_feats2"][3]],
            tt["fps1"], tt["fps2"], 0.3, 0.8, layer=[2, 3])
        got = losses.bridge_ht_loss_iter(
            jx["flows"], jx["feats"], jx["feats2"], jx["fps1"], jx["gt"],
            jx["t_flows"], [jx["t_feats"][2], jx["t_feats"][3]],
            [jx["t_feats2"][2], jx["t_feats2"][3]], 0.3, 0.8, layer=(2, 3))
        _close(got, want)

    def test_double_bridge_ht(self, ref, data):
        tt, jx = data["tt"], data["jx"]
        want = ref.double_bridge_ht_loss(
            tt["flows"], tt["feats"], tt["feats2"], tt["fps1"], tt["fps2"],
            tt["feats"], tt["gt"], tt["t_flows"], tt["t_feats"][3],
            tt["t_feats2"][3], tt["fps1"], tt["fps2"], tt["t_feats"],
            (0.2, 0.5, 0.3), 0.8, layer=3)
        got = losses.double_bridge_ht_loss(
            jx["flows"], jx["feats"], jx["feats2"], jx["fps1"], jx["feats"],
            jx["gt"], jx["t_flows"], jx["t_feats"][3], jx["t_feats2"][3],
            jx["t_feats"], (0.2, 0.5, 0.3), 0.8, layer=3)
        _close(got, want)

    def test_multiscale_iterative(self, ref, data, rng):
        """Iterative-teacher supervision: the bifeat model file ships its own
        multiScaleLoss taking FLATTENED per-iteration flows with None
        interleaved in the fps chain (models_bifeat.py:231-256); our nested
        per-iteration lists must score identically."""
        sys.path.insert(0, "/root/reference")
        import importlib
        import models_bifeat
        tt, jx = data["tt"], data["jx"]
        it2 = [rng.randn(B, 3, n).astype(np.float32) for n in SIZES[:3]]
        # reference: flattened [l0i0, l0i1, l1i0, l1i1, l2i0, l2i1, l3] with
        # fps chain [None, f0, None, f1, None, f2]
        flat_t = []
        fps_t = []
        for lvl in range(3):
            flat_t += [tt["flows"][lvl],
                       torch.from_numpy(it2[lvl])]
            fps_t += [None, tt["fps1"][lvl]]
        flat_t.append(tt["flows"][3])
        want = models_bifeat.multiScaleLoss(flat_t, tt["gt"], fps_t)
        nested_j = [[jx["flows"][lvl],
                     jnp.asarray(it2[lvl].transpose(0, 2, 1))]
                    for lvl in range(3)] + [jx["flows"][3]]
        got = losses.multi_scale_loss(nested_j, jx["gt"], jx["fps1"])
        _close(got, want)

    def test_att_ht(self, ref, data):
        """Attentive feature-hint loss: the reference norms the hint over
        the POINT axis then sums channels (loss_functions.py:188-193) —
        parity pins that axis order; ratio lookup transposed as in
        test_att_iter."""
        tt, jx = data["tt"], data["jx"]
        t_iter_t = [[f, torch.from_numpy(np.asarray(f) * 0.5)]
                    for f in tt["t_flows"]]
        t_iter_j = [[jnp.asarray(np.asarray(f)), jnp.asarray(
            np.asarray(f) * 0.5)] for f in jx["t_flows"]]
        t_cf1_t = [[f, f * 0.5] for f in tt["t_feats"]]
        t_cf2_t = [[f, f * 0.5] for f in tt["t_feats2"]]
        t_cf1_j = [[f, f * 0.5] for f in jx["t_feats"]]
        t_cf2_j = [[f, f * 0.5] for f in jx["t_feats2"]]
        want = ref.att_ht_loss(
            tt["flows"], tt["feats"], tt["feats2"], tt["fps1"], tt["fps2"],
            tt["gt"], t_iter_t, t_cf1_t, t_cf2_t, tt["fps1"], tt["fps2"],
            0.6, layers=(1, 2))

        import kd_pointcloud_tpu.losses.kd as kd
        orig = kd._distil_ratios

        def transposed(t_outputs, gt_flows, layers):
            r = orig(t_outputs, gt_flows, layers)
            stacked = jnp.stack(r, axis=1)
            return [stacked[:, :, i] for i in range(stacked.shape[1])]

        kd._distil_ratios = transposed
        try:
            got = losses.att_ht_loss(
                jx["flows"], jx["feats"], jx["feats2"], jx["fps1"],
                jx["gt"], t_iter_j, t_cf1_j, t_cf2_j, jx["fps1"],
                0.6, layers=(1, 2))
        finally:
            kd._distil_ratios = orig
        _close(got, want, rel=1e-4)

    def test_att_iter(self, ref, data):
        """Iterative-teacher attentive loss. The reference's ratio tensor is
        indexed (layer, iter) on an (iters, layers, B) permutation — with
        layers=(1,2) and 2 iterations the shapes coincide and the lookup is
        silently TRANSPOSED. Ours indexes per intent; parity is checked by
        applying the same transposition to our ratio lookup."""
        tt, jx = data["tt"], data["jx"]
        t_iter_t = [[f, torch.from_numpy(
            np.asarray(f) * 0.5)] for f in tt["t_flows"]]
        t_iter_j = [[jnp.asarray(np.asarray(f)), jnp.asarray(
            np.asarray(f) * 0.5)] for f in jx["t_flows"]]
        want = ref.att_iter_loss(
            tt["flows"], tt["feats"], tt["feats2"], tt["fps1"], tt["fps2"],
            tt["gt"], t_iter_t, None, None, tt["fps1"], tt["fps2"],
            0.6, layers=(1, 2))

        import kd_pointcloud_tpu.losses.kd as kd
        orig = kd._distil_ratios

        def transposed(t_outputs, gt_flows, layers):
            r = orig(t_outputs, gt_flows, layers)       # [L][B, iters]
            stacked = jnp.stack(r, axis=1)              # (B, L, iters)
            # reference lookup: permute to (iters, L, B) then index
            # [layer][iter] → equals stacked[b, iter, layer]
            return [stacked[:, :, i] for i in range(stacked.shape[1])]

        kd._distil_ratios = transposed
        try:
            got = losses.att_iter_loss(
                jx["flows"], jx["fps1"], jx["gt"], t_iter_j, jx["fps1"],
                0.6, layers=(1, 2))
        finally:
            kd._distil_ratios = orig
        _close(got, want, rel=1e-4)
