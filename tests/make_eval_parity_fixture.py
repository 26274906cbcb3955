"""Generate the END-TO-END eval-parity fixture: run the REAL reference
pipeline (dataset → transform → torch model → 6 metrics incl. per-scene
calib projection) on CPU over bundled KITTI scenes.

This extends make_parity_fixture.py (single-forward flow parity) to the full
evaluation system of evaluate_bid_pointconv.py:105-148: the reference's own
datasets/kitti.py loader, transforms/transforms.py ProcessData sampling,
models_bid_lighttoken_res forward, evaluation_utils.evaluate_3d/2d, and
utils/geometry.get_batch_2d_flow with the per-scene calib_cam_to_cam files.

Saved per scene: the transformed clouds (pc1, pc2, sf), the scene path, the
raw (post-ground-removal) cloud heads for loader parity, and the reference's
6 metric values. Plus the random-init state_dict for torch_import.

Usage: python tests/make_eval_parity_fixture.py <out_dir> [n_scenes]
"""

import os.path as osp
import sys
import types

import numpy as np
import torch

from make_parity_fixture import install_stubs  # noqa: E402 (same dir)


def install_eval_stubs():
    """numba (absent from this image) + numpy aliases removed in numpy>=1.24
    that the reference still uses (evaluation_utils.py:29-31,
    transforms/transforms.py:154)."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda fn: fn

        class _Sig:
            """Stands in for numba type objects: indexable/callable to any
            depth (int64, int64[:], int64(...) signature forms)."""

            def __call__(self, *a, **k):
                return self

            def __getitem__(self, item):
                return self

        numba.njit = njit
        numba.jit = njit
        for tname in ("int64", "int32", "float64", "float32", "boolean"):
            setattr(numba, tname, _Sig())
        sys.modules["numba"] = numba
    # pptk: a viewer import at the top of the reference FT3D dataset
    # (flyingthings3d_subset.py:4), unused at runtime here
    sys.modules.setdefault("pptk", types.ModuleType("pptk"))
    for alias, typ in (("float", float), ("bool", bool), ("long", int),
                       ("int", int)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)


def main(out_dir: str, n_scenes: int = 10):
    import os
    os.makedirs(out_dir, exist_ok=True)
    install_stubs()
    install_eval_stubs()
    sys.path.insert(0, "/root/reference")
    import importlib

    tt = importlib.import_module("transforms.transforms")
    dk = importlib.import_module("datasets.kitti")
    ev = importlib.import_module("evaluation_utils")
    geom = importlib.import_module("utils.geometry")
    m = importlib.import_module("models_bid_lighttoken_res")

    torch.manual_seed(0)
    model = m.PointConvBidirection().eval()

    transform = tt.ProcessData({"DEPTH_THRESHOLD": 35.0, "NO_CORR": True},
                               num_points=8192, allow_less_points=False)
    ds = dk.KITTI(train=False, transform=transform, num_points=8192,
                  data_root="/root/reference/datasets")

    out = {"n_scenes": n_scenes}
    metrics = []
    for i in range(n_scenes):
        raw1, raw2 = ds.pc_loader(ds.samples[i])
        np.random.seed(1000 + i)     # the reference samples via global RNG
        pc1, pc2, sf = transform([raw1, raw2])
        path = ds.samples[i]

        with torch.no_grad():
            pred_flows = model(torch.from_numpy(pc1[None]),
                               torch.from_numpy(pc2[None]),
                               torch.from_numpy(pc1[None]),
                               torch.from_numpy(pc2[None]))[0]
        pred = pred_flows[0].squeeze(0).numpy().transpose(1, 0)  # (N, 3)

        epe3d, acc3ds, acc3dr, outl = ev.evaluate_3d(pred, sf)
        f2d_pred, f2d_gt = geom.get_batch_2d_flow(pc1[None], (pc1 + sf)[None],
                                                  (pc1 + pred)[None], [path])
        epe2d, acc2d = ev.evaluate_2d(f2d_pred, f2d_gt)
        metrics.append([epe3d, acc3ds, acc3dr, outl, epe2d, acc2d])
        print(f"scene {i} ({osp.split(path)[-1]}): epe3d={epe3d:.6f} "
              f"epe2d={epe2d:.4f}", flush=True)

        out[f"pc1_{i}"] = pc1
        out[f"pc2_{i}"] = pc2
        out[f"sf_{i}"] = sf
        out[f"raw1_head_{i}"] = raw1[:256]
        out[f"raw2_head_{i}"] = raw2[:256]
        out[f"raw_n_{i}"] = np.asarray(raw1.shape[0])
        out[f"path_{i}"] = np.asarray(path)

    out["metrics"] = np.asarray(metrics, np.float64)
    torch.save({"state_dict": model.state_dict()},
               osp.join(out_dir, "ref_eval_random.pth"))
    np.savez(osp.join(out_dir, "eval_golden.npz"), **out)
    print("eval-parity fixture written to", out_dir)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
