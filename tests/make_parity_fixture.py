"""Generate the torch-parity fixture: run the REAL reference model on CPU.

Imports /root/reference/models_bid_lighttoken_res.py with the CUDA pointnet2
extension (and thop/cv2) stubbed by pure-torch equivalents implementing the
documented kernel semantics (sampling_gpu.cu seed-0 running-min-argmax FPS,
gather, group), runs one eval forward on a fixed random input, and saves the
state_dict + the 4 multi-scale flows.

Usage: python tests/make_parity_fixture.py <out_dir>
"""

import os.path as osp
import sys
import types

import numpy as np
import torch


def install_stubs():
    for name, attrs in [("thop", {"profile": lambda *a, **k: (0, 0),
                                  "clever_format": lambda x, f: x}),
                        ("cv2", {"kmeans": None}),
                        ("torchvision", {})]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)

    pn2 = types.ModuleType("pointnet2")
    pn2_utils = types.ModuleType("pointnet2.pointnet2_utils")

    def furthest_point_sample(xyz, npoint):
        # sampling_gpu.cu:93-209 semantics: seed index 0, running-min argmax
        B, N, _ = xyz.shape
        idx = torch.zeros(B, npoint, dtype=torch.int32)
        temp = torch.full((B, N), 1e10)
        last = torch.zeros(B, dtype=torch.long)
        for j in range(1, npoint):
            d = ((xyz - xyz[torch.arange(B), last][:, None, :]) ** 2).sum(-1)
            temp = torch.minimum(temp, d)
            last = temp.argmax(-1)
            idx[:, j] = last.int()
        return idx

    def gather_operation(feats, idx):
        B, C, _ = feats.shape
        return torch.gather(feats, 2,
                            idx.long().unsqueeze(1).expand(B, C, idx.shape[1]))

    def grouping_operation(feats, idx):
        B, C, _ = feats.shape
        S, K = idx.shape[1], idx.shape[2]
        flat = idx.long().reshape(B, S * K)
        out = torch.gather(feats, 2,
                           flat.unsqueeze(1).expand(B, C, S * K))
        return out.reshape(B, C, S, K)

    pn2_utils.furthest_point_sample = furthest_point_sample
    pn2_utils.gather_operation = gather_operation
    pn2_utils.grouping_operation = grouping_operation
    pn2.pointnet2_utils = pn2_utils
    sys.modules["pointnet2"] = pn2
    sys.modules["pointnet2.pointnet2_utils"] = pn2_utils


def main(out_dir: str):
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import importlib

    m = importlib.import_module("models_bid_lighttoken_res")
    torch.manual_seed(0)
    model = m.PointConvBidirection().eval()

    rng = np.random.RandomState(42)
    x = torch.from_numpy(rng.randn(1, 4096, 3).astype(np.float32))
    with torch.no_grad():
        out = model(x, x, x, x)
    flows = out[0]
    torch.save({"state_dict": model.state_dict()},
               osp.join(out_dir, "ref_random.pth"))
    np.savez(osp.join(out_dir, "golden.npz"), x=x.numpy(),
             **{f"flow{i}": flows[i].numpy() for i in range(4)})
    print("fixture written to", out_dir)


if __name__ == "__main__":
    main(sys.argv[1])
