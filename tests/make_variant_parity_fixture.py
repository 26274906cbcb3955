"""Generate torch-parity fixtures for the NON-teacher presets: the FG
student (models_bid_FG.py) and the vote model (modes_bid_vote.py) — the two
variants with the most bespoke math (union feature/euclid kNN; soft-argmax
vote flow). Same mechanism as make_parity_fixture.py: the REAL reference
models on CPU with the CUDA extension stubbed, one eval forward, saved
state_dict + multi-scale flows.

Usage: python tests/make_variant_parity_fixture.py <out_dir>
"""

import os
import os.path as osp
import sys

import numpy as np
import torch

from make_parity_fixture import install_stubs  # noqa: E402 (same dir)


def generate(module_name: str, tag: str, out_dir: str, n_points: int = 4096):
    import importlib

    m = importlib.import_module(module_name)
    torch.manual_seed(0)
    model = m.PointConvBidirection().eval()

    rng = np.random.RandomState(42)
    x = torch.from_numpy(rng.randn(1, n_points, 3).astype(np.float32))
    with torch.no_grad():
        out = model(x, x, x, x)
    flows = out[0]
    torch.save({"state_dict": model.state_dict()},
               osp.join(out_dir, f"ref_{tag}.pth"))
    np.savez(osp.join(out_dir, f"golden_{tag}.npz"), x=x.numpy(),
             **{f"flow{i}": flows[i].numpy() for i in range(4)})
    print(f"{tag} fixture written")


def main(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    install_stubs()
    sys.path.insert(0, "/root/reference")
    generate("models_bid_FG", "fg", out_dir)
    generate("modes_bid_vote", "vote", out_dir)


if __name__ == "__main__":
    main(sys.argv[1])
