"""Training-dynamics parity fixture: reference torch training steps on CPU.

Runs N steps of the ACTUAL reference training semantics
(train_bid_pointconv.py:117-155: models_bid_lighttoken_res forward →
multiScaleLoss → loss.backward → torch.optim.Adam(lr=1e-3, betas=(0.9,
0.999), eps=1e-8, weight_decay=1e-4).step) on deterministic batches built
from the bundled KITTI scenes, with the CUDA extension stubbed
(make_parity_fixture.install_stubs).

Saves, for the parity test (tests/test_train_parity.py):
  * init.pth           state_dict before any step
  * grads.pth          state_dict-shaped tree of step-1 gradients
  * after1.pth         state_dict after step 1
  * afterN.pth         state_dict after the final step
  * train.npz          batches (pos/flow), per-step losses, N
"""

import os.path as osp
import sys

import numpy as np
import torch

from make_parity_fixture import install_stubs

KITTI_DIR = "/root/reference/datasets/kitti_processed"
N_POINTS = 4096
BATCH_SIZE = 2
N_STEPS = 20
N_BATCHES = 4

# Overfit/convergence mode (VERDICT r3 #1): a multi-hundred-step run on a
# fixed scene set, deep enough that the loss visibly descends (>=5x from
# init), plus the same run with a 1-ulp-perturbed init (torch's own chaotic
# self-divergence — the envelope any f32 reimplementation is judged against).
OVERFIT_STEPS = 400
OVERFIT_BATCHES = 8


def build_batches(n_batches=N_BATCHES):
    """Deterministic eval-style prep (transforms.py:137-203 semantics:
    depth<35 mask, fixed-seed point sample, sf = pc2 - pc1) shared verbatim
    by both frameworks through the saved npz."""
    rng = np.random.RandomState(7)
    batches = []
    scene = 0
    for _ in range(n_batches):
        pos1s, pos2s, flows = [], [], []
        for _ in range(BATCH_SIZE):
            d = osp.join(KITTI_DIR, f"{scene:06d}")
            scene += 1
            pc1 = np.load(osp.join(d, "pc1.npy")).astype(np.float32)
            pc2 = np.load(osp.join(d, "pc2.npy")).astype(np.float32)
            near = np.logical_and(pc1[:, 2] < 35.0, pc2[:, 2] < 35.0)
            pc1, pc2 = pc1[near], pc2[near]
            idx = rng.choice(pc1.shape[0], N_POINTS, replace=False)
            pos1s.append(pc1[idx])
            pos2s.append(pc2[idx])
            flows.append(pc2[idx] - pc1[idx])
        batches.append((np.stack(pos1s), np.stack(pos2s), np.stack(flows)))
    return batches


def main(out_dir: str):
    install_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import importlib

    m = importlib.import_module("models_bid_lighttoken_res")
    torch.manual_seed(0)
    model = m.PointConvBidirection()
    torch.save({"state_dict": model.state_dict()},
               osp.join(out_dir, "init.pth"))

    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3,
                                 betas=(0.9, 0.999), eps=1e-8,
                                 weight_decay=1e-4)
    batches = build_batches()
    losses = []
    model.train()
    for step in range(N_STEPS):
        pos1, pos2, flow = (torch.from_numpy(a)
                            for a in batches[step % N_BATCHES])
        optimizer.zero_grad()
        out = model(pos1, pos2, pos1, pos2)
        pred_flows, fps_pc1_idxs = out[0], out[1]
        loss = m.multiScaleLoss(pred_flows, flow, fps_pc1_idxs)
        loss.backward()
        if step == 0:
            g = {k: v.detach().clone() for k, v in model.state_dict().items()}
            for name, p in model.named_parameters():
                g[name] = (p.grad.detach().clone() if p.grad is not None
                           else torch.zeros_like(p))
            torch.save({"state_dict": g}, osp.join(out_dir, "grads.pth"))
        optimizer.step()
        if step == 0:
            torch.save({"state_dict": model.state_dict()},
                       osp.join(out_dir, "after1.pth"))
        losses.append(float(loss))
        print(f"step {step}: loss {float(loss):.6f}", flush=True)

    torch.save({"state_dict": model.state_dict()},
               osp.join(out_dir, "afterN.pth"))
    np.savez(osp.join(out_dir, "train.npz"),
             losses=np.asarray(losses, np.float64),
             n_steps=N_STEPS,
             **{f"b{i}_{name}": arr
                for i, b in enumerate(batches)
                for name, arr in zip(("pos1", "pos2", "flow"), b)})
    print("fixture written to", out_dir)


def extras(out_dir: str):
    """Two calibration artifacts:

    * grads64.pth — step-1 gradients computed in FLOAT64 (model.double()),
      the ground truth that separates math divergence from f32 rounding.
    * selfdiv.npz — the same f32 trajectory re-run with the init perturbed
      by one part in 1e7 (≈1 ulp): torch's own divergence from itself under
      last-bit noise, the Lyapunov noise floor any f32 reimplementation
      should be judged against.
    """
    install_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import importlib

    m = importlib.import_module("models_bid_lighttoken_res")
    batches = build_batches()
    sd = torch.load(osp.join(out_dir, "init.pth"),
                    weights_only=False)["state_dict"]

    # ---- float64 step-1 gradients
    model = m.PointConvBidirection()
    model.load_state_dict(sd)
    model.double().train()
    pos1, pos2, flow = (torch.from_numpy(a).double() for a in batches[0])
    out = model(pos1, pos2, pos1, pos2)
    loss = m.multiScaleLoss(out[0], flow, out[1])
    loss.backward()
    g = {k: v.detach().clone() for k, v in model.state_dict().items()}
    for name, p in model.named_parameters():
        g[name] = (p.grad.detach().clone() if p.grad is not None
                   else torch.zeros_like(p))
    torch.save({"state_dict": g}, osp.join(out_dir, "grads64.pth"))
    print(f"f64 loss {float(loss):.9f}", flush=True)

    # ---- perturbed f32 self-divergence trajectory
    model = m.PointConvBidirection()
    sd_p = {k: (v + v.abs() * 1e-7 if v.is_floating_point() else v)
            for k, v in sd.items()}
    model.load_state_dict(sd_p)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3,
                                 betas=(0.9, 0.999), eps=1e-8,
                                 weight_decay=1e-4)
    losses = []
    for step in range(N_STEPS):
        pos1, pos2, flow = (torch.from_numpy(a)
                            for a in batches[step % N_BATCHES])
        optimizer.zero_grad()
        out = model(pos1, pos2, pos1, pos2)
        loss = m.multiScaleLoss(out[0], flow, out[1])
        loss.backward()
        optimizer.step()
        losses.append(float(loss))
        print(f"perturbed step {step}: loss {float(loss):.6f}", flush=True)
    np.savez(osp.join(out_dir, "selfdiv.npz"),
             losses=np.asarray(losses, np.float64))
    print("extras written to", out_dir)


def _run_trajectory(m, sd, batches, n_steps, tag):
    """Reference trainer loop (train_bid_pointconv.py:117-155 semantics,
    no scheduler: StepLR steps per-epoch=100, never within this horizon).
    Returns per-step (loss, epe3d-at-l0) arrays and the final state_dict."""
    model = m.PointConvBidirection()
    model.load_state_dict(sd)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3,
                                 betas=(0.9, 0.999), eps=1e-8,
                                 weight_decay=1e-4)
    losses, epes = [], []
    for step in range(n_steps):
        pos1, pos2, flow = (torch.from_numpy(a)
                            for a in batches[step % len(batches)])
        optimizer.zero_grad()
        out = model(pos1, pos2, pos1, pos2)
        loss = m.multiScaleLoss(out[0], flow, out[1])
        loss.backward()
        optimizer.step()
        losses.append(float(loss))
        with torch.no_grad():
            epe = float(torch.norm(out[0][0].permute(0, 2, 1) - flow,
                                   dim=2).mean())
        epes.append(epe)
        if step % 10 == 0 or step == n_steps - 1:
            print(f"{tag} step {step}: loss {float(loss):.6f} "
                  f"epe {epe:.4f}", flush=True)
    return (np.asarray(losses, np.float64), np.asarray(epes, np.float64),
            model.state_dict())


def overfit(out_dir: str):
    """Convergence fixture (VERDICT r3 #1): OVERFIT_STEPS steps over
    OVERFIT_BATCHES fixed bundled-KITTI batches — long enough that the loss
    descends >=5-10x from init — saved alongside a 1-ulp-perturbed control
    trajectory. tests/test_train_parity.py::TestConvergenceParity reruns the
    same horizon in our framework and asserts it tracks within the control's
    own divergence envelope all the way into the descended regime."""
    install_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import importlib

    m = importlib.import_module("models_bid_lighttoken_res")
    torch.manual_seed(0)
    sd = m.PointConvBidirection().state_dict()
    batches = build_batches(OVERFIT_BATCHES)

    losses, epes, final_sd = _run_trajectory(m, sd, batches, OVERFIT_STEPS,
                                             "overfit")
    torch.save({"state_dict": final_sd}, osp.join(out_dir,
                                                  "overfit_final.pth"))
    torch.save({"state_dict": sd}, osp.join(out_dir, "overfit_init.pth"))
    np.savez(osp.join(out_dir, "overfit.npz"),
             losses=losses, epes=epes, n_steps=OVERFIT_STEPS,
             **{f"b{i}_{name}": arr
                for i, b in enumerate(batches)
                for name, arr in zip(("pos1", "pos2", "flow"), b)})
    print(f"overfit main done: loss {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"(x{losses[0] / losses[-1]:.1f} descent)", flush=True)

    sd_p = {k: (v + v.abs() * 1e-7 if v.is_floating_point() else v)
            for k, v in sd.items()}
    losses_p, epes_p, _ = _run_trajectory(m, sd_p, batches, OVERFIT_STEPS,
                                          "control")
    np.savez(osp.join(out_dir, "overfit_selfdiv.npz"),
             losses=losses_p, epes=epes_p)
    print("overfit fixture written to", out_dir, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "extras":
        extras(sys.argv[1])
    elif len(sys.argv) > 2 and sys.argv[2] == "overfit":
        overfit(sys.argv[1])
    else:
        main(sys.argv[1])
