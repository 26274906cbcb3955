#!/usr/bin/env python
"""Run the overfit convergence trajectory in THIS framework and export the
semi-trained parameter tree.

Counterpart of tests/make_train_parity_fixture.py's `overfit` mode (the
reference torch trainer, train_bid_pointconv.py:117-155 semantics): loads the
SAME init and the SAME fixed bundled-KITTI batches, runs the same 400-step
Adam horizon here, and writes:

  overfit_jax.npz            per-step loss + train-mode l0 EPE3D
  overfit_jax_final.msgpack  flax-serialized {params, batch_stats} — the
                             semi-trained checkpoint used to re-license the
                             approx/serving metric bands and to seed the
                             KD-effectiveness experiments on trained-regime
                             flow magnitudes

and prints the divergence-vs-envelope summary against the torch main run and
its 1-ulp-perturbed control (overfit{_selfdiv}.npz), when present.

Usage: python scripts/overfit_convergence.py [fixture_dir] [preset]
(defaults to /tmp/kdpc_train_parity and the teacher preset; runs on whatever
backend jax picks — the real chip under the default env, CPU under
tests/conftest.)

With preset != teacher (fg / bifeat / ...), there is no torch-side fixture to
compare against: the model initializes from model.init(seed 0), trains the
same 400-step horizon, and exports overfit_jax_<preset>.msgpack — trained-
regime weights for that family's approx-vs-exact metric licensing
(scripts/selftest_tpu.py --metrics --fg).
"""

from __future__ import annotations

import dataclasses
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np

FIXTURE_DIR = "/tmp/kdpc_train_parity"


def main(fixture_dir: str = FIXTURE_DIR, preset: str = "teacher"):
    import flax
    import jax

    from kd_pointcloud_tpu.models import PRESETS, BidPointFlowNet
    from kd_pointcloud_tpu.models.torch_import import load_torch_checkpoint
    from kd_pointcloud_tpu.train.overfit import (load_overfit_batches,
                                                 run_trajectory)

    z = np.load(osp.join(fixture_dir, "overfit.npz"))
    n_steps = int(z["n_steps"])
    batches = load_overfit_batches(osp.join(fixture_dir, "overfit.npz"))
    cfg = dataclasses.replace(PRESETS[preset], knn_method="exact",
                              knn_precision="highest")
    model = BidPointFlowNet(cfg)
    if preset == "teacher":
        params, stats = load_torch_checkpoint(
            osp.join(fixture_dir, "overfit_init.pth"))
    else:
        b = batches[0]
        v = jax.jit(lambda k: model.init(
            k, b["pos1"], b["pos2"], b["norm1"], b["norm2"],
            train=False))(jax.random.PRNGKey(0))
        params, stats = v["params"], v["batch_stats"]
    print(f"backend={jax.default_backend()} preset={preset} "
          f"n_steps={n_steps} batches={len(batches)}", flush=True)

    losses, epes, state = run_trajectory(model, params, stats, batches,
                                         n_steps)
    suffix = "" if preset == "teacher" else f"_{preset}"
    np.savez(osp.join(fixture_dir, f"overfit_jax{suffix}.npz"),
             losses=losses, epes=epes, n_steps=n_steps)
    blob = flax.serialization.to_bytes(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    out_name = ("overfit_jax_final.msgpack" if preset == "teacher"
                else f"overfit_jax_{preset}.msgpack")
    with open(osp.join(fixture_dir, out_name), "wb") as fd:
        fd.write(blob)
    print(f"ours: loss {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"(x{losses[0] / losses[-1]:.1f}), epe {epes[0]:.4f} -> "
          f"{epes[-1]:.4f}", flush=True)
    if preset != "teacher":
        return

    tl, te = z["losses"], z["epes"]
    print(f"torch: loss {tl[0]:.4f} -> {tl[-1]:.4f} (x{tl[0] / tl[-1]:.1f}), "
          f"epe {te[0]:.4f} -> {te[-1]:.4f}")
    rel = np.abs(losses - tl) / np.abs(tl)
    print(f"ours-vs-torch loss rel: step1 {rel[0]:.2e} max {rel.max():.2e} "
          f"final {rel[-1]:.2e}; final epe delta {epes[-1] - te[-1]:+.4f}")
    ctrl_path = osp.join(fixture_dir, "overfit_selfdiv.npz")
    if osp.exists(ctrl_path):
        zc = np.load(ctrl_path)
        crel = np.abs(zc["losses"] - tl) / np.abs(tl)
        print(f"torch-vs-itself (1 ulp) loss rel: max {crel.max():.2e} "
              f"final {crel[-1]:.2e}; final epe delta "
              f"{zc['epes'][-1] - te[-1]:+.4f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else FIXTURE_DIR,
         sys.argv[2] if len(sys.argv) > 2 else "teacher")
