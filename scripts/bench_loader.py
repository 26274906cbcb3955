"""Input-pipeline throughput bench: can the loader feed the train step?

VERDICT round-1 #5: prove the multiprocess DataLoader sustains the device
step rate. Usage:

    python scripts/bench_loader.py [workers] [batch_size] [n_batches]

Runs on CPU (never touches the TPU): loads bundled KITTI scenes through the
full train-time path (native npy read → ground removal → Augmentation's
8192-point sampling + geometric aug) and reports batches/s and the headroom
vs the measured 120.6 ms bs=3 train step (v5e, round 2).
"""

import sys
import time

sys.path.insert(0, ".")


def main(workers: int = 4, batch_size: int = 3, n_batches: int = 40):
    from kd_pointcloud_tpu.data import Augmentation, DataLoader, KITTI

    aug = Augmentation(
        dict(degree_range=0.1745329252, shift_range=1.0, scale_low=0.95,
             scale_high=1.05, jitter_sigma=0.01, jitter_clip=0.0),
        dict(degree_range=0.0, shift_range=0.3, jitter_sigma=0.01,
             jitter_clip=0.0),
        depth_threshold=35.0, no_corr=True, num_points=8192,
        allow_less_points=False)
    ds = KITTI(train=True, transform=aug)
    dl = DataLoader(ds, batch_size, shuffle=True, drop_last=True,
                    num_workers=workers)
    try:
        it = iter(dl)
        next(it)                       # warm the pool
        t0 = time.time()
        n = 0
        for batch in it:
            n += 1
            if n >= n_batches:
                break
        dt = (time.time() - t0) / max(n, 1)
        step_ms = 120.6                # teacher train step bs=3, v5e r2
        print(f"workers={workers} bs={batch_size}: {1/dt:.2f} batches/s "
              f"({dt*1000:.1f} ms/batch) — device step {step_ms} ms → "
              f"headroom {step_ms/1000/dt:.2f}x")
    finally:
        dl.close()


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:4]]
    main(*a)
